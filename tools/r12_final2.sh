#!/bin/bash
cd /root/repo
python3 tools/bench_min.py --anchor target/m/r12_anchor_pre3.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/m/r12_sf01_d.json \
  sbt -batch "runMain graft.Bench" > target/m/r12_sf01_d.log 2>&1
echo "== full pass D done ($(date -u +%H:%M:%S))"
python3 tools/bench_min.py --anchor target/m/r12_anchor_post3.json
echo FINAL2_DONE
