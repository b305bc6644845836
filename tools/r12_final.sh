#!/bin/bash
# Round-12 final refresh: one anchored full pass covering the late adds
# (t20, d11, mm4) so BENCH_full matches SparkEntry.queries at HEAD —
# the artifact-lag complaint from rounds 9/11, preempted.
cd /root/repo
python3 tools/bench_min.py --anchor target/m/r12_anchor_pre2.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/m/r12_sf01_c.json \
  sbt -batch "runMain graft.Bench" > target/m/r12_sf01_c.log 2>&1
echo "== full pass C done ($(date -u +%H:%M:%S))"
python3 tools/bench_min.py --anchor target/m/r12_anchor_post2.json
echo FINAL_DONE
