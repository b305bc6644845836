#!/bin/bash
# Round-14 post-campaign: a third full sf0.1 pass (tightens the fresh
# minima), a closing anchor, and the d2c deciding-stat decomposition at
# sf100 (Profile dispatch; sf100 carries an sf10 embeddings copy ONLY so
# the loop's d9c/s3d marks don't abort — those marks are not sf100 data).
set -u
cd /root/repo
mkdir -p target/m
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/m/r14_full_sf01_c.json \
  sbt -batch "runMain graft.Bench" > target/m/r14_full_sf01_c.log 2>&1
echo "== full c done ($(date -u +%H:%M:%S))"
python3 tools/bench_min.py --anchor target/m/r14_anchor_post2.json
export SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE_PARTITIONS=256
SPARK_GRAFT_SF_DIR=target/scale/sf100 sbt -batch "runMain graft.Profile dispatch" \
  > target/m/r14_dispatch_sf100.log 2>&1
unset SPARK_DRIVER_MEM SPARK_GRAFT_SHUFFLE_PARTITIONS
grep "dispatch" target/m/r14_dispatch_sf100.log | grep -v WARN | head -8
echo POST_DONE
