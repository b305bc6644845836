#!/bin/bash
# Round-9 full-suite scale curve: alternating sf0.1 / sf1 bench passes so
# per-scale MINs come from runs spaced minutes apart (stall defense).
cd /root/repo
for p in a b c; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=target/r9_scale_sf01_$p.json \
    sbt -batch "runMain graft.Bench" > target/r9_bench_sf01_$p.log 2>&1
  SPARK_GRAFT_SF_DIR=target/scale/sf1 SPARK_GRAFT_BENCH_OUT=target/r9_scale_sf1_$p.json \
    sbt -batch "runMain graft.Bench" > target/r9_bench_sf1_$p.log 2>&1
done
echo DONE
