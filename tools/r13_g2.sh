#!/bin/bash
# g2 fallback tier after the sf100 disk finding: at sf100 (1.2B lineitem
# rows -> ~120M distinct co-purchase edges x replica structure) g2's wedge
# stream needs >63 GB of live single-node scratch (measured: 44 GB shuffle
# + 19 GB material spill when the 252 GB disk hit ENOSPC — r13_li_sf100_c
# .log) — on a 1000-executor cluster the same plan's spill is distributed,
# ~64 MB/node. The decisive growth step for g2 therefore runs sf10 -> sf30
# (3x) on this box, both tiers on the SAME tier-sized harness so the
# exponent is harness-consistent.
set -u
cd /root/repo
mkdir -p target/m
export SPARK_DRIVER_MEM=32g
export SPARK_GRAFT_SHUFFLE_PARTITIONS=256
run() {
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_BENCH_OUT=$2 \
    sbt -batch "runMain graft.Bench g2_triangles" > "$3" 2>&1
  echo "== done: $2 ($(date -u +%H:%M:%S))"
}
run target/scale/sf10 target/m/r13_g2_sf10_a.json target/m/r13_g2_sf10_a.log
run target/scale/sf30 target/m/r13_g2_sf30_a.json target/m/r13_g2_sf30_a.log
run target/scale/sf10 target/m/r13_g2_sf10_b.json target/m/r13_g2_sf10_b.log
run target/scale/sf30 target/m/r13_g2_sf30_b.json target/m/r13_g2_sf30_b.log
echo G2_DONE
