#!/bin/bash
# Round-14 measurement campaign (VERDICT r13 asks #1/#3/#5/#6):
#  - anchors pre/post calibrate the measurement window (r11 mechanism).
#  - TWO fresh full passes over ALL queries at sf0.1 (VERDICT #5: every
#    BENCH_r14_full number fresh at HEAD, anchor-bracketed — no r13 minima
#    carried forward).
#  - sf10 rows: the IVFADC family (s9 flat vs s9b two-level vs s9c dispatch
#    — VERDICT #1's assignment-side drop) and j02b under the 100x-oversized
#    dim (VERDICT #6), 2 spaced passes each.
#  - sf100 d2c row (VERDICT #3): documents x1000 (5M docs), tier-sized
#    harness (SPARK_GRAFT_SHUFFLE_PARTITIONS=256, SPARK_DRIVER_MEM=32g —
#    the r13 rule for sf100 documents queries), 2 spaced passes.
# Scale dirs from tools/scaleup.py (sf10: documents,embeddings,orders,
# customer at factor 100; sf100: documents at factor 1000).
set -u
cd /root/repo
mkdir -p target/m
S9="s9_knn_ivfpq,s9b_knn_ivfpq_2level,s9c_knn_ivfpq_auto"
J02B="j02b_normalized_enrich"
D2C="d2c_jaccard_auto"

run() { # run <sfdir> <out> <log> [queries]
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_BENCH_OUT=$2 \
    sbt -batch "runMain graft.Bench ${4:-}" > "$3" 2>&1
  echo "== done: $2 ($(date -u +%H:%M:%S))"
}

python3 tools/bench_min.py --anchor target/m/r14_anchor_pre.json
echo "== anchors pre done ($(date -u +%H:%M:%S))"
run /root/testdata/sf0.1 target/m/r14_full_sf01_a.json target/m/r14_full_sf01_a.log
run target/scale/sf10 target/m/r14_s9_sf10_a.json target/m/r14_s9_sf10_a.log "$S9"
run target/scale/sf10 target/m/r14_j02b_sf10_a.json target/m/r14_j02b_sf10_a.log "$J02B"
export SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE_PARTITIONS=256
run target/scale/sf100 target/m/r14_d2c_sf100_a.json target/m/r14_d2c_sf100_a.log "$D2C"
unset SPARK_DRIVER_MEM SPARK_GRAFT_SHUFFLE_PARTITIONS
run /root/testdata/sf0.1 target/m/r14_full_sf01_b.json target/m/r14_full_sf01_b.log
run target/scale/sf10 target/m/r14_s9_sf10_b.json target/m/r14_s9_sf10_b.log "$S9"
run target/scale/sf10 target/m/r14_j02b_sf10_b.json target/m/r14_j02b_sf10_b.log "$J02B"
export SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE_PARTITIONS=256
run target/scale/sf100 target/m/r14_d2c_sf100_b.json target/m/r14_d2c_sf100_b.log "$D2C"
unset SPARK_DRIVER_MEM SPARK_GRAFT_SHUFFLE_PARTITIONS
python3 tools/bench_min.py --anchor target/m/r14_anchor_post.json
echo CAMPAIGN_DONE
