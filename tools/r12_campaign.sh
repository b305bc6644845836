#!/bin/bash
# Round-12 measurement campaign (VERDICT r11 asks #3/#4/#5):
#  - full-suite sf0.1 bench at HEAD (179 queries, 2 spaced passes) for
#    BENCH_r12_full + RATIOS regeneration
#  - sf10 dispatcher proofs (d2c/d9c/s3d + their explicit twins, 2 passes)
#    with the deciding-statistic cost measured standalone (Profile dispatch)
#  - sf30 extension of the linear-claim tier (er1, d7b, t6, t7b, a19 at
#    sf10 AND sf30, 2 spaced passes each)
# Anchors before and after calibrate the measurement window (r11 mechanism).
cd /root/repo
mkdir -p target/m
LIN="er1_entity_clusters,d7b_dup_clusters_star,t6_decontaminate,t7b_pack_sharded,a19_active_users"
DISPATCH="d2c_jaccard_auto,d2_ngram_jaccard,d2b_jaccard_prefix,d9c_semdedup_auto,d9b_semdedup_2level,s3d_knn_auto,s3b_knn_ivf_anchor,s3c_knn_ivf_2level"

run() { # run <sfdir> <out> <log> [queries]
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_BENCH_OUT=$2 \
    sbt -batch "runMain graft.Bench ${4:-}" > "$3" 2>&1
  echo "== done: $2 ($(date -u +%H:%M:%S))"
}

python3 tools/bench_min.py --anchor target/m/r12_anchor_pre.json
echo "== anchors pre done ($(date -u +%H:%M:%S))"
run /root/testdata/sf0.1 target/m/r12_sf01_a.json target/m/r12_sf01_a.log
SPARK_GRAFT_SF_DIR=target/scale/sf10 sbt -batch "runMain graft.Profile dispatch" \
  > target/m/r12_dispatch_sf10.log 2>&1
echo "== dispatch stats done ($(date -u +%H:%M:%S))"
run target/scale/sf10 target/m/r12_disp_sf10_a.json target/m/r12_disp_sf10_a.log "$DISPATCH"
run target/scale/sf10 target/m/r12_lin_sf10_a.json target/m/r12_lin_sf10_a.log "$LIN"
run target/scale/sf30 target/m/r12_lin_sf30_a.json target/m/r12_lin_sf30_a.log "$LIN"
run /root/testdata/sf0.1 target/m/r12_sf01_b.json target/m/r12_sf01_b.log
run target/scale/sf10 target/m/r12_disp_sf10_b.json target/m/r12_disp_sf10_b.log "$DISPATCH"
run target/scale/sf10 target/m/r12_lin_sf10_b.json target/m/r12_lin_sf10_b.log "$LIN"
run target/scale/sf30 target/m/r12_lin_sf30_b.json target/m/r12_lin_sf30_b.log "$LIN"
python3 tools/bench_min.py --anchor target/m/r12_anchor_post.json
echo CAMPAIGN_DONE
