#!/bin/bash
# Round-13 measurement campaign (VERDICT r12 asks #4/#5 + new-query rows):
#  - sf0.1 rows for queries NEW or CHANGED since BENCH_r12_full:
#      new:     s8_knn_pq, s9_knn_ivfpq, mm5_pixel_stats,
#               j02b_normalized_enrich, stream_capped_sessions
#      changed: d11b/d11c (PPJoin positional filter), t20 (scheme-aware
#               port strip)
#    2 spaced passes; BENCH_r13_full = r12_full minus changed ∪ these.
#  - PPJoin re-measurement at sf10 (VERDICT #4): d11 family, 2 passes.
#  - sf100 spot tier (VERDICT #5): d9b (embeddings ×1000), d11 naive +
#    d11c router (documents ×1000), g2 (lineitem ×1000) — the flagship
#    scale paths, per-query MIN over passes; tables pruned after.
# Anchors before/after calibrate the measurement window (r11 mechanism).
set -u
cd /root/repo
mkdir -p target/m
NEWQ="s8_knn_pq,s9_knn_ivfpq,mm5_pixel_stats,j02b_normalized_enrich,stream_capped_sessions,d11b_containment_prefix,d11c_containment_auto,t20_url_canonical"
D11="d11_containment,d11b_containment_prefix,d11c_containment_auto"
S9="s8_knn_pq,s9_knn_ivfpq"
SF100_EMB="d9b_semdedup_2level"
SF100_DOC="d11_containment,d11c_containment_auto"
SF100_LI="g2_triangles"

run() { # run <sfdir> <out> <log> [queries]
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_BENCH_OUT=$2 \
    sbt -batch "runMain graft.Bench ${4:-}" > "$3" 2>&1
  echo "== done: $2 ($(date -u +%H:%M:%S))"
}

python3 tools/bench_min.py --anchor target/m/r13_anchor_pre.json
echo "== anchors pre done ($(date -u +%H:%M:%S))"
run /root/testdata/sf0.1 target/m/r13_new_sf01_a.json target/m/r13_new_sf01_a.log "$NEWQ"
run target/scale/sf10 target/m/r13_d11_sf10_a.json target/m/r13_d11_sf10_a.log "$D11"
run target/scale/sf10 target/m/r13_s9_sf10_a.json target/m/r13_s9_sf10_a.log "$S9"
run target/scale/sf100 target/m/r13_emb_sf100_a.json target/m/r13_emb_sf100_a.log "$SF100_EMB"
run target/scale/sf100 target/m/r13_doc_sf100_a.json target/m/r13_doc_sf100_a.log "$SF100_DOC"
run target/scale/sf100 target/m/r13_li_sf100_a.json target/m/r13_li_sf100_a.log "$SF100_LI"
run /root/testdata/sf0.1 target/m/r13_new_sf01_b.json target/m/r13_new_sf01_b.log "$NEWQ"
run target/scale/sf10 target/m/r13_d11_sf10_b.json target/m/r13_d11_sf10_b.log "$D11"
run target/scale/sf10 target/m/r13_s9_sf10_b.json target/m/r13_s9_sf10_b.log "$S9"
run target/scale/sf100 target/m/r13_emb_sf100_b.json target/m/r13_emb_sf100_b.log "$SF100_EMB"
run target/scale/sf100 target/m/r13_doc_sf100_b.json target/m/r13_doc_sf100_b.log "$SF100_DOC"
run target/scale/sf100 target/m/r13_li_sf100_b.json target/m/r13_li_sf100_b.log "$SF100_LI"
python3 tools/bench_min.py --anchor target/m/r13_anchor_post.json
echo CAMPAIGN_DONE
