#!/bin/bash
# Round-10 measurement campaign (VERDICT r9 asks #1/#2):
#  - sf10 scale points for the expensive tier (37 queries, 2 spaced passes)
#  - full-suite sf0.1 / sf1 curve at HEAD (3 alternating passes each)
# Interleaved so per-scale MINs come from runs spaced apart (stall defense),
# with the decisive sf10 pass FIRST (g2 died at sf10 pre-rework in r9).
cd /root/repo
Q="g1_pagerank,g1b_ppr,g2_triangles,g3_bfs_hops,d1_exact_dedup,d2_ngram_jaccard,d2b_jaccard_prefix,d3_minhash_lsh,d4_simhash,d4b_simhash_tight,d5_embedding_neardup,d7_dup_clusters,d7b_dup_clusters_star,d8_dup_ngram_coverage,d9_semdedup,d10_incremental_neardup,s1_knn_exact,s2_knn_lsh,s2b_knn_multiprobe,s3_knn_ivf,s3b_knn_ivf_anchor,s3c_knn_ivf_2level,s4_knn_quantized,s5_centroids,s6_knn_reduced,s7_knn_graph,j02_twophase_enrich,er1_entity_clusters,a23_rfm,a25_abc_pareto,t6_decontaminate,t9_tfidf_top,t5b_sample_hash,q1_agg,q9_profit_by_nation,q18_big_orders,q21_waiting_suppliers"

run() { # run <sfdir> <out> <log> [queries]
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_BENCH_OUT=$2 \
    sbt -batch "runMain graft.Bench ${4:-}" > "$3" 2>&1
  echo "== done: $2 ($(date -u +%H:%M:%S))"
}

run target/scale/sf10 target/r10_sf10_a.json target/r10_bench_sf10_a.log "$Q"
run /root/testdata/sf0.1 target/r10_sf01_a.json target/r10_bench_sf01_a.log
run target/scale/sf1 target/r10_sf1_a.json target/r10_bench_sf1_a.log
run target/scale/sf10 target/r10_sf10_b.json target/r10_bench_sf10_b.log "$Q"
run /root/testdata/sf0.1 target/r10_sf01_b.json target/r10_bench_sf01_b.log
run target/scale/sf1 target/r10_sf1_b.json target/r10_bench_sf1_b.log
run /root/testdata/sf0.1 target/r10_sf01_c.json target/r10_bench_sf01_c.log
run target/scale/sf1 target/r10_sf1_c.json target/r10_bench_sf1_c.log
echo CAMPAIGN_DONE
