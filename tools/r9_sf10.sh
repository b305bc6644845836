#!/bin/bash
cd /root/repo
Q="d1_exact_dedup,d3_minhash_lsh,d4b_simhash_tight,d8_dup_ngram_coverage,d9_semdedup,d7b_dup_clusters_star,d10_incremental_neardup,s1_knn_exact,s2_knn_lsh,s3b_knn_ivf_anchor,s6_knn_reduced,s7_knn_graph,g2_triangles,g1_pagerank,g3_bfs_hops,t6_decontaminate,t9_tfidf_top,t5b_sample_hash,q1_agg,q9_profit_by_nation,q21_waiting_suppliers,q18_big_orders"
for p in a b; do
  SPARK_GRAFT_SF_DIR=target/scale/sf10 SPARK_GRAFT_BENCH_OUT=target/r9_scale_sf10_$p.json \
    sbt -batch "runMain graft.Bench $Q" > target/r9_bench_sf10_$p.log 2>&1
done
echo DONE
