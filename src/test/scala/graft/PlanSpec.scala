package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.operators.SetOpsWindows

/** Physical-plan shape assertions: the properties that make these queries
  * survive a 100 TB scale-up, pinned as tests so a refactor can't silently
  * regress them. Uses sf0.001 (plan shape is scale-independent; AQE may
  * refine joins at runtime but the static plan shows the intent). */
class PlanSpec extends SparkSpec {

  def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  def planOf(name: String): String = plan(SparkEntry.queries(name)(spark, sf0001))

  test("filters push down to the parquet scan and prune columns") {
    val p = planOf("f01_contains_filter")
    assert(p.contains("PushedFilters: [IsNotNull(text), StringContains(text,table)]"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string,n_chars:bigint>"), p)
  }

  test("q1 aggregates partially before the shuffle (map-side combine)") {
    val p = planOf("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
  }

  test("dimension joins broadcast (J1) — no fact-side shuffle") {
    val p = planOf("j01_exact_enrich")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("two-phase enrichment never cartesian-joins the long-key path") {
    // Round 14: the enrichment carries NO static broadcast hints (an
    // oversized dim must not be force-broadcast — the sf10 q-gram index is
    // 22.5M rows), so the broadcast decision is AQE's from runtime sizes.
    // Execute, then pin the FINAL adaptive plan: at contract scale the dim
    // joins must still come out broadcast.
    val df = SparkEntry.queries("j02_twophase_enrich")(spark, sf0001)
    df.collect()
    // an executed AdaptiveSparkPlanExec prints final + initial plans —
    // assert on the FINAL section only
    val p = plan(df).split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the bounded short-key (< Q chars) fallback
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = planOf("o1_topk_sort")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("sessionization shuffles once: window partitioning feeds the groupBy") {
    val p = planOf("a01_sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1,
      s"expected the groupBy to reuse the window's user_id partitioning:\n$p")
  }

  test("group-scalar attach uses a window, not a join back (J3)") {
    val p = planOf("j03_group_scalar_attach")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("band join is an equi sort-merge on the user key, not a cross product") {
    val p = planOf("j04_band_join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("knn exact broadcasts the query side") {
    val p = planOf("s1_knn_exact")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // q-side broadcast, corpus streams
    assert(!p.contains("CartesianProduct"), p)
  }

  test("money aggregates use exact decimal sums (no double accumulation)") {
    val df = SparkEntry.queries("q1_agg")(spark, sf0001)
    val aggExprs = df.queryExecution.optimizedPlan.toString
    assert(aggExprs.contains("sum(cast("), aggExprs)
    assert(aggExprs.toLowerCase.contains("decimal"), aggExprs)
  }

  test("batch session windows shuffle once on the user key (MergingSessions)") {
    val p = planOf("stream_session")
    assert(p.contains("MergingSessions"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("exact-cosine audit broadcasts the sampled query side, never the corpus") {
    val p = planOf("d5b_cosine_exact")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("stratified sample and sequence packing share one stratum shuffle") {
    for (n <- Seq("t5_sample_stratified", "t7_pack_sequences")) {
      val p = planOf(n)
      assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, s"$n:\n$p")
    }
  }

  test("decontamination broadcasts the benchmark shingles (inverted probe)") {
    val p = planOf("t6_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q5 deep multi-join: dims broadcast, no cartesian anywhere") {
    val p = planOf("q5_local_supplier")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("multiprobe LSH stays equi-join + windowed top-k pushdown") {
    val p = planOf("s2b_knn_multiprobe")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  /** Build plans with stats-based auto-broadcast disabled: any
    * BroadcastExchange that remains can only come from an explicit
    * `broadcast()` hint — exactly the thing that OOMs the driver when the
    * hinted frame scales with the corpus. (At test scale the tiny parquet
    * stats would otherwise broadcast everything and hide a stray hint.) */
  def planNoAutoBroadcast(name: String): String = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    // Plan against a clean cache: if another suite (QueriesSmokeSpec) left a
    // Caches.scoped frame cached, the printed InMemoryRelation fragments
    // carry their own inner BroadcastExchange nodes and inflate the counts
    // these tests assert on (observed order-dependent: 16 vs 4 in d9).
    spark.catalog.clearCache()
    try planOf(name) finally spark.conf.set(key, prev)
  }

  test("similarity tier never hints a corpus-scaled broadcast (100 TB safety)") {
    // Every allowed hint is BOUNDED BY CONSTRUCTION: the ≤queryN-row
    // stratum (orderBy.limit — a TakeOrdered subplan) or the nlist-row
    // anchor table. Corpus-sized frames (codes, embeddings, norms, rerank
    // lookups) must all shuffle, so each query's BroadcastExchange count is
    // pinned exactly.
    // ANN candidate paths: ONE hint — the stratum semi-join (a
    // BroadcastHashJoin over the limit-bounded id list); candidate gen,
    // scoring, and verify all shuffle
    for (n <- Seq("s2_knn_lsh", "s2b_knn_multiprobe")) {
      val p = planNoAutoBroadcast(n)
      assert("BroadcastExchange".r.findAllIn(p).size === 1,
        s"$n: expected exactly the bounded query-stratum semi-join:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$n:\n$p")
    }
    // s3 (literal-centroid since round 9): the nlist-row fitted-centroid
    // table feeds one cross join per scored() consumer (assignment +
    // probes) plus the one stratum semi-join — identical contract to s3b
    locally {
      val p = planNoAutoBroadcast("s3_knn_ivf")
      val bx = "BroadcastExchange".r.findAllIn(p).size
      val cross = "BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(p).size
      val strat = "BroadcastHashJoin".r.findAllIn(p).size
      assert(cross >= 1 && strat === 1 && bx === cross + strat,
        s"s3_knn_ivf: broadcast beyond centroids + stratum " +
          s"($bx vs $cross cross + $strat stratum):\n$p")
    }
    // the all-corpus tiers (near-dup pairs, the s7 kNN graph) have NO query
    // stratum: zero hints anywhere — every frame scales with the corpus
    for (n <- Seq("d5_embedding_neardup", "s7_knn_graph")) {
      val p = planNoAutoBroadcast(n)
      assert(!p.contains("BroadcastExchange"),
        s"$n: corpus-scaled broadcast hint crept back in:\n$p")
    }
    // exact/scan baselines: the ONLY hint is the by-design query-stratum
    // side of the non-equi BNLJ; every other join must shuffle
    for (n <- Seq("s1_knn_exact", "d5b_cosine_exact")) {
      val p = planNoAutoBroadcast(n)
      assert("BroadcastExchange".r.findAllIn(p).size === 1,
        s"$n: expected exactly the query-stratum broadcast:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin"), s"$n:\n$p")
    }
    // s4/s6: the stratum id list builds the compressed query side (hash
    // semi-join) AND that bounded side feeds the coarse scan's BNLJ — two
    // hints, both ≤queryN rows; both full-precision rerank lookups shuffle
    for (n <- Seq("s4_knn_quantized", "s6_knn_reduced")) {
      val p = planNoAutoBroadcast(n)
      assert("BroadcastExchange".r.findAllIn(p).size === 2,
        s"$n: expected the stratum semi-join + coarse-scan BNLJ:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin"), s"$n:\n$p")
    }
    // anchor IVF: the nlist-row anchor table feeds one cross join per
    // scored() consumer (assignment + probes), plus the one stratum
    // semi-join on the probe side; assign/rerank joins all shuffle
    locally {
      val p = planNoAutoBroadcast("s3b_knn_ivf_anchor")
      val bx = "BroadcastExchange".r.findAllIn(p).size
      val cross = "BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(p).size
      val strat = "BroadcastHashJoin".r.findAllIn(p).size
      assert(cross >= 1 && strat === 1 && bx === cross + strat,
        s"s3b_knn_ivf_anchor: broadcast beyond anchors + stratum " +
          s"($bx vs $cross cross + $strat stratum):\n$p")
    }
    // two-level IVF (s3c): every broadcast is a BOUNDED anchor-derived
    // frame (≤ nlist ≈ √n rows: coarse anchors ×2 corpus/probe cross
    // joins, fine-group map, query stratum) — the corpus-scaled frames
    // (assignment, candidates, rerank) must all shuffle. The accounting
    // identity bx = cross + hash proves no OTHER join got a broadcast.
    locally {
      val p = planNoAutoBroadcast("s3c_knn_ivf_2level")
      val bx = "BroadcastExchange".r.findAllIn(p).size
      val cross = "BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(p).size
      val hash = "BroadcastHashJoin".r.findAllIn(p).size
      assert(cross >= 2 && hash >= 2 && bx === cross + hash,
        s"s3c_knn_ivf_2level: broadcast beyond anchors/groups/stratum " +
          s"($bx vs $cross cross + $hash hash):\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"s3c_knn_ivf_2level: corpus-side joins must shuffle:\n$p")
    }
  }

  test("funnel's three stage windows and final agg share one user shuffle") {
    val p = planOf("a10_funnel")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"expected the chained windows + groupBy to share user_id partitioning:\n$p")
  }

  test("scd2 change-point windows share one user shuffle") {
    val p = planOf("a11_scd2")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("bloom probe filters the fact scan before the semi join") {
    val p = planOf("j07_bloom_semi")
    assert(p.contains("element_at"), p) // the bit-array probe is in the plan
    assert(p.contains("LeftSemi"), p)
    // the probe must sit under the join (scan side), not above it: the
    // Filter containing element_at appears after (deeper than) the join line
    val joinAt = p.indexOf("LeftSemi")
    val probeAt = p.indexOf("element_at")
    assert(probeAt > joinAt, s"probe not pushed below the join:\n$p")
  }

  test("global sort ranks via range partitioning, never one task") {
    val p = planOf("o5_global_sort")
    assert(p.contains("rangepartitioning"), p)
    assert(!p.contains("Window"), // a global-ORDER window = one-task sort
      s"global rank must come from the offset join, not a window:\n$p")
  }

  test("t22 quality rank rides range partitioning; the only window is the w1-keyed model") {
    val p = planNoAutoBroadcast("t22_ccnet_buckets")
    assert(p.contains("rangepartitioning"),
      s"t22's tertile rank must come from withGlobalRank:\n$p")
    // the LM model's c1 window is keyed by w1 (vocabulary-partitioned);
    // no partition-less window may exist anywhere in the plan
    assert("windowspecdefinition\\(w1".r.findFirstIn(p).isDefined, p)
    assert(!"windowspecdefinition\\(aggregate".r.findFirstIn(p).isDefined &&
      !p.contains("windowspecdefinition()"), p)
  }

  test("prefix sum and equi-depth rank via range partitioning, never one task") {
    // a25's only window is keyed by the range id (__pid) — balanced by
    // construction; a partition-less window would serialize the table
    val p25 = plan(SetOpsWindows.a25AbcPareto(spark, sf0001))
    assert(p25.contains("rangepartitioning"), p25)
    assert("windowspecdefinition\\(__pid".r.findFirstIn(p25).isDefined ||
      !p25.contains("Window"),
      s"a25's running sum must be keyed by the range id:\n$p25")
    val p26 = plan(SetOpsWindows.a26EquidepthHist(spark, sf0001))
    assert(p26.contains("rangepartitioning"), p26)
    assert(!p26.contains("Window"),
      s"a26's rank must come from the offset join, not a window:\n$p26")
  }

  test("full outer recon reuses the aggregate partitioning (two shuffles)") {
    val p = planNoAutoBroadcast("j12_full_outer_recon")
    assert(p.contains("FullOuter"), s"expected a full outer join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"join must reuse the two aggregates' custkey partitioning:\n$p")
  }

  test("dup-shingle coverage never materializes pairs (no self-join)") {
    val p = planOf("d8_dup_ngram_coverage")
    assert(!p.contains("SortMergeJoin LeftOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
    // exactly the df-count join back onto the shingle table
    assert("SortMergeJoin".r.findAllIn(p).size <= 1, p)
  }

  test("interval-overlap join equi-joins on the bucket, never a cartesian") {
    val p = planNoAutoBroadcast("j08_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to an all-pairs plan:\n$p")
    assert(p.contains("SortMergeJoin [bucket"), s"expected the bucket equi-join:\n$p")
  }

  test("sample quantile filters before its only shuffle (map-side sampling)") {
    val p = planOf("approx_quantile_sample")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"expected one group shuffle over the filtered sample:\n$p")
    // the hash-threshold filter must sit below the exchange, directly on the scan
    val ex = p.indexOf("Exchange hashpartitioning")
    val fl = p.indexOf("Filter (cast(conv(substring(md5")
    assert(fl > ex && ex >= 0, s"sample filter not below the shuffle:\n$p")
  }

  test("profiler melts once: two-level exact distinct, no per-column Expand") {
    val p = planOf("dq_profile")
    assert(!p.contains("Expand"),
      s"per-column COUNT(DISTINCT) Expand crept into the profiler:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"expected exactly the (column,value) and (column) shuffles:\n$p")
  }

  test("dedup candidate/verify joins stay shuffle joins (no corpus-side hint)") {
    for (n <- Seq("d2_ngram_jaccard", "d2b_jaccard_prefix", "d3_minhash_lsh",
                  "d4_simhash", "d4b_simhash_tight", "d6_clean_corpus",
                  "d10_incremental_neardup")) {
      val p = planNoAutoBroadcast(n)
      assert(!p.contains("BroadcastExchange"),
        s"$n: corpus-scaled broadcast hint crept back in:\n$p")
    }
    // the SimHash combo self-join's declared strategy is a shuffled HASH
    // join (sort-merge buffers every >2048-row key group through a
    // spillable sorter-backed array — measured 4.7× slower at sf10), and
    // its sides carry the volume-derived repartition
    for (n <- Seq("d4_simhash", "d4b_simhash_tight")) {
      val p = planNoAutoBroadcast(n)
      assert(p.contains("ShuffledHashJoin"),
        s"$n: combo join must be a shuffled hash join:\n$p")
    }
  }

  test("two-level semdedup broadcasts only bounded anchor frames") {
    // d9b's allowed broadcasts are all BOUNDED BY CONSTRUCTION: only the
    // ncoarse ≈ √(n/256)-row coarse table broadcasts (fine-group build +
    // corpus pass 1 cross joins). The nlist = n/256-row fine-group map is
    // LINEAR in the corpus, so corpus pass 2 must be a SHUFFLED hash join
    // on g, never a broadcast (round-11 ADVICE fix). The accounting
    // identity bx = cross proves no other join got a broadcast: the
    // corpus-scaled frames (assignment, members, the within-cell pair
    // self-join) must all shuffle.
    val p = planNoAutoBroadcast("d9b_semdedup_2level")
    val bx = "BroadcastExchange".r.findAllIn(p).size
    val cross = "BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(p).size
    assert(cross >= 2 && bx === cross,
      s"d9b: broadcast beyond the coarse cross joins ($bx vs $cross):\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"d9b: the n/256-row fine-group map must not broadcast:\n$p")
    assert(p.contains("ShuffledHashJoin"),
      s"d9b: corpus pass 2 must be a shuffled hash join on g:\n$p")
    assert(!p.contains("CartesianProduct"), s"d9b:\n$p")
  }

  test("semdedup broadcasts only the nlist-row anchors; cell joins shuffle") {
    // same contract as s3b: every BroadcastExchange must pair 1:1 with a
    // printed anchor cross join (the cached members subtree prints per
    // consumer); the corpus-sized member/pair joins must all shuffle
    val p = planNoAutoBroadcast("d9_semdedup")
    val bx = "BroadcastExchange".r.findAllIn(p).size
    val cross = "BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(p).size
    assert(bx === cross && cross >= 1,
      s"d9_semdedup: broadcast beyond the anchor cross join ($bx vs $cross):\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"d9_semdedup:\n$p")
    assert(!p.contains("CartesianProduct"), s"d9_semdedup:\n$p")
  }

  test("pagerank iteration chain never hints a vertex-scaled broadcast") {
    // The rank frame is VERTEX-scaled (grows with the corpus): a broadcast
    // hint on it would be the same 100 TB driver-OOM anti-pattern the ANN
    // tier removed in round 3. AQE may still broadcast a genuinely-small
    // side at runtime — the assertion is about declared intent, so it
    // plans with stats-based auto-broadcast off and expects zero.
    for (n <- Seq("g1_pagerank", "g1b_ppr")) {
      val p = planNoAutoBroadcast(n)
      assert(!p.contains("BroadcastExchange"),
        s"$n: corpus-scaled broadcast hint in the iteration chain:\n$p")
    }
  }

  test("weighted sampling scans range-partitioned; only the offsets broadcast") {
    val p = planNoAutoBroadcast("t18_weighted_sample")
    assert(p.contains("rangepartitioning"),
      s"t18: prefix scan must ride a range partition, not a global window:\n$p")
    assert("BroadcastExchange".r.findAllIn(p).size === 1,
      s"t18: expected exactly the <=|partitions|-row offset broadcast:\n$p")
    assert(!p.contains("Window"), // a global-ORDER window = one-task scan
      s"t18: prefix sum must come from the two-pass scan, not a window:\n$p")
  }

  test("recursive CTE spine executes as UnionLoop (bounded by depth, not data)") {
    val p = planOf("sql_frontend7")
    assert(p.contains("UnionLoop"), s"sql_frontend7 lost the recursive plan:\n$p")
  }

  test("q9 deep DAG: dims broadcast and prune the fact before its only shuffle") {
    val p = planNoAutoBroadcast("q9_profit_by_nation")
    // part/supplier/nation/region ride explicit broadcast hints; the one
    // fact-to-fact join (lineitem⋈orders) must shuffle
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(p.contains("SortMergeJoin [l_orderkey"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q18 big-order filter reuses the orderkey shuffle for the join-back") {
    val p = planNoAutoBroadcast("q18_big_orders")
    // exactly: the lineitem aggregate's orderkey exchange + the orders side
    // of the join-back — the HAVING side must NOT re-shuffle
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"q18 must reuse the aggregate's l_orderkey partitioning:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q13 pre-aggregates orders below the outer join; urgency filter pushes to the scan") {
    val p = planNoAutoBroadcast("q13_cust_dist")
    // the custkey exchange must carry per-customer partial counts, not raw
    // orders: the orders-side HashAggregate sits BELOW the LeftOuter join
    val joinAt = p.indexOf("LeftOuter")
    assert(joinAt >= 0, p)
    assert(p.indexOf("HashAggregate", joinAt) >= 0,
      s"q13: orders must pre-aggregate under the outer join:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)"),
      s"q13: urgency filter must reach the orders scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q17 decorrelates the per-part average onto one lineitem exchange") {
    val p = planNoAutoBroadcast("q17_small_qty")
    // the brand key set broadcasts and prunes the fact; the per-part
    // (sum, count) attaches as a window over l_partkey — j03-style scalar
    // attach, so exactly ONE fact exchange and zero join-backs (the
    // textbook agg+join rewrite plans two exchanges: column pruning
    // specializes the subtrees and defeats static exchange reuse)
    assert(p.contains("BroadcastHashJoin"), s"q17: brand keys must broadcast:\n$p")
    assert(p.contains("Window"), s"q17: per-part stats must be a window:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"q17: one l_partkey exchange only:\n$p")
    assert("SortMergeJoin".r.findAllIn(p).size === 0,
      s"q17: no join-back:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q2 folds min-price and argmin supplier into one lineitem aggregate") {
    val p = planNoAutoBroadcast("q2_min_cost_supplier")
    // min(struct(price, suppkey)) needs no join-back against the min:
    // exactly one fact exchange (the partkey rollup); dims broadcast
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"q2: one l_partkey exchange only (no decorrelation join-back):\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p) // part+supplier+nation
    assert(!p.contains("SortMergeJoin"), s"q2: no fact-to-fact join exists:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q15 finds the max via a 1-row broadcast, never an unpartitioned window") {
    val p = planNoAutoBroadcast("q15_top_supplier")
    // the global max must come back as a broadcast scalar — a window over
    // the supplier rollup would funnel a corpus-scaled frame into 1 task
    assert(!p.contains("Window"), s"q15: no unpartitioned window:\n$p")
    // the rollup is CACHED (it feeds both the max and the winner filter);
    // the cached subtree prints once per consumer, so assert the cache is
    // actually shared instead of counting its printed exchanges
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"q15: the supplier rollup must be cache-shared by max + filter:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p) // max scalar + supplier
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q7 nation prefilters broadcast; lineitem-orders is the only fact shuffle") {
    val p = planNoAutoBroadcast("q7_volume_shipping")
    // the two-nation disjunction is factored into supplier/customer
    // broadcast prefilters (each with its own broadcast nation join) —
    // the OR never reaches the fact join as a residual cartesian
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(p.contains("SortMergeJoin [l_orderkey"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t20 canonicalization is map-side; the election is its only shuffle") {
    val p = planNoAutoBroadcast("t20_url_canonical")
    // regexp/split/sort_array all ride the scan projection — exactly one
    // exchange (the canonical-key groupBy), no join, no window
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"t20: one canonical-key exchange only:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("q8 dim chain broadcasts and prunes the fact before its only shuffle") {
    val p = planNoAutoBroadcast("q8_market_share")
    // part filter, supplier→nation, customer→nation→region all ride
    // explicit broadcast hints; lineitem⋈orders is the one fact shuffle
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 5, p)
    assert(p.contains("SortMergeJoin [l_orderkey"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q11 takes the scalar total as a 1-row broadcast over the cache-shared rollup") {
    val p = planNoAutoBroadcast("q11_important_stock")
    // never an unpartitioned window over the per-part rollup
    assert(!p.contains("Window"), s"q11: no unpartitioned window:\n$p")
    // the rollup feeds BOTH the scalar total and the HAVING filter via cache
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"q11: the per-part rollup must be cache-shared:\n$p")
    assert("BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(p).size === 1,
      s"q11: exactly the 1-row total cross join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q22 decorrelates the scalar avg to a 1-row cross and NOT EXISTS to an anti join") {
    val p = planNoAutoBroadcast("q22_inactive_rich")
    assert("BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(p).size === 1,
      s"q22: exactly the 1-row stats cross join:\n$p")
    assert(p.contains("LeftAnti"), s"q22: NOT EXISTS must be an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q19's disjunctive predicate stays a residual on the partkey equi join") {
    val p = planNoAutoBroadcast("q19_discounted_revenue")
    // the partkey equality is common to every disjunct: the plan must be
    // one hash join with the OR block evaluated post-match — an engine
    // that can't factor it out of the OR falls into a nested loop
    assert(p.contains("BroadcastHashJoin"), s"q19:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q19: the OR block must not degrade the join:\n$p")
  }

  test("q21 decorrelates both EXISTS branches into one lineitem exchange") {
    val p = planNoAutoBroadcast("q21_waiting_suppliers")
    // exactly: lineitem's one l_orderkey repartition (both rollups and the
    // orders join reuse it), the orders side of the status join, and the
    // final tiny (n_name, s_name) aggregate — a second lineitem-scaled
    // exchange means a subquery branch stopped sharing the pass
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 3,
      s"q21 must decide both correlated branches on one lineitem shuffle:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 2, p) // supplier + nation
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q4/q4b decorrelate EXISTS/NOT-EXISTS to one semi/anti join, no join-back") {
    for ((name, join) <- Seq("q4_order_priority" -> "LeftSemi",
                             "q4b_priority_clean" -> "LeftAnti")) {
      val p = planNoAutoBroadcast(name)
      // exactly: orders + lineitem key exchanges and the 5-row final agg —
      // a 4th exchange would mean the correlated branch re-shuffled a fact
      assert("Exchange hashpartitioning".r.findAllIn(p).size === 3, s"$name:\n$p")
      assert(p.contains(s"SortMergeJoin") && p.contains(join), s"$name:\n$p")
      // the count aggregates map-side before its exchange
      assert(p.contains("partial_count"), s"$name:\n$p")
    }
  }

  test("q16 distinct-projects the pair BEFORE the joins; dims broadcast") {
    val p = planNoAutoBroadcast("q16_supplier_cnt")
    // pair distinct + (brand,type,size,supp) distinct + final agg
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 3, p)
    // part (inner) and complaint-suppliers (anti) both broadcast by hint
    assert("BroadcastHashJoin".r.findAllIn(p).size === 2, p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q20 rolls lineitem up on ONE (supp, part) shuffle; nested IN is a semi join") {
    val p = planNoAutoBroadcast("q20_excess_suppliers")
    // (l_suppkey, l_partkey) rollup + qualifying-supplier distinct +
    // supplier side of the semi join
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 3, p)
    assert("BroadcastHashJoin".r.findAllIn(p).size === 2, p) // part + nation
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("partial_sum"), p) // rollup combines map-side
  }

  /** At 100 TB a handful of hot order keys WILL dwarf the median shuffle
    * partition; the engine's declared answer is AQE skew-join splitting
    * (GraftSession leaves it on), not manual salting of every join. This
    * pins that the mechanism actually fires on this session's config: a
    * synthetic hot-key join with test-scaled thresholds must show a skewed
    * AQEShuffleRead in the final adaptive plan. */
  test("AQE splits a skewed fact join at runtime (q9/q18 shape)") {
    import org.apache.spark.sql.functions.{col, when, lit}
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(0, 60000)
        .select(when(col("id") < 50000, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"))
      val j = fact.join(dim, "k")
      // execute j ITSELF (not a derived count plan) so the adaptive plan
      // finalizes and the skew decision is visible on j's queryExecution
      assert(j.collect().length === 50000) // only the hot key matches the dim
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skewed"),
        s"AQE skew-join split did not fire on the hot key:\n$p")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  /** The iterative graph chains' whole 100 TB cost model rests on one claim:
    * the checkpointed edge frame enters EVERY iteration already partitioned
    * on src, so per-round shuffles touch only vertex-sized frames, never the
    * edge list. Under AQE a plain `localCheckpoint()` silently claims
    * UnknownPartitioning (AdaptiveSparkPlanExec hides the final plan's
    * partitioning) and every round re-exchanged all of E — this pin is what
    * caught that. It asserts (a) the LogicalRDD's partitioning claim itself
    * and (b) the exact exchange count of one iteration's plan, with
    * auto-broadcast off so the declared shuffle intent is visible. */
  test("graph iteration steps never re-shuffle the checkpointed edge frame") {
    import graft.operators.Graph
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum}
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.get(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.{collect_list, struct}
      val edges = (0L until 400L).map(i => (i % 20, (i * 7 + 3) % 20))
        .toDF("src", "dst")
      // the PRODUCTION adjacency builder (hub-split representation): the
      // posexplode must not break the groupBy's hash(src) claim
      val adj = Graph.checkpointPartitioned(
        Graph.adjacency(edges, Graph.defaultMaxAdjLen), "src")
      val claim = adj.queryExecution.analyzed.asInstanceOf[LogicalRDD]
        .outputPartitioning
      assert(claim.isInstanceOf[HashPartitioning] &&
        claim.asInstanceOf[HashPartitioning].expressions.map(_.sql) == Seq("src"),
        s"checkpointed adjacency frame lost its partitioning claim: $claim")

      // ranks built the production way: a partitioning-preserving lazy
      // checkpoint, so the rank-side claim makes the round join
      // exchange-free — ONE exchange per round (the combined dst partials)
      val ranks0 = graft.util.Checkpoints.partitionedLazy(
        adj.filter(col("part") === 0)
          .select(col("src").as("id"), lit(1000L).as("r")), "id")
      val pr0 = plan(Graph.pageRankStep(adj, ranks0, 7L))
      assert("Exchange hashpartitioning".r.findAllIn(pr0).size === 1,
        s"pageRank round 1 re-shuffles a frame it should not:\n$pr0")
      // steady state (round 2+): the previous round's OUTPUT re-enters
      val ranks1 = graft.util.Checkpoints.partitionedLazy(
        Graph.pageRankStep(adj, ranks0, 7L), "id")
      val pr1 = plan(Graph.pageRankStep(adj, ranks1, 7L))
      assert("Exchange hashpartitioning".r.findAllIn(pr1).size === 1,
        s"pageRank steady-state round re-shuffles a frame it should not:\n$pr1")

      val dist = edges.select(col("src").as("id")).distinct().limit(3)
        .select(col("id"), lit(0).cast("int").as("hops")).localCheckpoint(false)
      // steady state: round 2 consumes a claim-carrying frontier — its
      // adjacency join is exchange-free; exactly the new-candidate distinct
      // + the settled side of the anti probe remain
      val next1 = graft.util.Checkpoints.partitionedLazy(
        Graph.bfsStep(adj, dist.select("id"), dist, 1), "id")
      val dist1 = dist.unionByName(next1).localCheckpoint(false)
      val bfs = plan(Graph.bfsStep(adj, next1.select("id"), dist1, 2))
      assert("Exchange hashpartitioning".r.findAllIn(bfs).size === 2,
        s"bfs steady-state round re-shuffles the adjacency or frontier:\n$bfs")

      // the PRODUCTION adjacency shape: seed flag folded into the one
      // checkpoint, vertices a mere projection of it (its hash(src) claim
      // must rewrite through the alias to hash(id) for the attach join to
      // stay exchange-free — exactly what this pin protects)
      val wedges = edges.withColumn("w", lit(1L))
      val seedF = edges.select(col("src")).distinct().limit(3)
        .withColumn("is_seed", lit(true))
      val adjW = Graph.checkpointPartitioned(
        wedges.groupBy("src").agg(
          collect_list(struct(col("dst"), col("w"))).as("adj"),
          sum(col("w")).as("wsum"))
          .join(seedF, Seq("src"), "left")
          .select(col("src"), col("adj"), col("wsum"),
            coalesce(col("is_seed"), lit(false)).as("is_seed")), "src")
      val vertices = adjW.select(col("src").as("id"), col("is_seed"))
      val ranksW = graft.util.Checkpoints.partitionedLazy(
        vertices.select(col("id"), lit(1000L).as("r")), "id")
      val ppr = plan(Graph.pprStep(adjW, vertices, ranksW, 7L))
      // exactly: the dst aggregation — the rank-side contrib join AND the
      // projected-vertices attach join are both exchange-free (contrib's
      // aggregate output is already hash(id))
      assert("Exchange hashpartitioning".r.findAllIn(ppr).size === 1,
        s"ppr step re-shuffles the adjacency, rank, or vertices frame:\n$ppr")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  /** g1b's pair-weight derivation: one explicit repartition on (c, s) must
    * serve BOTH the triple dedup and the per-pair count — hash(c, s)
    * co-locates every (c, s, ok) triple of a pair, so neither aggregate may
    * plan its own exchange. A naive `groupBy(c, s).agg(countDistinct(ok))`
    * plans two (dedup on hash(c, s, ok), re-shuffle to hash(c, s)); this
    * pin holds the setup at the single-exchange form. */
  test("g1b pair weights dedup and count on one (c, s) exchange") {
    import graft.operators.Graph
    import spark.implicits._
    val triples = (0L until 600L).map(i => (i % 20, (i * 7) % 15, i % 50))
      .toDF("c", "s", "ok")
    // the PRODUCTION chain (g1bPersonalized's pair-weight derivation), not
    // a re-spelled copy — a refactor of pairWeightsFrom fails this pin
    val pw = Graph.pairWeightsFrom(triples)
    val p = plan(pw)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"pair-weight chain should reuse the one (c, s) repartition:\n$p")
  }
}
