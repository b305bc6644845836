package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val out = SemDedup.d9SemDedup(spark, sf0001)
    .as[(Long, Long, Long, Double)].collect()

  test("d9: drops are non-vacuous, above threshold, and well-formed") {
    assert(out.nonEmpty, "tau=0.3 must find semantic near-dups at sf0.001")
    out.foreach { case (dropped, kept, _, cos) =>
      assert(dropped != kept)
      assert(cos >= 0.3 && cos <= 1.0 + 1e-9, s"cos out of range: $cos")
    }
    // one audit row per dropped doc
    assert(out.map(_._1).distinct.length === out.length)
  }

  test("d9: the kept side of every pair has the higher quality (tie: smaller id)") {
    val q = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    out.foreach { case (dropped, kept, _, _) =>
      val (qd, qk) = (q(dropped), q(kept))
      assert(qk > qd || (qk == qd && kept < dropped),
        s"winner rule violated: kept=$kept(q=$qk) dropped=$dropped(q=$qd)")
    }
  }

  test("d9: every reported pair shares the reported cell under the anchor rule") {
    // recompute the assignment exactly as the operator does and check the
    // audit's cell column agrees for both endpoints
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val nlist = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    val ak = Dedup.md5Hash60(concat(lit("semdedup|"), col("vec_id").cast("string")))
    val anchorIds = emb.select(col("vec_id"), ak.as("ak"))
      .orderBy("ak", "vec_id").limit(nlist)
      .select("vec_id").as[Long].collect().toSet
    assert(anchorIds.size === nlist)
    val cells = out.map(_._3).toSet
    assert(cells.subsetOf(anchorIds), "audit cells must be anchor ids")
  }

  lazy val out2 = SemDedup.d9bSemDedup2Level(spark, sf0001)
    .as[(Long, Long, Long, Double)].collect()

  test("d9b: drops are non-vacuous, above threshold, and well-formed") {
    assert(out2.nonEmpty, "tau=0.3 must find semantic near-dups at sf0.001")
    out2.foreach { case (dropped, kept, _, cos) =>
      assert(dropped != kept)
      assert(cos >= 0.3 && cos <= 1.0 + 1e-9, s"cos out of range: $cos")
    }
    assert(out2.map(_._1).distinct.length === out2.length)
    val q = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    out2.foreach { case (dropped, kept, _, _) =>
      val (qd, qk) = (q(dropped), q(kept))
      assert(qk > qd || (qk == qd && kept < dropped))
    }
  }

  test("d9b: cells are hash-threshold anchors; coarse prefix is non-trivial") {
    // replay the threshold rule driver-side with the IDENTICAL arithmetic
    // (divide first, then multiply, then floor) and check the audit cells
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val nlist = math.max(16L, n / 256L)
    val ncoarse = math.max(2L, math.ceil(math.sqrt(nlist.toDouble)).toLong)
    val scale = (1L << 60).toDouble / n.toDouble
    val tAnchor = math.floor(scale * nlist).toLong
    val tCoarse = math.floor(scale * ncoarse).toLong
    val ak = Dedup.md5Hash60(concat(lit("semdedup2|"), col("vec_id").cast("string")))
    val aks = emb.select(col("vec_id"), ak.as("akk")).as[(Long, Long)].collect()
    val anchorIds = aks.collect { case (id, k) if k < tAnchor => id }.toSet
    val coarseIds = aks.collect { case (id, k) if k < tCoarse => id }.toSet
    // no sort anywhere: the rule must still yield a usable quantizer here
    assert(anchorIds.size >= 4, s"degenerate anchor draw: ${anchorIds.size}")
    assert(coarseIds.nonEmpty && coarseIds.subsetOf(anchorIds))
    assert(coarseIds.size < anchorIds.size, "hierarchy must be non-trivial")
    assert(out2.map(_._3).toSet.subsetOf(anchorIds),
      "audit cells must be hash-threshold anchor ids")
  }

  test("d9b recall: two-level assignment recovers most of the flat dropped set") {
    // The hierarchical-recall trade, MEASURED (round-11 VERDICT ask): a
    // vector whose best fine anchor sits in another coarse group lands in
    // a near-optimal cell and may miss a partner the flat n·nlist argmax
    // pairs it with. The control uses the SAME hash-threshold anchors
    // with exhaustive assignment, so the diff is exactly what the
    // hierarchy loses — a d9-vs-d9b comparison would be dominated by the
    // different anchor salt instead. Same contract IvfSpec pins for s3c.
    val emb = Tables.embeddings(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val n = emb.count()
    def recallAt(nlist: Long): (Double, Int, Int) = {
      val flat = SemDedup.semDedupDropsFlatThreshold(emb, docs, n, 0.3, nlist)
        .select("doc_id").as[Long].collect().toSet
      val two = SemDedup.semDedupDropsTwoLevel(emb, docs, n, 0.3, nlist)
        .select("doc_id").as[Long].collect().toSet
      assert(flat.nonEmpty)
      (two.intersect(flat).size.toDouble / flat.size,
        two.intersect(flat).size, flat.size)
    }
    // production parameterization at this n: nlist floor = 16, ncoarse = 4
    // — the hierarchy is maximally coarse (a vector scans only 4-of-16
    // anchors through its coarse pick), so this is the WORST measured
    // point of the trade; the floor is deliberately the measured value
    // minus slack, not an aspiration (measured 0.569 at pin time)
    val (r16, h16, f16) = recallAt(16L)
    info(f"recall at nlist=16/ncoarse=4 (production floor regime): $r16%.3f ($h16/$f16)")
    assert(r16 >= 0.45, f"degenerate-regime recall collapsed: $r16%.3f < 0.45")
    // richer hierarchy (nlist=64, ncoarse=8) on the same corpus: measured
    // 0.507 at pin time. This synthetic corpus is near-isotropic — the
    // known WORST case for a coarse-quantizer hierarchy (coarse argmax
    // carries little information when anchors are random directions), so
    // ~0.5 is the trade's floor, not its typical value on clustered real
    // embeddings. Pinned absolutely: the docstring's claim is now a
    // measured number either way, which is what the round-11 ask wanted.
    val (r64, h64, f64) = recallAt(64L)
    info(f"recall at nlist=64/ncoarse=8: $r64%.3f ($h64/$f64)")
    assert(r64 >= 0.40, f"recall collapsed at the richer hierarchy: $r64%.3f < 0.40")
  }

  test("d9 dispatch routes each cardinality regime to its measured winner") {
    // Round-11 dispatch ask. Measured (targeted bench, this box; n =
    // embeddings cardinality): n=500 (sf0.001): d9 0.99 s vs d9b 1.14 s,
    // (sf0.01): 1.58 vs 1.38 — a wash within box noise; n=2000 (sf0.1):
    // 2.27 vs 1.86; n=200000 (sf10, r10 campaign): 55.9 vs 10.0. The
    // cutover (1024) must route the sub-cutover corpus flat and
    // everything measured above it two-level.
    assert(SemDedup.chooseSemDedup(500L) === "flat")
    assert(SemDedup.chooseSemDedup(2000L) === "two-level")
    assert(SemDedup.chooseSemDedup(200000L) === "two-level")
    // the auto entry's output IS the routed branch's output (sf0.001:
    // n = 500 -> flat -> identical to d9)
    val emb = Tables.embeddings(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val auto = SemDedup.semDedupAuto(emb, docs, emb.count(), 0.3)
      .select("doc_id", "kept_id").as[(Long, Long)].collect().toSet
    assert(auto === out.map(t => (t._1, t._2)).toSet)
  }

  test("cell cap: hard size bound, drops a subset of uncapped, default off") {
    val emb = Tables.embeddings(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    val n = emb.count()
    val nlist = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    // sf0.001 has 500 vectors over ~23 cells — average ~22/cell, so an
    // 8-member cap forces real re-splits
    val capped = SemDedup.semDedupDrops(emb, docs, nlist, 0.3, maxCell = 8)
      .as[(Long, Long, Long, Double)].collect()
    val uncapped = SemDedup.semDedupDrops(emb, docs, nlist, 0.3)
      .as[(Long, Long, Long, Double)].collect()
    // capped candidate pairs are a subset ⇒ every capped drop also drops
    // uncapped (possibly via a different strongest partner), and its
    // reported cosine cannot exceed the uncapped strongest
    val unc = uncapped.map(d => d._1 -> d._4).toMap
    assert(capped.nonEmpty)
    capped.foreach { case (dropped, _, _, cos) =>
      assert(unc.contains(dropped), s"capped-only drop $dropped")
      assert(cos <= unc(dropped) + 1e-12)
    }
    // the hard bound itself, on a synthetic 100-member hot cell: every
    // sub-cell ≤ cap, membership partitioned exactly
    val hot = (0L until 100L).map(i => (i, 7L)).toDF("vec_id", "cell")
    val sizes = SemDedup.capCells(hot, 8)
      .groupBy("cell", "sub").count().as[(Long, Long, Long)].collect()
    assert(sizes.map(_._3).sum === 100L)
    assert(sizes.forall(_._3 <= 8L), s"cap violated: ${sizes.mkString(",")}")
    assert(sizes.length === 13) // ⌈100/8⌉ sub-cells
    assert(sizes.forall(_._1 === 7L), "base cell id preserved, never packed")
    // cell ids beyond 2^31 must not collide sub-cells across cells
    val big = ((0L until 20L).map(i => (i, 3000000000L)) ++
      (20L until 40L).map(i => (i, 3000000001L))).toDF("vec_id", "cell")
    val bigKeys = SemDedup.capCells(big, 8)
      .select("cell", "sub").distinct().as[(Long, Long)].collect()
    assert(bigKeys.map(_._1).distinct.length === 2,
      "distinct big cells must stay distinct after capping")
  }
}
