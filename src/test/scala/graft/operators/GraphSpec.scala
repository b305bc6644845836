package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank: scaled-integer determinism and fixed-point structure. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = {
    val df = pairs.toDF("src", "dst")
    df.unionByName(df.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("symmetric path graph: center outranks endpoints, endpoints tie") {
    // 1 - 2 - 3 (symmetrized): vertex 2 has degree 2, the ends degree 1.
    val r = Graph.pageRank(edges(1L -> 2L, 2L -> 3L), 5)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r(2) > r(1), s"center must outrank an endpoint: $r")
    assert(r(1) == r(3), s"symmetric endpoints must tie exactly: $r")
  }

  test("star graph: hub gets the maximum rank") {
    val r = Graph.pageRank(edges(10L -> 1L, 10L -> 2L, 10L -> 3L, 10L -> 4L), 5)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r(10L) == r.values.max, s"hub must dominate: $r")
    assert(Seq(1L, 2L, 3L, 4L).map(r).distinct.size == 1,
      s"leaves must tie exactly: $r")
  }

  test("rank mass is conserved up to integer-division truncation") {
    val n = 5
    val r = Graph.pageRank(
      edges((1 to 4).map(i => i.toLong -> 5L): _*), 5)
      .agg(sum("r")).head().getLong(0)
    // Each of 5 iterations can truncate < 1 unit per vertex at the teleport
    // division plus < 1 per edge contribution and < 1 at the 85/100 step.
    val slack = 5L * (n + 2L * 4 + n)
    assert(r <= Graph.Scale && r >= Graph.Scale - slack,
      s"mass $r should be within $slack below ${Graph.Scale}")
  }

  test("result is invariant under input partitioning (integer math)") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L)
    val a = Graph.pageRank(e.repartition(1), 5).orderBy("id").collect().toSeq
    val b = Graph.pageRank(e.repartition(7), 5).orderBy("id").collect().toSeq
    assert(a == b, "scaled-integer ranks must not depend on partitioning")
  }

  test("personalized: relevance stays with the seed's component") {
    // Two components: a seeded chain and an unseeded pair. PPR mass can
    // only enter a vertex from the teleport (seeds) or a neighbor, so the
    // unseeded component must finish at exactly zero — the property that
    // distinguishes PPR from global PageRank. (Strict distance decay is
    // NOT asserted: a 5-round power schedule still carries parity
    // oscillation on a short chain.)
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 11L)
      .withColumn("w", lit(1L))
    val r = Graph.personalizedPageRank(e, Seq(1L).toDF("id"), 5)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r(10) == 0L && r(11) == 0L,
      s"unseeded component must hold zero rank: $r")
    assert(r(2) > r(3), s"hop 1 must outrank hop 2: $r")
    assert(Seq(1L, 2L, 3L, 4L).forall(r(_) > 0L),
      s"every vertex in the seeded component must be reached: $r")
  }

  test("weighted: the heavier edge carries proportionally more rank") {
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val sym = e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val r = Graph.personalizedPageRank(sym, Seq(1L).toDF("id"), 5)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r(2) > r(3), s"w=3 neighbor must outrank w=1 neighbor: $r")
    // leaves only ever receive from the seed, split w=3 : w=1 — the ratio
    // is exactly 3 up to integral-division truncation
    assert(math.abs(r(2) - 3L * r(3)) <= 1000L, s"split must stay 3:1: $r")
  }

  test("triangleCounts on K4 plus a pendant path") {
    // K4 on {1,2,3,4}: C(4,3)=4 triangles, every vertex in exactly 3.
    // Path 4-10-11 adds no triangle and its vertices must not appear.
    val k4 = for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)
    val e = (k4 ++ Seq((4L, 10L), (10L, 11L))).toDF("u", "v")
    val r = Graph.triangleCounts(e)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts matches brute force on a pseudo-random graph") {
    // deterministic edge set: (u,v) present iff md5-ish mix is even
    val n = 24L
    val all = for (u <- 1L to n; v <- (u + 1) to n) yield (u, v)
    val edges = all.filter { case (u, v) => (u * 2654435761L + v * 40503L) % 3 == 0 }
    val eset = edges.toSet
    var perVertex = Map.empty[Long, Long].withDefaultValue(0L)
    for (x <- 1L to n; y <- (x + 1) to n; z <- (y + 1) to n)
      if (eset((x, y)) && eset((y, z)) && eset((x, z))) {
        perVertex = perVertex.updated(x, perVertex(x) + 1)
          .updated(y, perVertex(y) + 1).updated(z, perVertex(z) + 1)
      }
    val got = Graph.triangleCounts(edges.toDF("u", "v"))
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(got === perVertex.filter(_._2 > 0L).toMap)
  }

  test("triangleCounts on a clique (max-out-degree apex shape)") {
    // K25: C(25,3)=2300 triangles, each vertex in C(24,2)=276. A clique is
    // the worst case for per-apex wedge fan-out (the lowest-ordered vertex
    // keeps ALL its edges under the orientation) — the shape the two-
    // generator pairing chain must handle without materializing an
    // outdeg²/2 pair array in one row (ADVICE round-11 medium finding).
    val k = 25L
    val e = (for (u <- 1L to k; v <- (u + 1) to k) yield (u, v)).toDF("u", "v")
    val r = Graph.triangleCounts(e)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r === (1L to k).map(_ -> 276L).toMap)
  }

  test("triangleCounts bloom-pruned and bloomless paths agree (conditional prune)") {
    // the round-12 cutover skips the bloom stage below bloomMinEdges; both
    // code paths must count identically — the prune is exactness-neutral
    val n = 24L
    val all = for (u <- 1L to n; v <- (u + 1) to n) yield (u, v)
    val edges = all.filter { case (u, v) => (u * 2654435761L + v * 40503L) % 3 == 0 }
      .toDF("u", "v")
    val noBloom = Graph.triangleCounts(edges, bloomCutover = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val withBloom = Graph.triangleCounts(edges, bloomCutover = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withBloom === noBloom)
    assert(noBloom.nonEmpty)
  }

  test("bfsHops matches brute-force BFS on a pseudo-random graph") {
    val n = 20L
    val all = for (u <- 1L to n; v <- 1L to n if u != v) yield (u, v)
    val dirEdges = all.filter { case (u, v) => (u * 2654435761L + v * 40503L) % 7 == 0 }
    // brute force: frontier expansion over the directed edge set
    val adj = dirEdges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    val seeds = Set(1L, 2L)
    var want = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (h <- 1 to 4) {
      val next = frontier.flatMap(adj) -- want.keySet
      want = want ++ next.map(_ -> h)
      frontier = next
    }
    val got = Graph.bfsHops(dirEdges.toDF("src", "dst"),
        seeds.toSeq.toDF("id"), 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === want)
  }

  test("bfsHops: off-graph seed surfaces at hop 0 and expands nothing") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.bfsHops(e, Seq(1L, 99L).toDF("id"), 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 99L -> 0, 2L -> 1, 3L -> 2))
  }

  test("g3 on sf0.001: seeds at 0, bipartite parity of hops, cap respected") {
    val out = Graph.g3BfsHops(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 4))
    // bipartite invariant: customers sit at even hops, suppliers at odd
    // (every edge crosses the partition, seeds are customers)
    out.foreach { r =>
      val even = r.getInt(2) % 2 == 0
      assert(if (r.getString(0) == "customer") even else !even,
        s"bipartite parity violated: $r")
    }
  }

  test("hub-split adjacency reproduces unsplit ranks and BFS exactly") {
    import org.apache.spark.sql.functions.col
    // hub 0 ↔ 1..40 plus a tail chain — degree 41 at the hub, so a split
    // length of 7 forces the hub's list across 6 rows while every other
    // vertex stays single-row
    val pairs = (1L to 40L).map(i => (0L, i)) ++ Seq((40L, 41L), (41L, 42L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val split = Graph.adjacency(edges, 7)
    assert(split.filter(col("src") === 0L).count() === 6)
    // every split row carries the TOTAL degree, and slices partition the set
    val hubRows = split.filter(col("src") === 0L).collect()
    assert(hubRows.forall(_.getAs[Int]("deg") === 40))
    assert(hubRows.flatMap(_.getSeq[Long](3)).sorted === (1L to 40L))
    // row-local ⌊r/deg⌋ makes the split exact: identical ranks either way
    def ranks(maxLen: Int) = Graph.pageRank(edges, 5, maxLen)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ranks(7) === ranks(Graph.defaultMaxAdjLen))
    // BFS is degree-free; split rows' neighbors union under the distinct
    val hops = Graph.bfsHops(edges, Seq(0L).toDF("id"), 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hops(0L) === 0 && hops(1L) === 1 && hops(41L) === 2 && hops(42L) === 3)
  }

  test("g1 runs on sf0.001 with full-rank tie-break ordering") {
    val out = Graph.g1PageRank(spark, sf0001).collect()
    assert(out.length == 100)
    val ranks = out.map(_.getLong(2))
    assert(ranks.sameElements(ranks.sortBy(-_)), "must be rank-descending")
    assert(out.map(_.getString(0)).toSet.subsetOf(Set("customer", "supplier")))
  }
}
