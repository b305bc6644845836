package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001)
  // the engine's fixed-count query stratum, so recall comparisons against
  // bruteForceTopK (which picks the same stratum internally) line up
  lazy val queries = emb.join(Knn.queryIds(emb), "vec_id")
  lazy val index = Ivf.build(emb, nlist = 8)

  test("index assigns every vector to exactly one of nlist cells") {
    assert(index.assignments.count() === emb.count())
    val cells = index.assignments.select("cell").distinct().as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < 8))
    assert(index.centroids.length === 8)
  }

  test("probing all cells reproduces exact brute-force top-k") {
    val full = Ivf.search(index, queries, k = 5, nprobe = 8)
      .select("a_id", "rk", "b_id").as[(Long, Int, Long)].collect().toSet
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "rk", "b_id").as[(Long, Int, Long)].collect().toSet
    assert(full === exact)
  }

  test("sampled quantizer fit keeps full-corpus assignment and recall floor") {
    // the 100 TB path: k-means sees only the hash-sample, assignment and
    // search still cover every vector
    val sampled = Ivf.build(emb, nlist = 8, fitFrac = 0.5)
    assert(sampled.assignments.count() === emb.count())
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val approx = Ivf.search(sampled, queries, k = 5, nprobe = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // all-cells probe over a sampled-fit index is still exhaustive search
    assert(approx === exact)
    // and the sample itself is deterministic: same frac -> same centroids
    val again = Ivf.build(emb, nlist = 8, fitFrac = 0.5)
    assert(sampled.centroids.map(_._2.toSeq).toSeq === again.centroids.map(_._2.toSeq).toSeq)
  }

  test("anchor IVF: probing all cells reproduces exact brute-force top-k") {
    // with nprobe = nlist every cell is probed, so the deterministic-anchor
    // quantizer must not change the answer — only prune it at lower nprobe
    val full = Ivf.anchorIvfTopK(emb, nlist = 8, nprobe = 8, k = 5)
      .select("a_id", "rk", "b_id").as[(Long, Int, Long)].collect().toSet
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "rk", "b_id").as[(Long, Int, Long)].collect().toSet
    assert(full === exact)
  }

  test("anchor IVF: pruned probe keeps a recall floor and exact dots") {
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val approx = Ivf.anchorIvfTopK(emb, nlist = 8, nprobe = 3, k = 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(approx.nonEmpty && recall >= 0.3, s"recall=$recall")
    val truth = Knn.bruteForceTopK(emb, emb.count().toInt).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("dot")).toMap
    Ivf.anchorIvfTopK(emb, nlist = 8, nprobe = 3, k = 5).collect().foreach { r =>
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      truth.get(key).foreach(d => assert(math.abs(d - r.getAs[Double]("dot")) < 1e-12))
    }
  }

  test("nprobe trades recall for cost, stays above a sane floor") {
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val approx = Ivf.search(index, queries, k = 5, nprobe = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(approx.nonEmpty && recall >= 0.3, s"recall=$recall")
    // every reported dot is a true dot product
    val dots = Ivf.search(index, queries, k = 5, nprobe = 3).collect()
    val truth = Knn.bruteForceTopK(emb, emb.count().toInt).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("dot")).toMap
    dots.foreach { r =>
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      truth.get(key).foreach(d => assert(math.abs(d - r.getAs[Double]("dot")) < 1e-12))
    }
  }

  test("two-level anchor IVF: all-cells probe reproduces exact brute-force top-k") {
    // whatever cell the hierarchical assignment picks for a vector, probing
    // every cell must see every vector — the quantizer may only PRUNE
    val full = Ivf.twoLevelAnchorTopK(emb, nlist = 8, nprobe = 8, k = 5)
      .select("a_id", "rk", "b_id").as[(Long, Int, Long)].collect().toSet
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "rk", "b_id").as[(Long, Int, Long)].collect().toSet
    assert(full === exact)
  }

  test("two-level anchor IVF: pruned probe keeps a recall floor and exact dots") {
    // the hierarchical assignment is an approximation of s3b's flat argmax;
    // this pins that the approximation still lands vectors in probe-findable
    // cells (recall floor) and never fabricates scores (exact dots)
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val approx = Ivf.twoLevelAnchorTopK(emb, nlist = 8, nprobe = 3, k = 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(approx.nonEmpty && recall >= 0.3, s"recall=$recall")
    val truth = Knn.bruteForceTopK(emb, emb.count().toInt).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("dot")).toMap
    Ivf.twoLevelAnchorTopK(emb, nlist = 8, nprobe = 3, k = 5).collect().foreach { r =>
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      truth.get(key).foreach(d => assert(math.abs(d - r.getAs[Double]("dot")) < 1e-12))
    }
  }

  test("s3 anchor-family dispatch routes each cardinality regime to its measured winner") {
    // Round-11 dispatch ask. Measured (targeted bench, this box; n =
    // embeddings cardinality; sf10 from the r10 campaign): n=500 (sf0.01):
    // s3b 0.93 s vs s3c 1.18 s; n=2000 (sf0.1): 1.05 vs 1.24; n=20000
    // (sf1): 4.70 vs 2.95 — two-level already 1.6× ahead; n=200000
    // (sf10): 70.8 vs 9.6. The cutover (8192) sits in the measured
    // (2k, 20k) bracket, erring toward two-level (flat's wrong-side cost
    // grows as n^1.5); every measured point must route to its winner.
    assert(Ivf.chooseAnchorIvf(500L) === "flat")
    assert(Ivf.chooseAnchorIvf(2000L) === "flat")
    assert(Ivf.chooseAnchorIvf(20000L) === "two-level")
    assert(Ivf.chooseAnchorIvf(200000L) === "two-level")
    // the auto entry's output IS the routed branch's (sf0.001 -> flat)
    val auto = Ivf.s3dKnnAuto(spark, sf0001)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val flat = Ivf.s3bKnnIvfAnchor(spark, sf0001)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(auto === flat && auto.nonEmpty)
  }

  test("centroidTopK probing all cells reproduces exact brute-force top-k") {
    // literal-centroid search must be exhaustive when every cell is probed,
    // regardless of how good the fitted centroids are
    val cents = Ivf.fitCentroids(emb, nlist = 8)
    val full = Ivf.centroidTopK(emb, cents, nprobe = 8, k = 5)
      .select("a_id", "rk", "b_id").as[(Long, Int, Long)].collect().toSet
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "rk", "b_id").as[(Long, Int, Long)].collect().toSet
    assert(full === exact)
  }

  test("s3 registers a fitted-centroid oracle after running") {
    Ivf.s3KnnIvf(spark, sf0001).collect()
    val sql = Ivf.oracle.get("s3_knn_ivf")
    assert(sql.isDefined, "s3 must register its oracle SQL at query time")
    assert(sql.get.contains("cents(cell, ce, hcc) AS (VALUES"))
    // every centroid row carries maxDims e-notation literals + the ½‖c‖²
    // constant; spot-check the literal format round-trips (no locale commas)
    assert(!sql.get.contains("e-0,") && !sql.get.contains(",0e"))
  }

  test("s3_knn_ivf output matches the committed sf0.01 golden cell-exactly") {
    // Since round 9 s3 is ALSO oracle-gated (fitted centroids inlined as
    // literals); the golden stays as a second, in-repo gate over the full
    // quantizer/probe pipeline at the driver-gate scale. Every reported dot
    // is additionally verified exact against brute force above.
    // Regenerate deliberately with
    //   GRAFT_GOLDEN_REGEN=true sbt "testOnly graft.similarity.IvfSpec"
    // and review the diff before committing.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val golden = Paths.get("src/test/resources/golden/s3_sf0.01.csv")
    val got = Ivf.s3KnnIvf(spark, sf001)
      .collect()
      // explicit interpolation, NOT Seq(...).mkString — a Seq of mixed
      // numerics infers Seq[Double] and silently widens the long ids
      .map(r => s"${r.getLong(0)},${r.getInt(1)},${r.getLong(2)},${r.getDouble(3)}")
      .toSeq
    if (sys.env.get("GRAFT_GOLDEN_REGEN").contains("true")) {
      Files.createDirectories(golden.getParent)
      Files.write(golden, got.asJava)
      fail(s"golden regenerated at $golden — rerun without regen to verify")
    }
    assert(Files.exists(golden), s"missing golden fixture $golden")
    val want = Files.readAllLines(golden).asScala.toSeq
    assert(got.size === want.size)
    assert(got === want)
  }

  test("centroids are exact quantized per-label means, partition-invariant") {
    val df = Seq(
      (0L, Array(1.0f, -2.0f), 0),
      (1L, Array(3.0f, 4.0f), 0),
      (2L, Array(0.5f, 0.25f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Ivf.centroidsByLabel(df)
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (0, 0L, 2L, 4000000L, 2.0), // (1e6 + 3e6) / (2 · 1e6)
      (0, 1L, 2L, 2000000L, 1.0), // (-2e6 + 4e6) / (2 · 1e6)
      (1, 0L, 1L, 500000L, 0.5),
      (1, 1L, 1L, 250000L, 0.25)))
    // integer carrier ⇒ the aggregate is order/partitioning-independent
    val shuffled = Ivf.centroidsByLabel(df.repartition(7))
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(shuffled === out)
  }
}
