package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001)

  test("dotFold computes the exact sequential dot product") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = df.select(Knn.dotFold(col("a"), col("b"))).as[Double].collect().head
    assert(got === 32.0)
  }

  test("brute-force top-k ranks by true dot product, deterministic ties") {
    val topk = Knn.bruteForceTopK(emb, 5)
    val rows = topk.collect()
    val perQuery = rows.groupBy(_.getAs[Long]("a_id"))
    assert(perQuery.nonEmpty)
    perQuery.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val dots = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("dot"))
      assert(dots.zip(dots.drop(1)).forall { case (x, y) => x >= y }, "dot desc within query")
    }
    // cosine ≈ dot for unit-norm vectors
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("cosine") - r.getAs[Double]("dot")) < 1e-4)
    }
  }

  test("LSH top-k returns true dot products and beats random retrieval") {
    val lsh = Knn.lshTopK(emb, 5).collect()
    assert(lsh.nonEmpty, "LSH should produce candidates at this corpus size")
    // spot-check: reported dots match brute-force dot for the same pairs
    val exactDots = Knn.bruteForceTopK(emb, emb.count().toInt).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("dot")).toMap
    lsh.take(50).foreach { r =>
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      exactDots.get(key).foreach(d => assert(math.abs(d - r.getAs[Double]("dot")) < 1e-12))
    }
    // same-bucket candidates should average higher similarity than corpus mean
    val lshMean = lsh.map(_.getAs[Double]("dot")).sum / lsh.length
    val corpusMean = exactDots.values.sum / exactDots.size
    assert(lshMean > corpusMean, s"lsh mean $lshMean vs corpus mean $corpusMean")
  }

  test("cosine near-dup pairs are a subset of exact pairs with correct values") {
    val lshPairs = Knn.cosineNearDupPairs(emb, 0.3).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("cosine")).toMap
    // exact all-pairs at this tiny scale
    val e = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exactPairs = (for {
      (ia, va) <- e; (ib, vb) <- e if ia < ib
      c = cos(va, vb) if c >= 0.3
    } yield (ia, ib) -> c).toMap
    assert(lshPairs.keySet.subsetOf(exactPairs.keySet),
      s"LSH produced a non-true pair: ${lshPairs.keySet -- exactPairs.keySet}")
    lshPairs.foreach { case (k, v) => assert(math.abs(v - exactPairs(k)) < 1e-9) }
  }

  test("srp codes are within [0, 2^bits) per table") {
    val codes = Knn.srpCodes(emb).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val c = r.getAs[Long]("code")
      assert(c >= 0 && c < (1L << Knn.lshBits))
      assert(r.getAs[Int]("t") >= 0 && r.getAs[Int]("t") < Knn.lshTables)
    }
  }

  test("srp codes are identical under any partitioning (ordered folds)") {
    def codesAt(parts: Int): Seq[(Long, Int, Long)] =
      Knn.srpCodes(emb.repartition(parts), 12)
        .select("id", "t", "code").as[(Long, Int, Long)]
        .collect().sorted.toSeq
    assert(codesAt(1) === codesAt(64))
  }

  test("codeBits grows with the corpus") {
    // the oracle SQL tracks this via length(bin(n-1)) — same exact integer
    // ceil-log2, so these are the widths BOTH engines pick at each size
    assert(Knn.codeBits(500) === 9)
    assert(Knn.codeBits(50) === Knn.lshBits)
    assert(Knn.codeBits(5000) === 13)
    assert(Knn.codeBits(100000000000L) === 24)
  }

  test("cosineExactPairs matches a driver-side exact computation") {
    val got = Knn.cosineExactPairs(emb, 0.3).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("cosine")).toMap
    val e = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // same fixed-count stratum the engine picks (md5-ranked top queryN)
    val qset = Knn.queryIds(emb).as[Long].collect().toSet
    val want = (for {
      (ia, va) <- e if qset.contains(ia)
      (ib, vb) <- e if ib != ia
      c = cos(va, vb) if c >= 0.3
    } yield (ia, ib) -> c).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9) }
  }

  test("multiprobe recovers at least single-probe recall (width escape hatch)") {
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("a_id", "b_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val single = recall(Knn.lshTopK(emb, 5, 12))
    val multi = recall(Knn.lshTopKMultiprobe(emb, 5, 12))
    assert(multi >= single, s"multi=$multi single=$single")
    assert(multi > 0.0)
    // probing Hamming-1 neighbors must strictly widen the candidate pool
    // at a width where single-probe buckets are sparse (12 bits, 500 vecs)
    assert(Knn.lshTopKMultiprobe(emb, 5, 12).count() >=
      Knn.lshTopK(emb, 5, 12).count())
  }

  test("knn graph covers (nearly) the whole corpus with true dots, k rows max") {
    val g = Knn.knnGraph(emb, 5, Knn.codeBits(emb.count())).collect()
    val n = emb.count()
    // every vector with any multiprobe collision appears as a source; at
    // 500 vectors / 9-bit codes / 4 tables / 10 probes the expected probe
    // fan-in is ~40 candidates per vector, so coverage must be near-total
    val sources = g.map(_.getAs[Long]("a_id")).distinct.length
    assert(sources >= (n * 0.9).toInt, s"graph covers only $sources of $n")
    // per-source at most k rows, ranks contiguous from 1
    g.groupBy(_.getAs[Long]("a_id")).foreach { case (_, rows) =>
      val rks = rows.map(_.getAs[Int]("rk")).sorted
      assert(rks.length <= 5 && rks === (1 to rks.length).toArray)
    }
    // the graph's edges carry TRUE dot products: spot-check against the
    // full brute-force table restricted to the stratum
    val truth = Knn.bruteForceTopK(emb, emb.count().toInt).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("dot")).toMap
    g.foreach { r =>
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      truth.get(key).foreach(d => assert(math.abs(d - r.getAs[Double]("dot")) < 1e-12))
    }
    // recall floor on the stratum slice (where exact truth is computed):
    // the graph's stratum rows must recover a meaningful share of true top-5
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val strat = exact.map(_._1)
    val got = g.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .filter(p => strat.contains(p._1)).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.2, s"graph stratum recall=$recall")
  }

  test("quantized kNN: int8 stage-1 + exact rerank recovers the exact top-k") {
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val quant = Knn.quantizedTopK(emb, 5)
    val got = quant.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    // int8 on unit-norm 64-dim vectors with 4× rerank headroom is
    // near-lossless; anything under 0.9 means the quantizer is broken
    assert(recall >= 0.9, s"quantized recall=$recall")
    // reranked dots are the TRUE dots (full precision, not dequantized)
    val exactDots = Knn.bruteForceTopK(emb, emb.count().toInt).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("dot")).toMap
    quant.collect().foreach { r =>
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      exactDots.get(key).foreach(d => assert(math.abs(d - r.getAs[Double]("dot")) < 1e-12))
      // and the quantized score is within the analytic error envelope:
      // |127²·dot − qdot| ≤ Σᵢ(127|aᵢ| + 127|bᵢ| + 1) < 2·127·√64 + 64
      val qd = r.getAs[Long]("qdot").toDouble
      val d = r.getAs[Double]("dot")
      assert(math.abs(d * 127 * 127 - qd) < 2 * 127 * 8 + 64,
        s"qdot $qd too far from scaled dot ${d * 127 * 127}")
    }
  }

  test("reduced-space kNN: JL coarse stage + exact rerank, true dots out") {
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val red = Knn.reducedTopK(emb, 5)
    val got = red.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    // 24-of-64 random projections at rerank 8: JL keeps the coarse ranking
    // informative but not exact on this worst-case corpus (unit gaussians —
    // every neighbor dot is close) — assert it beats random retrieval by a
    // wide margin (random top-40-of-499 would land ~8% of the true top-5)
    assert(recall >= 0.3, s"reduced recall=$recall")
    // reranked dots are TRUE dots, and reduced vectors are deterministic
    val truth = Knn.bruteForceTopK(emb, emb.count().toInt).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("dot")).toMap
    red.collect().foreach { r =>
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      truth.get(key).foreach(d => assert(math.abs(d - r.getAs[Double]("dot")) < 1e-12))
    }
    def reds(parts: Int) = Knn.reduceVectors(emb.repartition(parts))
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(reds(1) === reds(32))
  }

  test("quantization is partition-invariant and floor-exact") {
    def q(parts: Int) = emb.repartition(parts)
      .select(col("vec_id"), Knn.quantize(col("embedding")).as("q"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val a = q(1)
    assert(a === q(32))
    // every component within int8 range for unit-norm inputs
    assert(a.forall(_._2.forall(v => v >= -128 && v <= 127)))
  }

  test("10× corpus with wider codes: planted-dup recall holds, candidates shrink") {
    // deterministic synthetic corpus: 5000 gaussian vectors, the last 50 of
    // which are small perturbations of vectors 0..49 (cosine ≈ 0.999)
    val rnd = new scala.util.Random(42)
    val base = Array.fill(5000, 64)(rnd.nextGaussian())
    for (i <- 0 until 50; d <- 0 until 64)
      base(4950 + i)(d) = base(i)(d) + 0.03 * rnd.nextGaussian()
    val synth = base.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toSeq.toDF("vec_id", "embedding")
    val bits = Knn.codeBits(5000)
    assert(bits > Knn.lshBits, "10× corpus must widen the codes")

    def candidates(b: Int): Long = {
      val codes = Knn.srpCodes(synth, b).cache()
      val n = codes.toDF("a", "t", "c")
        .join(codes.toDF("b", "t", "c"), Seq("t", "c"))
        .filter(col("a") < col("b")).select("a", "b").distinct().count()
      codes.unpersist(blocking = false)
      n
    }
    // wider codes are the scale fix: bucket collisions collapse
    val wide = candidates(bits)
    val narrow = candidates(Knn.lshBits)
    assert(wide * 5 < narrow, s"wide=$wide narrow=$narrow")

    val found = Knn.cosineNearDupPairs(synth, 0.9, bits)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val planted = (0 until 50).map(i => (i.toLong, (4950 + i).toLong)).toSet
    val recall = (found & planted).size.toDouble / planted.size
    assert(recall >= 0.9, s"recall=$recall with $bits-bit codes")
  }
}
