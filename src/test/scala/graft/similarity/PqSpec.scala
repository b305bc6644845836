package graft.similarity

import graft.{SparkSpec, Tables}
import graft.functions.PqFunctions._
import org.apache.spark.sql.functions._

/** s8 product-quantization tier: ADC indexing consistency, exhaustive-
  * rerank equivalence, recall floor vs exact, determinism, and the
  * codes-only-shuffle scale pin. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sf0001)
  lazy val n = emb.count()
  lazy val ksub = Pq.ksubFor(n)
  lazy val cb = Pq.fitCodebook(emb, ksub)

  test("codebook fit is deterministic and bounded") {
    assert(cb.length === ksub * Knn.maxDims)
    val again = Pq.fitCodebook(emb, ksub)
    assert(cb.toSeq === again.toSeq)
  }

  test("codes are m entries in [1, ksub] and encode each sub-vector to its nearest codebook row") {
    val rows = emb.select(col("vec_id"), col("embedding"),
        pq_encode(col("embedding"), cb, Pq.m, Pq.dsub).as("codes"))
      .as[(Long, Array[Float], Array[Int])].collect()
    assert(rows.nonEmpty)
    val d = Pq.m * Pq.dsub
    rows.foreach { case (_, e, codes) =>
      assert(codes.length === Pq.m)
      assert(codes.forall(c => c >= 1 && c <= ksub))
      // independent argmin check: the chosen row minimizes euclidean
      // distance of the sub-vector (equivalently maximizes dot − ½‖c‖²)
      for (j <- 0 until Pq.m) {
        def score(c: Int): Double = {
          var acc = 0.0
          for (i <- 0 until Pq.dsub)
            acc += e(j * Pq.dsub + i).toDouble * cb((c - 1) * d + j * Pq.dsub + i)
          var h = 0.0
          for (i <- 0 until Pq.dsub) {
            val v = cb((c - 1) * d + j * Pq.dsub + i); h += v * v
          }
          acc - 0.5 * h
        }
        val best = (1 to ksub).maxBy(c => (score(c), -c))
        assert(codes(j) === best, s"subspace $j")
      }
    }
  }

  test("ADC score equals the dot of the query against the DECODED vector") {
    // the defining PQ identity: adot(q, x) = dot(q, concat_j cb[code_j])
    val q = emb.orderBy("vec_id").limit(3)
      .select(col("vec_id"), col("embedding"),
        pq_lut(col("embedding"), cb, Pq.m, Pq.dsub).as("lut"))
      .as[(Long, Array[Float], Array[Double])].collect()
    val codes = emb.select(col("vec_id"),
        pq_encode(col("embedding"), cb, Pq.m, Pq.dsub).as("codes"))
      .as[(Long, Array[Int])].collect().toMap
    val d = Pq.m * Pq.dsub
    q.foreach { case (_, qe, lut) =>
      assert(lut.length === Pq.m * ksub)
      codes.take(20).foreach { case (_, cs) =>
        var viaLut = 0.0
        for (j <- 0 until Pq.m) viaLut += lut(j * ksub + cs(j) - 1)
        var viaDecode = 0.0
        for (j <- 0 until Pq.m; i <- 0 until Pq.dsub)
          viaDecode += qe(j * Pq.dsub + i).toDouble *
            cb((cs(j) - 1) * d + j * Pq.dsub + i)
        assert(math.abs(viaLut - viaDecode) < 1e-12)
      }
    }
  }

  test("exhaustive rerank (k·rerank ≥ n) reproduces exact brute-force top-k") {
    // when every ADC candidate survives to the exact rerank, PQ may only
    // REORDER stage 1 — the final ranking must equal brute force
    val full = Pq.pqTopK(emb, cb, k = 5, rerank = n.toInt)
      .select("a_id", "rk", "b_id").as[(Long, Int, Long)].collect().toSet
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "rk", "b_id").as[(Long, Int, Long)].collect().toSet
    assert(full === exact)
  }

  test("pruned PQ scan keeps a recall floor and exact reranked dots") {
    val exact = Knn.bruteForceTopK(emb, 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val approx = Pq.pqTopK(emb, cb, Pq.s8K, Pq.s8Rerank)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // Floor raised 0.5 → 0.95 with the round-14 Lloyd codebook refinement:
    // measured on this corpus (Profile pqrecall, n=500), recall moved
    // 0.894 (sampled-init, iters=0) → 0.974 (iters=2); at sf0.1 (n=2000,
    // real 2000/256 compression) 0.660 → 0.800. The pipeline is fully
    // deterministic, so the floor guards against quality REGRESSIONS, not
    // run-to-run noise.
    assert(approx.nonEmpty && recall >= 0.95, s"recall=$recall")
    // every reported dot is a true dot product (the rerank is exact)
    val truth = Knn.bruteForceTopK(emb, n.toInt).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("dot")).toMap
    Pq.pqTopK(emb, cb, Pq.s8K, Pq.s8Rerank).collect().foreach { r =>
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      truth.get(key).foreach(d => assert(math.abs(d - r.getAs[Double]("dot")) < 1e-12))
    }
  }

  test("pq expressions stay in whole-stage codegen") {
    val plan = emb.select(pq_encode(col("embedding"), cb, Pq.m, Pq.dsub).as("c"),
        pq_lut(col("embedding"), cb, Pq.m, Pq.dsub).as("l"))
      .select(pq_adc(col("l"), col("c"), ksub).as("a"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"pq exprs fell out of codegen:\n$plan")
  }

  test("ADC scan shuffles only codes and scores — never raw vectors or LUTs") {
    // the 100 TB claim of the tier: the corpus-sized exchanges of stage 1
    // carry 8-byte codes / skinny score rows; embeddings move only inside
    // the bounded rerank joins
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.expressions.Window
    val codes = emb.select(col("vec_id").as("b_id"),
      pq_encode(col("embedding"), cb, Pq.m, Pq.dsub).as("codes"))
    val qlut = emb.join(broadcast(Knn.queryIds(emb)), "vec_id")
      .select(col("vec_id").as("a_id"),
        pq_lut(col("embedding"), cb, Pq.m, Pq.dsub).as("lut"))
    val approx = codes.join(broadcast(qlut), col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        pq_adc(col("lut"), col("codes"), ksub).as("adot"))
    val w1 = Window.partitionBy("a_id").orderBy(col("adot").desc, col("b_id").asc)
    val cand = approx.withColumn("qrk", row_number().over(w1))
      .filter(col("qrk") <= 40).select("a_id", "b_id", "adot")
    cand.collect()
    // AQE wraps the final plan in AdaptiveSparkPlanExec / query stages —
    // recurse through them or collect() sees no exchanges at all
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allShuffles(p: SparkPlan): Seq[Seq[String]] = {
      val self = p match {
        case s: ShuffleExchangeExec => Seq(s.output.map(_.name))
        case _ => Seq.empty
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self ++ kids.flatMap(allShuffles)
    }
    val shuffles = allShuffles(cand.queryExecution.executedPlan)
    assert(shuffles.nonEmpty)
    shuffles.foreach { cols =>
      assert(!cols.exists(c => c.contains("embedding") || c.contains("lut")),
        s"stage-1 shuffle carries wide columns: $cols")
    }
  }

  test("s8 driver query is deterministic across invocations") {
    val a = Pq.s8KnnPq(spark, sf0001)
      .as[(Long, Int, Long, Double, Double)].collect().toSeq
    val b = Pq.s8KnnPq(spark, sf0001)
      .as[(Long, Int, Long, Double, Double)].collect().toSeq
    assert(a === b && a.nonEmpty)
  }
}
