package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PqFunctions._

/** Product-quantization ANN (s8) — the memory tier below scalar int8
  * (`Knn.quantizedTopK`): m = 8 sub-codes of 1 byte each = 8 B/vector vs
  * s4's 64 B and the raw 256 B, the compression shape that lets a
  * corpus-scale candidate index live in executor memory (Jégou, Douze &
  * Schmid, TPAMI 2011; the FAISS `IVF,PQ8` default).
  *
  * Deterministic sampled codebooks, the s3b anchor discipline: subspace
  * codebooks are the sub-vectors of the [[ksubFor]] corpus vectors with the
  * smallest md5 key ("pqanchor|" family) — a pure function of the data, so
  * the DuckDB oracle recomputes the ENTIRE pipeline (anchor choice, per-
  * subspace encode argmax, LUT, ADC fold, rerank) and the driver gate is
  * rows+schema+hash like every other s-tier. Sampled codebooks trade some
  * quantization quality vs k-means-fitted ones (the classic random-sample
  * init); the exact rerank restores ranking quality on the survivors, and
  * PqSpec pins the recall floor vs `s1_knn_exact`.
  *
  * Scale shape at 100 TB:
  *  - codebook fit is a corpus TakeOrdered of ksub ≤ 256 rows — bounded
  *    driver state (≤ 128 KB of doubles), the s3 fitted-centroid shape;
  *  - encode is ONE corpus map pass (ksub·d multiplies/row, fixed — O(n)
  *    total, unlike IVF-flat's O(n·√n) assignment), emitting the 8-byte
  *    code array: the only corpus-sized frame the scan ever touches;
  *  - each query computes its LUT once (m·ksub sub-dots = 16 KB) and the
  *    ADC scan resolves every corpus code by m = 8 array lookups — no
  *    float multiply on the corpus side at all; the query-LUT frame is
  *    bounded (queryN × 16 KB ≈ 1.6 MB) and broadcasts by design;
  *  - the only corpus-sized exchange carries (a_id, b_id, adot) — codes
  *    and scores, never raw vectors (PlanSpec-pinned);
  *  - exact rerank touches |queries|·k·rerank full vectors through plain
  *    equi-joins, the s4/s6 tail. */
object Pq {

  /** m sub-quantizers × dsub dims each = the full [[Knn.maxDims]]. */
  val m = 8
  val dsub: Int = Knn.maxDims / m

  /** 1-byte codes: up to 256 codebook rows; capped by the corpus (the gate
    * corpus at sf0.01 is 500 vectors — 256 anchors of 500 still exercises
    * the real regime; tiny spec corpora cap lower). */
  def ksubFor(n: Long): Int = math.min(256L, n).toInt

  private[similarity] val s8K = 5
  private[similarity] val s8Rerank = 8

  /** The flattened codebook: the ksub md5-smallest corpus vectors in rank
    * order, widened to double (exact). Bounded collect — ≤ 256 × 64
    * doubles, the same driver-state budget as s3's fitted centroids. */
  def fitCodebook(emb: DataFrame, ksub: Int): Array[Double] = {
    val ak = graft.dedup.Dedup.md5Hash60(
      concat(lit("pqanchor|"), col("vec_id").cast("string")))
    emb.select(col("embedding"), ak.as("ak"), col("vec_id"))
      .orderBy(col("ak"), col("vec_id")).limit(ksub)
      .select("embedding").collect()
      .flatMap(_.getSeq[Float](0).map(_.toDouble))
  }

  /** PQ top-k: encode → ADC scan over the broadcast query LUTs → exact
    * rerank of the top k·rerank ADC survivors per query. */
  def pqTopK(emb: DataFrame, cbFlat: Array[Double], k: Int,
             rerank: Int): DataFrame = {
    val ksub = cbFlat.length / (m * dsub)
    val codes = emb.select(col("vec_id").as("b_id"),
      pq_encode(col("embedding"), cbFlat, m, dsub).as("codes"))
    // queryN LUT rows of m·ksub doubles — bounded at any corpus size, the
    // one legitimately-broadcast frame of the scan (the non-equi pairing
    // needs a resident side, same as bruteForceTopK's query stratum)
    val qlut = emb.join(broadcast(Knn.queryIds(emb)), "vec_id")
      .select(col("vec_id").as("a_id"),
        pq_lut(col("embedding"), cbFlat, m, dsub).as("lut"))
    val approx = codes.join(broadcast(qlut), col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        pq_adc(col("lut"), col("codes"), ksub).as("adot"))
    val w1 = Window.partitionBy("a_id").orderBy(col("adot").desc, col("b_id").asc)
    val cand = approx.withColumn("qrk", row_number().over(w1))
      .filter(col("qrk") <= k * rerank)
      .select("a_id", "b_id", "adot")
    // exact rerank — candidate frames only (|queries|·k·rerank rows), the
    // corpus joins are plain equi-joins AQE broadcasts the small side of
    val q = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val c = emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    val w2 = Window.partitionBy("a_id").orderBy(col("dot").desc, col("b_id").asc)
    cand.join(c, "b_id").join(q, "a_id")
      .select(col("a_id"), col("b_id"), col("adot"),
        Knn.dotFold(col("ea"), col("eb")).as("dot"))
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
      .select("a_id", "rk", "b_id", "adot", "dot")
  }

  def s8KnnPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables.embeddings(spark, dir)
    val n = graft.Tables.cachedCount(spark, dir, "embeddings")
    val cb = fitCodebook(emb, ksubFor(n))
    pqTopK(emb, cb, s8K, s8Rerank).orderBy("a_id", "rk")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("s8_knn_pq" -> (s8KnnPq _))

  /** The DuckDB twin recomputes the whole pipeline from the parquet —
    * anchor ranking, per-subspace slices, encode argmax (dot − ½‖c‖², ties
    * to the lower row), ascending-j ADC fold, exact rerank — with every
    * fold in the engine's evaluation order (ascending index, zero/first-
    * element init: 0.0 + x ≡ x bit-exactly). */
  def oracle: Map[String, String] = Map(
    "s8_knn_pq" ->
      s"""WITH params AS (SELECT LEAST(256, COUNT(*)) AS ksub FROM embeddings),
        |anchors AS (
        |  SELECT ce, cbid FROM (
        |    SELECT embedding AS ce,
        |      row_number() OVER (ORDER BY
        |        CAST('0x' || substr(md5('pqanchor|' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
        |        vec_id) AS cbid
        |    FROM embeddings) t CROSS JOIN params
        |  WHERE cbid <= params.ksub),
        |js AS (SELECT unnest(range(0, $m)) AS j),
        |cb AS (
        |  SELECT a.cbid, js.j,
        |    list_transform(a.ce[js.j*$dsub+1 : js.j*$dsub+$dsub],
        |      x -> CAST(x AS DOUBLE)) AS csub,
        |    0.5 * list_reduce(list_transform(a.ce[js.j*$dsub+1 : js.j*$dsub+$dsub],
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |      (acc, x) -> acc + x) AS hcc
        |  FROM anchors a CROSS JOIN js),
        |enc AS (
        |  SELECT vec_id AS b_id, j, cbid AS code FROM (
        |    SELECT e.vec_id, c.j, c.cbid,
        |      row_number() OVER (PARTITION BY e.vec_id, c.j ORDER BY
        |        (list_reduce(list_transform(range(1, ${dsub + 1}),
        |           i -> CAST(e.embedding[c.j*$dsub + i] AS DOUBLE) * c.csub[i]),
        |           (acc, x) -> acc + x) - c.hcc) DESC, c.cbid) AS erk
        |    FROM embeddings e CROSS JOIN cb c) t WHERE erk = 1),
        |${Knn.queryIdsSql},
        |lut AS (
        |  SELECT e.vec_id AS a_id, c.j, c.cbid,
        |    list_reduce(list_transform(range(1, ${dsub + 1}),
        |      i -> CAST(e.embedding[c.j*$dsub + i] AS DOUBLE) * c.csub[i]),
        |      (acc, x) -> acc + x) AS pdot
        |  FROM embeddings e CROSS JOIN cb c
        |  WHERE e.vec_id IN (SELECT vec_id FROM q_ids)),
        |adc AS (
        |  SELECT l.a_id, enc.b_id,
        |    list_reduce(list(l.pdot ORDER BY l.j), (acc, x) -> acc + x) AS adot
        |  FROM enc JOIN lut l ON l.j = enc.j AND l.cbid = enc.code
        |  WHERE l.a_id <> enc.b_id
        |  GROUP BY l.a_id, enc.b_id),
        |cand AS (
        |  SELECT a_id, b_id, adot,
        |    row_number() OVER (PARTITION BY a_id ORDER BY adot DESC, b_id) AS qrk
        |  FROM adc),
        |dots AS (
        |  SELECT cand.a_id, cand.b_id, cand.adot,
        |    ${Knn.dotSql} AS dot
        |  FROM cand JOIN embeddings a ON a.vec_id = cand.a_id
        |            JOIN embeddings b ON b.vec_id = cand.b_id
        |  WHERE cand.qrk <= ${s8K * s8Rerank}),
        |ranked AS (
        |  SELECT a_id, b_id, adot, dot,
        |    row_number() OVER (PARTITION BY a_id ORDER BY dot DESC, b_id) AS rk
        |  FROM dots)
        |SELECT a_id, rk, b_id, adot, dot FROM ranked WHERE rk <= $s8K
        |ORDER BY a_id, rk""".stripMargin
  )
}
