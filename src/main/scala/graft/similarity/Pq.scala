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

  // ---------------------------------------------------------------- s9 —
  // IVF + PQ on residuals (IVFADC — Jégou, Douze & Schmid TPAMI 2011 §III;
  // the FAISS `IVFx,PQ8` composite): the memory shape AND the scan shape
  // of corpus-scale vector search in one index. s8 compresses to 8 B/vector
  // but still ADC-scans the whole corpus per query; s3b/s3c restrict the
  // scan to nprobe cells but keep 256 B float vectors resident. s9 stores
  // 8 B codes + a cell id and scans only the probed cells' codes:
  //
  //   x ≈ ce(cell(x)) + decode(codes(x))            (residual quantization)
  //   q·x ≈ q·ce + Σ_j lut_q[j][codes_j(x)]         (ADC with a cell offset)
  //
  // One SHARED residual codebook across cells (the FAISS default): the
  // query LUT then depends only on q — m·ksub sub-dots once per query, NOT
  // once per (query, cell) — and the per-cell term is the scalar q·ce the
  // probe ranking already computed. Everything stays a pure function of
  // the data (md5 anchors for both the coarse quantizer and the residual
  // codebook sample), so the DuckDB oracle replays the entire pipeline and
  // the gate is rows+schema+hash like s3b/s8.
  //
  // Scale shape at 100 TB:
  //  - coarse anchors: nlist ≈ √n md5-smallest vectors (s3b) — broadcast;
  //  - assignment: the s3b one-pass max_by (n·nlist dots, O(n^1.5) flat —
  //    above the s3d cutover a production build would swap the s3c
  //    two-level assign in; the search side below is unchanged);
  //  - codes: the ONE corpus-sized frame — (b_id, cell, 8 B codes);
  //  - search: probes (queryN·nprobe rows, 3 scalar cols) and query LUTs
  //    (queryN × 16 KB) broadcast; the codes⋈probes hash join prunes
  //    unprobed cells in-stream, so the scan touches nprobe/nlist of the
  //    corpus and does m = 8 lookups + adds per survivor, no float
  //    multiply; only (a_id, b_id, adot) ever shuffles;
  //  - exact rerank on the k·rerank ADC survivors per query (the s8 tail).
  private[similarity] val s9K = 5
  private[similarity] val s9Rerank = 8

  /** The residual codebook: residuals (embedding − assigned anchor) of the
    * ksub corpus vectors with the smallest "pqresanchor|" md5 key, in rank
    * order, computed in double (exact: float→double widening, one IEEE
    * subtraction per element — the oracle's CAST(..) − CAST(..)). Bounded
    * collect: ≤ 256 × 64 doubles. The assignment argmax for the sample
    * replays the corpus rule exactly (highest dot, ties to the lower
    * cell), so sampled residuals ARE the corpus residuals of those ids. */
  def fitResidualCodebook(emb: DataFrame, anchors: DataFrame,
                          ksub: Int): Array[Double] = {
    val ck = graft.dedup.Dedup.md5Hash60(
      concat(lit("pqresanchor|"), col("vec_id").cast("string")))
    val chosen = emb.select(col("vec_id"), col("embedding"), ck.as("ck"))
      .orderBy(col("ck"), col("vec_id")).limit(ksub)
    chosen.crossJoin(broadcast(anchors))
      .select(col("vec_id"), col("ck"), col("embedding"), col("cell"),
        col("ce"), Knn.dotFold(col("embedding"), col("ce")).as("adot"))
      .withColumn("ark", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("adot").desc, col("cell").asc)))
      .filter(col("ark") === 1)
      .orderBy(col("ck"), col("vec_id"))
      .select("embedding", "ce").collect()
      .flatMap { r =>
        val x = r.getSeq[Float](0); val a = r.getSeq[Float](1)
        x.indices.map(i => x(i).toDouble - a(i).toDouble)
      }
  }

  /** IVFADC top-k: coarse-assign → residual-encode → probe nprobe cells →
    * ADC over probed codes (+ the q·ce cell offset) → exact rerank. */
  def ivfPqTopK(emb: DataFrame, nlist: Int, nprobe: Int, ksub: Int, k: Int,
                rerank: Int): DataFrame = {
    val ak = graft.dedup.Dedup.md5Hash60(
      concat(lit("ivfanchor|"), col("vec_id").cast("string")))
    // nlist ≈ √n rows, read by the fit, the assign, the code build and the
    // probe scorer — persisted so the corpus-wide TakeOrdered runs once
    val anchors = graft.util.Caches.scoped(emb
      .select(col("vec_id").as("cell"), col("embedding").as("ce"), ak.as("ak"))
      .orderBy(col("ak"), col("cell")).limit(nlist)
      .select("cell", "ce"))
    val cb = fitResidualCodebook(emb, anchors, ksub)
    // s3b's one-pass assignment argmax; the embedding rides the aggregate
    // (first() — constant per vec_id) so the encode needs no second corpus
    // join against the raw table
    val assign = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(anchors))
      .select(col("vec_id"), col("embedding"), col("cell"),
        Knn.dotFold(col("embedding"), col("ce")).as("adot"))
      .groupBy(col("vec_id").as("b_id"))
      .agg(max_by(col("cell"), struct(col("adot"), (-col("cell")).as("nc"))).as("cell"),
        first(col("embedding")).as("embedding"))
    // the index: the ONE corpus-sized frame of the scan — cell + 8 B codes
    val codes = assign.join(broadcast(anchors), "cell")
      .select(col("b_id"), col("cell"),
        pq_encode_res(col("embedding"), col("ce"), cb, m, dsub).as("codes"))
    val stratum = emb.join(broadcast(Knn.queryIds(emb)), "vec_id")
      .select(col("vec_id"), col("embedding"))
    // probe ranking keeps the anchor dot: it IS the ADC cell offset q·ce
    val probes = stratum.crossJoin(broadcast(anchors))
      .select(col("vec_id"), col("cell"),
        Knn.dotFold(col("embedding"), col("ce")).as("adot"))
      .withColumn("ark", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("adot").desc, col("cell").asc)))
      .filter(col("ark") <= nprobe)
      .select(col("vec_id").as("a_id"), col("cell"), col("adot").as("qcdot"))
    // one 16 KB LUT per query — cell-independent because the codebook is
    // shared, broadcast SEPARATELY from probes (a LUT per probe row would
    // multiply the broadcast by nprobe)
    val qlut = stratum.select(col("vec_id").as("a_id"),
      pq_lut(col("embedding"), cb, m, dsub).as("lut"))
    val approx = codes.join(broadcast(probes), "cell")
      .filter(col("a_id") =!= col("b_id"))
      .join(broadcast(qlut), "a_id")
      .select(col("a_id"), col("b_id"),
        (col("qcdot") + pq_adc(col("lut"), col("codes"), ksub)).as("adot"))
    val w1 = Window.partitionBy("a_id").orderBy(col("adot").desc, col("b_id").asc)
    val cand = approx.withColumn("qrk", row_number().over(w1))
      .filter(col("qrk") <= k * rerank)
      .select("a_id", "b_id", "adot")
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

  /** Driver query: IVFADC top-5, the s3b nlist/nprobe curve and the s8
    * codebook size. */
  def s9KnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables.embeddings(spark, dir)
    val n = graft.Tables.cachedCount(spark, dir, "embeddings")
    val nlist = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    val nprobe = math.max(2, nlist / 4)
    ivfPqTopK(emb, nlist, nprobe, ksubFor(n), s9K, s9Rerank)
      .orderBy("a_id", "rk")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("s8_knn_pq" -> (s8KnnPq _),
        "s9_knn_ivfpq" -> (s9KnnIvfPq _))

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
        |ORDER BY a_id, rk""".stripMargin,

    // s9: the full IVFADC replay — s3b's anchor/assignment CTEs, residuals
    // as per-element double subtraction, the s8 codebook/encode/LUT CTEs on
    // RESIDUALS, the probe's anchor dot re-used as the ADC cell offset,
    // exact rerank. Every fold ascending-index with zero/first-element
    // init, every argmax tie to the lower id — the engine's contract.
    "s9_knn_ivfpq" ->
      s"""WITH params AS (
        |  SELECT GREATEST(4, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) AS nlist,
        |         GREATEST(2, GREATEST(4, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) // 4) AS nprobe,
        |         LEAST(256, COUNT(*)) AS ksub
        |  FROM embeddings),
        |anchors AS (
        |  SELECT cell, ce FROM (
        |    SELECT vec_id AS cell, embedding AS ce,
        |      row_number() OVER (ORDER BY
        |        CAST('0x' || substr(md5('ivfanchor|' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
        |        vec_id) AS r
        |    FROM embeddings) t CROSS JOIN params
        |  WHERE r <= params.nlist),
        |adots AS (
        |  SELECT e.vec_id, a.cell,
        |    list_reduce(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(a.ce[i] AS DOUBLE)),
        |      (acc, x) -> acc + x) AS adot
        |  FROM embeddings e CROSS JOIN anchors a),
        |arked AS (
        |  SELECT vec_id, cell, adot,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY adot DESC, cell) AS ark
        |  FROM adots),
        |assign AS (SELECT vec_id AS b_id, cell FROM arked WHERE ark = 1),
        |res AS (
        |  SELECT s.b_id, s.cell,
        |    list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(e.embedding[i] AS DOUBLE) - CAST(a.ce[i] AS DOUBLE)) AS rv
        |  FROM assign s JOIN embeddings e ON e.vec_id = s.b_id
        |       JOIN anchors a USING (cell)),
        |cbanchors AS (
        |  SELECT cv, cbid FROM (
        |    SELECT r.rv AS cv,
        |      row_number() OVER (ORDER BY
        |        CAST('0x' || substr(md5('pqresanchor|' || CAST(r.b_id AS VARCHAR)), 1, 15) AS BIGINT),
        |        r.b_id) AS cbid
        |    FROM res r) t CROSS JOIN params
        |  WHERE cbid <= params.ksub),
        |js AS (SELECT unnest(range(0, $m)) AS j),
        |cb AS (
        |  SELECT a.cbid, js.j,
        |    a.cv[js.j*$dsub+1 : js.j*$dsub+$dsub] AS csub,
        |    0.5 * list_reduce(list_transform(a.cv[js.j*$dsub+1 : js.j*$dsub+$dsub],
        |      x -> x * x), (acc, x) -> acc + x) AS hcc
        |  FROM cbanchors a CROSS JOIN js),
        |enc AS (
        |  SELECT b_id, j, cbid AS code FROM (
        |    SELECT r.b_id, c.j, c.cbid,
        |      row_number() OVER (PARTITION BY r.b_id, c.j ORDER BY
        |        (list_reduce(list_transform(range(1, ${dsub + 1}),
        |           i -> r.rv[c.j*$dsub + i] * c.csub[i]),
        |           (acc, x) -> acc + x) - c.hcc) DESC, c.cbid) AS erk
        |    FROM res r CROSS JOIN cb c) t WHERE erk = 1),
        |${Knn.queryIdsSql},
        |probes AS (
        |  SELECT r.vec_id AS a_id, r.cell, r.adot AS qcdot
        |  FROM arked r CROSS JOIN params
        |  WHERE r.vec_id IN (SELECT vec_id FROM q_ids)
        |    AND r.ark <= params.nprobe),
        |lut AS (
        |  SELECT e.vec_id AS a_id, c.j, c.cbid,
        |    list_reduce(list_transform(range(1, ${dsub + 1}),
        |      i -> CAST(e.embedding[c.j*$dsub + i] AS DOUBLE) * c.csub[i]),
        |      (acc, x) -> acc + x) AS pdot
        |  FROM embeddings e CROSS JOIN cb c
        |  WHERE e.vec_id IN (SELECT vec_id FROM q_ids)),
        |adc AS (
        |  SELECT p.a_id, s.b_id,
        |    p.qcdot + list_reduce(list(l.pdot ORDER BY l.j), (acc, x) -> acc + x) AS adot
        |  FROM probes p
        |  JOIN assign s USING (cell)
        |  JOIN enc ON enc.b_id = s.b_id
        |  JOIN lut l ON l.a_id = p.a_id AND l.j = enc.j AND l.cbid = enc.code
        |  WHERE p.a_id <> s.b_id
        |  GROUP BY p.a_id, s.b_id, p.qcdot),
        |cand AS (
        |  SELECT a_id, b_id, adot,
        |    row_number() OVER (PARTITION BY a_id ORDER BY adot DESC, b_id) AS qrk
        |  FROM adc),
        |dots AS (
        |  SELECT cand.a_id, cand.b_id, cand.adot,
        |    ${Knn.dotSql} AS dot
        |  FROM cand JOIN embeddings a ON a.vec_id = cand.a_id
        |            JOIN embeddings b ON b.vec_id = cand.b_id
        |  WHERE cand.qrk <= ${s9K * s9Rerank}),
        |ranked AS (
        |  SELECT a_id, b_id, adot, dot,
        |    row_number() OVER (PARTITION BY a_id ORDER BY dot DESC, b_id) AS rk
        |  FROM dots)
        |SELECT a_id, rk, b_id, adot, dot FROM ranked WHERE rk <= $s9K
        |ORDER BY a_id, rk""".stripMargin
  )
}
