package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.Knn

/** Semantic deduplication over document embeddings — the SemDeDup recipe
  * (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus into cells,
  * compare embeddings only WITHIN a cell, and drop the lower-quality side of
  * every pair above a cosine threshold. The cell stage is what makes the op
  * scale: candidate volume is Σ|cell|² instead of n², exactly the same
  * cost-bounding role LSH bands play for d3/d5.
  *
  * Engine shape:
  *  - cells come from the deterministic-anchor quantizer s3b already proves
  *    out (nlist ≈ √n corpus vectors with smallest salted md5 key; anchors
  *    broadcast — a few MB at 10⁹ vectors), so the WHOLE pipeline is a pure
  *    function of the data and DuckDB-oracle-gated, unlike k-means-seeded
  *    SemDeDup whose centroids are library-internal.
  *  - assignment is one corpus pass against the broadcast anchors (argmax
  *    dot, ties to the smaller cell id — same rule as s3b).
  *  - the within-cell self-join carries (id, cell, embedding, norm, quality)
  *    once through ONE shuffle on cell; quality = n_chars joined from
  *    `documents` (vec_id keys the same corpus as doc_id).
  *  - drop rule is per-pair and order-free: the winner has higher n_chars,
  *    ties to the smaller id; a document is dropped if ANY partner beats it
  *    (conservative ε-ball pruning — chains drop every non-maximal member).
  *    The audit row reports the strongest beating partner.
  *
  * At 100 TB the `maxCell` knob bounds the self-join: cells past the cap
  * are re-split by md5 rank so a degenerate quantizer can never recreate
  * the n² join (candidate volume ≤ Σ min(|cell|, cap)² by construction).
  * Pairs crossing a sub-cell boundary are pruned — the standard SemDeDup
  * recall/cost trade; SemDedupSpec pins drops(capped) ⊆ drops(uncapped)
  * and the hard size bound. Default off (`Int.MaxValue`): the plan gains
  * no window and the d9 oracle is untouched. */
object SemDedup {

  /** Re-split any cell past `maxCell` into deterministic md5-ranked
    * sub-cells of ≤ maxCell members. The sub-cell is a SEPARATE `sub`
    * column joined alongside `cell` — never arithmetically packed into the
    * cell id, so arbitrary Long cell ids (vec_ids can exceed 2³¹ at the
    * 100 TB design point) can never collide two cells into one bucket.
    * One window over the n-row assignment frame, partitioned on cell —
    * a single vertex-sized shuffle, only when the cap is enabled. */
  private[dedup] def capCells(assign: DataFrame, maxCell: Int): DataFrame =
    if (maxCell == Int.MaxValue) assign.withColumn("sub", lit(0L))
    else assign
      .withColumn("crk", row_number().over(
        Window.partitionBy("cell").orderBy(
          Dedup.md5Hash60(concat(lit("semcap|"), col("vec_id").cast("string"))),
          col("vec_id"))))
      .select(col("vec_id"), col("cell"),
        expr(s"CAST((crk - 1) div $maxCell AS BIGINT)").as("sub"))

  /** Dropped-document audit: one row per semantically-duplicated document,
    * with its strongest beating partner. */
  def semDedupDrops(emb: DataFrame, docs: DataFrame, nlist: Int,
                    tau: Double, maxCell: Int = Int.MaxValue): DataFrame = {
    val ak = Dedup.md5Hash60(concat(lit("semdedup|"), col("vec_id").cast("string")))
    val anchors = emb
      .select(col("vec_id").as("cell"), col("embedding").as("ce"), ak.as("ak"))
      .orderBy(col("ak"), col("cell")).limit(nlist)
      .select("cell", "ce")
    // one corpus pass; plain dot, not cosine — the per-row argmax only needs
    // a consistent score, and s3b's oracle-shared convention is raw dot.
    // Argmax as a map-side-complete max_by aggregate (anchors are broadcast,
    // so all of a vector's anchor scores sit in one input partition): the
    // only shuffle is n 2-column rows — the old window formulation shuffled
    // and sorted the whole n·nlist scored frame. The (s, -cell) struct key
    // replays the window's tie-break (highest dot, then lowest cell).
    val assign = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(anchors))
      .select(col("vec_id"), col("cell"),
        Knn.dotFold(col("embedding"), col("ce")).as("s"))
      .groupBy("vec_id")
      .agg(max_by(col("cell"), struct(col("s"), (-col("cell")).as("nc"))).as("cell"))
    val norms = emb.select(col("vec_id"),
      sqrt(Knn.dotFold(col("embedding"), col("embedding"))).as("nrm"))
    // members is corpus-sized and feeds both sides of the cell self-join —
    // persist once; every join here is a shuffle equi-join (no hints:
    // embedding/norm/quality frames are all corpus-sized)
    val members = graft.util.Caches.scoped(capCells(assign, maxCell)
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .join(norms, "vec_id")
      .join(docs.select(col("doc_id").as("vec_id"), col("n_chars").as("q")),
        "vec_id")
      .select(col("vec_id").as("id"), col("cell"), col("sub"),
        col("embedding"), col("nrm"), col("q")))
    val pairs = members.toDF("ia", "cell", "sub", "ea", "na", "qa")
      .join(members.toDF("ib", "cell", "sub", "eb", "nb", "qb"),
        Seq("cell", "sub"))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("qa"), col("ib"), col("qb"), col("cell"),
        (Knn.dotFold(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= tau)
    // ia < ib throughout, so the tie branch always keeps the smaller id
    val aWins = col("qa") > col("qb") || (col("qa") === col("qb"))
    pairs.select(
        when(aWins, col("ib")).otherwise(col("ia")).as("dropped"),
        when(aWins, col("ia")).otherwise(col("ib")).as("kept"),
        col("cell"), col("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("dropped").orderBy(col("cos").desc, col("kept").asc)))
      .filter(col("rk") === 1)
      .select(col("dropped").as("doc_id"), col("kept").as("kept_id"),
        col("cell"), col("cos"))
  }

  def d9SemDedup(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.cachedCount(spark, dir, "embeddings")
    val nlist = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    semDedupDrops(Tables.embeddings(spark, dir), Tables.documents(spark, dir),
      nlist, tau = 0.3).orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d9_semdedup" -> (d9SemDedup _)
  )

  private val dotSql = Knn.dotSql

  def oracle: Map[String, String] = Map(
    "d9_semdedup" ->
      s"""WITH params AS (
        |  SELECT GREATEST(4, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) AS nlist
        |  FROM embeddings),
        |anchors AS (
        |  SELECT cell, ce FROM (
        |    SELECT vec_id AS cell, embedding AS ce,
        |      row_number() OVER (ORDER BY
        |        CAST('0x' || substr(md5('semdedup|' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
        |        vec_id) AS r
        |    FROM embeddings) t CROSS JOIN params
        |  WHERE r <= params.nlist),
        |scored AS (
        |  SELECT e.vec_id, a.cell,
        |    list_reduce(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(a.ce[i] AS DOUBLE)),
        |      (acc, x) -> acc + x) AS s
        |  FROM embeddings e CROSS JOIN anchors a),
        |assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rk
        |    FROM scored) t WHERE rk = 1),
        |norms AS (
        |  SELECT vec_id AS id,
        |    sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
        |      (acc, x) -> acc + x)) AS nrm
        |  FROM embeddings),
        |members AS (
        |  SELECT g.vec_id AS id, g.cell, e.embedding, n.nrm, d.n_chars AS q
        |  FROM assign g JOIN embeddings e ON e.vec_id = g.vec_id
        |       JOIN norms n ON n.id = g.vec_id
        |       JOIN documents d ON d.doc_id = g.vec_id),
        |pairs AS (
        |  SELECT a.id AS ia, a.q AS qa, b.id AS ib, b.q AS qb, a.cell,
        |    $dotSql / (a.nrm * b.nrm) AS cos
        |  FROM members a JOIN members b ON a.cell = b.cell AND a.id < b.id),
        |beat AS (
        |  SELECT CASE WHEN qa > qb OR qa = qb THEN ib ELSE ia END AS dropped,
        |         CASE WHEN qa > qb OR qa = qb THEN ia ELSE ib END AS kept,
        |         cell, cos
        |  FROM pairs WHERE cos >= 0.3),
        |ranked AS (
        |  SELECT dropped, kept, cell, cos,
        |    row_number() OVER (PARTITION BY dropped ORDER BY cos DESC, kept ASC) AS rk
        |  FROM beat)
        |SELECT dropped AS doc_id, kept AS kept_id, cell, cos
        |FROM ranked WHERE rk = 1 ORDER BY doc_id""".stripMargin
  )
}
