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
    dropsFromAssign(capCells(assign, maxCell), emb, docs, tau)
  }

  /** The scale-invariant back half shared by d9 and d9b: join quality and
    * norms onto an assignment frame (vec_id, cell, sub), self-join within
    * (cell, sub), apply the cosine threshold and the quality drop rule. */
  private def dropsFromAssign(assign: DataFrame, emb: DataFrame,
                              docs: DataFrame, tau: Double): DataFrame = {
    val norms = emb.select(col("vec_id"),
      sqrt(Knn.dotFold(col("embedding"), col("embedding"))).as("nrm"))
    // members is corpus-sized and feeds both sides of the cell self-join —
    // persist once; every join here is a shuffle equi-join (no hints:
    // embedding/norm/quality frames are all corpus-sized)
    val members = graft.util.Caches.scoped(assign
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

  /** d9b: constant-size cells + two-level assignment — the 100 TB shape of
    * d9, attacking both of its super-linear terms at once (measured 13.1×
    * at 10× data on the sf10 curve):
    *
    *  - **cells**: d9's nlist ≈ √n gives √n-member cells, so the within-cell
    *    pair volume is Σ|cell|² ≈ n^1.5. Here nlist = max(16, n/256) targets
    *    a CONSTANT expected cell size (256), so pair volume is ~256·n —
    *    linear, the regime a 100 TB corpus actually needs.
    *  - **anchors**: chosen by hash THRESHOLD (ak < ⌊2⁶⁰/n·nlist⌋), not by
    *    rank — no corpus-wide sort, no driver TakeOrdered, no
    *    single-partition window anywhere in the build; the anchor count is
    *    binomial around nlist (a quantizer doesn't need it exact) and the
    *    rule is one map-side filter at any corpus size.
    *  - **assignment**: IMI-style two-level argmax (Babenko & Lempitsky
    *    2012, the same hierarchy s3c proves out): coarse anchors are the
    *    prefix of the SAME hash rule (ak < ⌊2⁶⁰/n·ncoarse⌋, ncoarse ≈
    *    √nlist ⇒ coarse ⊆ anchors by construction), fine anchors join their
    *    argmax coarse group, and the corpus pays ncoarse + nlist/ncoarse ≈
    *    2√nlist dots per vector instead of d9's nlist — O(n^1.125) total at
    *    this parameterization vs d9's O(n^1.5).
    *
    * The price is the standard hierarchical-recall trade (a vector whose
    * best fine anchor sits in another coarse group lands in a near-optimal
    * cell) plus the binomial cell-size tail. MEASURED, not asserted
    * (SemDedupSpec): on the synthetic near-isotropic test corpus the
    * two-level dropped set recovers ~0.51–0.57 of the flat same-anchor
    * dropped set — random directions are the worst case for a coarse
    * quantizer (the coarse argmax carries little information), so this is
    * the trade's floor; clustered real embeddings sit higher. Everything
    * stays a pure
    * function of the data — thresholds are exact integer/IEEE arithmetic
    * both engines replay — so the whole pipeline is DuckDB-oracle-gated
    * like d9. */
  /** Test-only control for the hierarchical-recall trade: the SAME
    * hash-threshold anchors as [[semDedupDropsTwoLevel]] but FLAT
    * (exhaustive n·nlist) assignment. Comparing its dropped set against
    * the two-level one isolates exactly what the hierarchy loses —
    * unlike a d9-vs-d9b comparison, where a different anchor salt
    * dominates the difference. Never a driver query: O(n·nlist) dots. */
  private[dedup] def semDedupDropsFlatThreshold(emb: DataFrame, docs: DataFrame,
                                                n: Long, tau: Double,
                                                nlistOverride: Long = 0L): DataFrame = {
    val nlist = if (nlistOverride > 0) nlistOverride else math.max(16L, n / 256L)
    val scale = (1L << 60).toDouble / n.toDouble
    val tAnchor = math.floor(scale * nlist).toLong
    val ak = Dedup.md5Hash60(concat(lit("semdedup2|"), col("vec_id").cast("string")))
    val anchors = emb
      .select(col("vec_id").as("cell"), col("embedding").as("ce"), ak.as("akk"))
      .filter(col("akk") < tAnchor).select("cell", "ce")
    val assign = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(anchors))
      .select(col("vec_id"), col("cell"),
        Knn.dotFold(col("embedding"), col("ce")).as("s"))
      .groupBy("vec_id")
      .agg(max_by(col("cell"), struct(col("s"), (-col("cell")).as("nc"))).as("cell"))
      .withColumn("sub", lit(0L))
    dropsFromAssign(assign, emb, docs, tau)
  }

  def semDedupDropsTwoLevel(emb: DataFrame, docs: DataFrame, n: Long,
                            tau: Double, nlistOverride: Long = 0L): DataFrame = {
    val nlist = if (nlistOverride > 0) nlistOverride else math.max(16L, n / 256L)
    val ncoarse = math.max(2L, math.ceil(math.sqrt(nlist.toDouble)).toLong)
    // 2⁶⁰/n first, then ×count: the product can exceed 2⁵³, where doubles
    // go granular — IEEE gives both engines the same granular value, but
    // only if the operation ORDER is identical (the oracle spells it the
    // same way); floor() because Spark's cast truncates and DuckDB rounds
    val scale = (1L << 60).toDouble / n.toDouble
    val tAnchor = math.floor(scale * nlist).toLong
    val tCoarse = math.floor(scale * ncoarse).toLong
    val ak = Dedup.md5Hash60(concat(lit("semdedup2|"), col("vec_id").cast("string")))
    val anchors = graft.util.Caches.scoped(emb
      .select(col("vec_id").as("cell"), col("embedding").as("ce"), ak.as("akk"))
      .filter(col("akk") < tAnchor))
    val coarse = anchors.filter(col("akk") < tCoarse)
      .select(col("cell").as("g"), col("ce").as("cg"))
    // fine anchor -> coarse group: argmax dot, ties to the lower group id.
    // nlist·ncoarse dots over two bounded broadcast-sized frames.
    val fineGroups = anchors.select(col("cell"), col("ce"))
      .crossJoin(broadcast(coarse))
      .select(col("cell"), col("ce"), col("g"),
        Knn.dotFold(col("ce"), col("cg")).as("gd"))
      .groupBy("cell")
      .agg(max_by(col("g"), struct(col("gd"), (-col("g")).as("ng"))).as("g"),
        first(col("ce")).as("ce"))
    // corpus pass 1: nearest coarse group (n·ncoarse dots); the embedding
    // rides the aggregate so pass 2 needs no second corpus join
    val coarseAssign = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(coarse))
      .select(col("vec_id"), col("embedding"), col("g"),
        Knn.dotFold(col("embedding"), col("cg")).as("cd"))
      .groupBy("vec_id")
      .agg(max_by(col("g"), struct(col("cd"), (-col("g")).as("ng"))).as("g"),
        first(col("embedding")).as("embedding"))
    // corpus pass 2: nearest fine anchor WITHIN the assigned group
    // (n·nlist/ncoarse dots on average). fineGroups is nlist = n/256 rows
    // each carrying a full embedding — LINEAR in the corpus, so it must
    // never broadcast (at 10⁹ vectors it would be a multi-GB driver
    // frame). A shuffled hash join on g keeps it distributed: the build
    // side per g-partition is one group's fine anchors (≈ nlist/ncoarse ≈
    // 2√nlist rows — bounded), the stream side is that group's corpus
    // slice, and parallelism is ncoarse ≈ √(n/256) tasks, growing with n.
    val assign = coarseAssign
      .join(fineGroups.select(col("g"), col("cell"), col("ce")).hint("shuffle_hash"), "g")
      .select(col("vec_id"), col("cell"),
        Knn.dotFold(col("embedding"), col("ce")).as("fd"))
      .groupBy("vec_id")
      .agg(max_by(col("cell"), struct(col("fd"), (-col("cell")).as("nc"))).as("cell"))
      .withColumn("sub", lit(0L))
    dropsFromAssign(assign, emb, docs, tau)
  }

  /** Dispatch threshold for [[semDedupAuto]]. Measured (round 11, this
    * box, targeted bench at each tier; n = embeddings cardinality):
    *   n = 500  (sf0.001): d9 0.99 s vs d9b 1.14 s  (flat wins: fewer jobs)
    *   n = 500  (sf0.01):  d9 1.58 s vs d9b 1.38 s  (wash — box noise)
    *   n = 2000 (sf0.1):   d9 2.27 s vs d9b 1.86 s
    *   n = 20k  (sf1):     d9 4.50 s vs d9b 3.46 s
    *   n = 200k (sf10):    d9 55.9 s vs d9b 10.0 s  (r10 campaign)
    * At n = 500 the two are within noise of each other; by 2000 the
    * two-level path wins clearly and the gap then grows as n^0.5. The
    * cutover (1024) sits between those tiers. The asymmetry is
    * deliberate: past the cutover d9's Σ|cell|² ≈ n^1.5 pair volume is
    * the documented scale-killer, while below it the flat variant is
    * cheaper (one assignment pass, no hierarchy build) and finds more
    * pairs (√n cells are larger than d9b's floor cells). */
  val semDedupFlatMaxN = 1024L

  /** d9 family auto-dispatch: ONE public entry point routing on the cheap
    * deciding statistic (corpus cardinality) — the round-11 ask that
    * retires d9's standalone `weak` scale grade: a user calling the family
    * entry can no longer run the n^1.5 plan on a large corpus. The
    * explicit variants remain for the oracle gate and for callers who
    * want the flat baseline's richer within-cell coverage regardless. */
  def semDedupAuto(emb: DataFrame, docs: DataFrame, n: Long,
                   tau: Double): DataFrame =
    if (chooseSemDedup(n) == "flat")
      semDedupDrops(emb, docs,
        math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt), tau)
    else semDedupDropsTwoLevel(emb, docs, n, tau)

  private[graft] def chooseSemDedup(n: Long): String =
    if (n <= semDedupFlatMaxN) "flat" else "two-level"

  def d9SemDedup(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.cachedCount(spark, dir, "embeddings")
    val nlist = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    semDedupDrops(Tables.embeddings(spark, dir), Tables.documents(spark, dir),
      nlist, tau = 0.3).orderBy("doc_id")
  }

  def d9bSemDedup2Level(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.cachedCount(spark, dir, "embeddings")
    semDedupDropsTwoLevel(Tables.embeddings(spark, dir),
      Tables.documents(spark, dir), n, tau = 0.3).orderBy("doc_id")
  }

  /** d9c: the dispatching entry as a driver query. The oracle gate runs at
    * sf0.01, whose embeddings table is 500 rows (same as sf0.001 — only
    * sf0.1 grows it to 2000), so the deterministic route there is the
    * FLAT path and the oracle is d9's SQL verbatim; SemDedupSpec proves
    * the two-level route fires above the cutover. */
  def d9cSemDedupAuto(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.cachedCount(spark, dir, "embeddings")
    semDedupAuto(Tables.embeddings(spark, dir), Tables.documents(spark, dir),
      n, tau = 0.3).orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d9_semdedup" -> (d9SemDedup _),
    "d9b_semdedup_2level" -> (d9bSemDedup2Level _),
    "d9c_semdedup_auto" -> (d9cSemDedupAuto _)
  )

  private val dotSql = Knn.dotSql

  def oracle: Map[String, String] = Map(
    "d9_semdedup" -> d9Sql,
    // dispatch at the gate's corpus (500 embeddings at sf0.01) routes to
    // the flat path — the auto query's oracle IS d9's
    "d9c_semdedup_auto" -> d9Sql,
    "d9b_semdedup_2level" -> d9bSql
  )

  private lazy val d9Sql: String =
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

  private lazy val d9bSql: String =
      s"""WITH params AS (
        |  SELECT COUNT(*) AS n,
        |    GREATEST(16, COUNT(*) // 256) AS nlist,
        |    GREATEST(2, CAST(ceil(sqrt(CAST(GREATEST(16, COUNT(*) // 256) AS DOUBLE))) AS BIGINT)) AS ncoarse
        |  FROM embeddings),
        |thr AS (
        |  -- division FIRST, then the count multiply: the product can sit
        |  -- above 2^53 where doubles are granular, and both engines must
        |  -- replay the identical IEEE operation order
        |  SELECT CAST(floor(1152921504606846976.0 / n * nlist) AS BIGINT) AS ta,
        |         CAST(floor(1152921504606846976.0 / n * ncoarse) AS BIGINT) AS tc
        |  FROM params),
        |anchors AS (
        |  SELECT cell, ce, akk FROM (
        |    SELECT vec_id AS cell, embedding AS ce,
        |      CAST('0x' || substr(md5('semdedup2|' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) AS akk
        |    FROM embeddings) t CROSS JOIN thr
        |  WHERE t.akk < thr.ta),
        |coarse AS (
        |  SELECT cell AS g, ce AS cg FROM anchors CROSS JOIN thr
        |  WHERE akk < thr.tc),
        |finegrp AS (
        |  SELECT cell, ce, g FROM (
        |    SELECT f.cell, f.ce, c.g,
        |      row_number() OVER (PARTITION BY f.cell ORDER BY
        |        list_reduce(list_transform(range(1, len(f.ce) + 1),
        |          i -> CAST(f.ce[i] AS DOUBLE) * CAST(c.cg[i] AS DOUBLE)),
        |          (acc, x) -> acc + x) DESC, c.g) AS grk
        |    FROM anchors f CROSS JOIN coarse c) t WHERE grk = 1),
        |cassign AS (
        |  SELECT vec_id, embedding, g FROM (
        |    SELECT e.vec_id, e.embedding, c.g,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(e.embedding) + 1),
        |          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cg[i] AS DOUBLE)),
        |          (acc, x) -> acc + x) DESC, c.g) AS crk
        |    FROM embeddings e CROSS JOIN coarse c) t WHERE crk = 1),
        |fassign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT ca.vec_id, f.cell,
        |      row_number() OVER (PARTITION BY ca.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(ca.embedding) + 1),
        |          i -> CAST(ca.embedding[i] AS DOUBLE) * CAST(f.ce[i] AS DOUBLE)),
        |          (acc, x) -> acc + x) DESC, f.cell) AS frk
        |    FROM cassign ca JOIN finegrp f ON f.g = ca.g) t WHERE frk = 1),
        |norms AS (
        |  SELECT vec_id AS id,
        |    sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
        |      (acc, x) -> acc + x)) AS nrm
        |  FROM embeddings),
        |members AS (
        |  SELECT g.vec_id AS id, g.cell, e.embedding, n.nrm, d.n_chars AS q
        |  FROM fassign g JOIN embeddings e ON e.vec_id = g.vec_id
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
}
