package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor — the other standard
  * scale path next to LSH (graft.similarity.Knn): a k-means coarse
  * quantizer partitions the corpus into cells; a query scores only the
  * `nprobe` cells whose centroids are nearest.
  *
  * Cost model at 100 TB: index build is one MLlib k-means fit (sampled) +
  * one assignment pass; each query touches |corpus|·nprobe/nlist vectors.
  * The cell id is a plain partition-friendly column — at scale the corpus
  * would be written `partitionBy("cell")` so a probe prunes whole files.
  * Deterministic: fixed k-means seed. */
object Ivf {

  case class IvfIndex(assignments: DataFrame /* (vec_id, cell, embedding) */ ,
                      centroids: Array[(Int, Array[Double])])

  /** Build: fit the coarse quantizer on a deterministic hash-sample of the
    * corpus (`fitFrac`), then assign EVERY vector to a cell. The split is
    * the 100 TB shape: each k-means iteration touches only the sample
    * (~50·nlist rows suffices for a coarse quantizer), while the single
    * assignment pass streams the full corpus once. The sample key is the
    * same md5 family as [[graft.text.CorpusOps.hashSample]] — reproducible
    * across runs, engines, and cluster sizes, never `rand()`. */
  def build(emb: DataFrame, nlist: Int, seed: Long = 42L,
            fitFrac: Double = 1.0): IvfIndex = {
    val spark = emb.sparkSession
    import spark.implicits._
    val withVec = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, e) => (id, Vectors.dense(e.map(_.toDouble)), e) }
      .toDF("vec_id", "features", "embedding")
    val fitSet =
      if (fitFrac >= 1.0) withVec
      else withVec.filter(
        graft.dedup.Dedup.md5Hash60(concat(lit("ivffit|"), col("vec_id").cast("string")))
          < lit((fitFrac * (1L << 60).toDouble).toLong))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features")
      .fit(fitSet)
    val assigned = model.transform(withVec)
      .select(col("vec_id"), col("prediction").as("cell"), col("embedding"))
    IvfIndex(assigned, model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) })
  }

  /** Just the fitted centroid table of [[build]] — the s3 pipeline wants the
    * centroids as plain driver-side doubles so it can ship them BOTH to the
    * Spark plan and into the DuckDB oracle as identical literals. */
  def fitCentroids(emb: DataFrame, nlist: Int, seed: Long = 42L,
                   fitFrac: Double = 1.0): Array[(Int, Array[Double])] =
    build(emb, nlist, seed, fitFrac).centroids

  /** IVF search against an EXPORTED literal centroid table — the arithmetic
    * the DuckDB oracle replays verbatim. Assignment and probing both rank
    * cells by `score = dot(e, c) − ½‖c‖²`, which orders cells exactly like
    * euclidean distance (‖e−c‖² = ‖e‖² − 2·score with ‖e‖² constant per
    * row), so this IS nearest-centroid IVF — but expressed with one ordered
    * [[Knn.dotFold]] per (vector, cell) and a per-cell literal constant,
    * arithmetic both engines reproduce bit-for-bit from the same `%.17e`
    * literals. MLlib's own `model.transform` is deliberately NOT used for
    * assignment: its triangle-inequality-pruned distance path computes
    * different intermediate floats than any SQL twin could.
    *
    * Scale shape is s3b's: the centroid table broadcasts (nlist ≈ √n ⇒ a few
    * MB at 10⁹ vectors), assignment is a map-side max_by (the only shuffle is
    * n 2-column rows), probes rank only the fixed-count query stratum, and
    * the rerank joins are plain shuffle equi-joins. */
  def centroidTopK(emb: DataFrame, cents: Array[(Int, Array[Double])],
                   nprobe: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val anchors = cents.toSeq
      .map { case (c, v) => (c, v, 0.5 * v.map(x => x * x).sum) }
      .toDF("cell", "ce", "hcc")
    def scored(vecs: DataFrame): DataFrame =
      vecs.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(anchors))
        .select(col("vec_id"), col("cell"),
          (Knn.dotFold(col("embedding"), col("ce")) - col("hcc")).as("s"))
    val assign = scored(emb)
      .groupBy(col("vec_id").as("b_id"))
      .agg(max_by(col("cell"), struct(col("s"), (-col("cell")).as("nc"))).as("cell"))
    val probes = scored(emb.join(broadcast(Knn.queryIds(emb)), "vec_id"))
      .withColumn("ark", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("s").desc, col("cell").asc)))
      .filter(col("ark") <= nprobe)
      .select(col("vec_id").as("a_id"), col("cell"))
    val cand = probes.join(assign, "cell")
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id")
    Knn.scoredTopK(emb, cand, k)
  }

  private def litD(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.17e", Double.box(d))

  /** The DuckDB twin of [[centroidTopK]] for a concrete fitted centroid
    * table: cells, components, and the ½‖c‖² constants inlined as exact
    * round-tripping e-notation literals, every fold in the engine's
    * evaluation order. Built at query time (the fit depends on the data),
    * registered for Verify's oracle dump — same mechanism as the
    * hyperplane/anchor literals of s2/s3b, just with the literal table
    * coming from the MLlib fit of THIS run. */
  def s3OracleSql(cents: Array[(Int, Array[Double])], nprobe: Int, k: Int): String = {
    val rows = cents.map { case (c, v) =>
      val h = 0.5 * v.map(x => x * x).sum
      s"($c, [${v.map(litD).mkString(", ")}], ${litD(h)})"
    }.mkString(",\n    ")
    s"""WITH cents(cell, ce, hcc) AS (VALUES
       |    $rows),
       |adots AS (
       |  SELECT e.vec_id, c.cell,
       |    list_reduce(list_transform(range(1, len(e.embedding) + 1),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * c.ce[i]),
       |      (acc, x) -> acc + x) - c.hcc AS s
       |  FROM embeddings e CROSS JOIN cents c),
       |ranked AS (
       |  SELECT vec_id, cell, s,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS ark
       |  FROM adots),
       |assign AS (SELECT vec_id AS b_id, cell FROM ranked WHERE ark = 1),
       |${Knn.queryIdsSql},
       |probes AS (
       |  SELECT vec_id AS a_id, cell FROM ranked
       |  WHERE vec_id IN (SELECT vec_id FROM q_ids) AND ark <= $nprobe),
       |cand AS (
       |  SELECT a_id, b_id FROM probes JOIN assign USING (cell)
       |  WHERE a_id <> b_id),
       |dots AS (
       |  SELECT cand.a_id, cand.b_id,
       |    ${Knn.dotSql} AS dot
       |  FROM cand JOIN embeddings a ON a.vec_id = cand.a_id
       |            JOIN embeddings b ON b.vec_id = cand.b_id),
       |final AS (
       |  SELECT a_id, b_id, dot,
       |    row_number() OVER (PARTITION BY a_id ORDER BY dot DESC, b_id) AS rk
       |  FROM dots)
       |SELECT a_id, rk, b_id, dot FROM final WHERE rk <= $k
       |ORDER BY a_id, rk""".stripMargin
  }

  /** Oracle SQL registered by the most recent [[s3KnnIvf]] run. Verify runs
    * every query BEFORE dumping oracle_sql.json, so within a driver round the
    * registered SQL carries exactly the centroids that produced the dumped
    * parquet; if s3 never ran (filtered Verify invocation), the entry is
    * simply omitted and the driver falls back to its rows-only record. */
  @volatile private var s3FittedOracle: Option[String] = None

  /** Search: for the given query vectors, probe the nprobe nearest cells
    * and rank candidates by exact dot product. */
  def search(index: IvfIndex, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids
    // driver-side probe-cell selection per query (centroid table is tiny)
    val probeCells = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, e) =>
        val d = e.map(_.toDouble)
        val best = cents.map { case (c, cv) =>
          (c, cv.zip(d).map { case (x, y) => x * y }.sum)
        }.sortBy { case (c, dot) => (-dot, c) }.take(nprobe).map(_._1)
        (id, best)
      }.toDF("a_id", "cells")
    val probes = probeCells.select(col("a_id"), explode(col("cells")).as("cell"))

    // probes (|queries|·nprobe rows) and q (the query stratum) both scale
    // with the corpus: plain shuffle equi-joins, no broadcast hints — AQE
    // broadcasts them at runtime only when they are actually small.
    val q = queries.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val cand = index.assignments.toDF("b_id", "cell", "eb")
      .join(probes, "cell")
      .filter(col("a_id") =!= col("b_id"))
      .join(q, "a_id")
      .select(col("a_id"), col("b_id"), Knn.dotFold(col("ea"), col("eb")).as("dot"))
    val rk = Window.partitionBy("a_id").orderBy(col("dot").desc, col("b_id").asc)
    cand.withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= k)
      .select("a_id", "rk", "b_id", "dot")
  }

  /** Driver query: IVF top-5 for the fixed-count query stratum
    * ([[Knn.queryIds]] — a constant-size query set, so search cost is
    * queryN·nprobe·√n, sub-linear in the corpus; the old fractional
    * stratum made it O(n²/80) and measured 13.2× at 10× data).
    * nlist ≈ √n keeps cells at √n vectors, so a probe touches
    * nprobe·√n candidates — the standard IVF cost curve; nprobe = nlist/4
    * trades ~4× scan reduction for recall (IvfSpec pins the recall floor
    * and exact-dot correctness). ORACLE-GATED since round 9: the k-means
    * fit exports its centroids as literals and [[centroidTopK]] /
    * [[s3OracleSql]] replay identical arithmetic, so the driver checks
    * rows+schema+hash against DuckDB like every other tier. */
  def s3KnnIvf(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables.embeddings(spark, dir)
    val n = graft.Tables.cachedCount(spark, dir, "embeddings")
    val nlist = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    val nprobe = math.max(2, nlist / 4)
    // quantizer fit sample: ~50 points per centroid is plenty for a coarse
    // quantizer; below 50·nlist rows the sample is the whole corpus (so the
    // driver gate at sf0.01 fits on all 500 vectors, unchanged), above it
    // the fit cost stays O(nlist) while assignment stays one full pass
    val fitFrac = math.min(1.0, 50.0 * nlist / n.toDouble)
    val cents = fitCentroids(emb, nlist, fitFrac = fitFrac)
    s3FittedOracle = Some(s3OracleSql(cents, nprobe, k = 5))
    centroidTopK(emb, cents, nprobe, k = 5).orderBy("a_id", "rk")
  }

  /** Deterministic-anchor IVF ("IVF-flat with a hash-chosen coarse
    * quantizer"): the nlist cells are anchored at the corpus vectors whose
    * md5 key is smallest, instead of k-means centroids. The quantizer is a
    * pure function of the data, so — unlike [[s3KnnIvf]], whose centroids
    * are MLlib-internal — the WHOLE pipeline is SQL-expressible and
    * DuckDB-oracle-gated. Same cost curve as k-means IVF: assignment is the
    * standard O(n·nlist) scan against the broadcast anchor table (nlist ≈ √n
    * ⇒ a few MB even at 10⁹ vectors, the one legitimately-broadcast side in
    * this family), search touches nprobe cells. Recall sits below k-means
    * IVF (anchors are corpus samples, not optimized centroids); trading
    * centroid quality for end-to-end determinism is the point. */
  def anchorIvfTopK(emb: DataFrame, nlist: Int, nprobe: Int, k: Int): DataFrame = {
    val ak = graft.dedup.Dedup.md5Hash60(
      concat(lit("ivfanchor|"), col("vec_id").cast("string")))
    val anchors = emb
      .select(col("vec_id").as("cell"), col("embedding").as("ce"), ak.as("ak"))
      .orderBy(col("ak"), col("cell")).limit(nlist)
      .select("cell", "ce")
    // n·nlist anchor dots per side, scored against the BROADCAST anchor
    // table (nlist ≈ √n ⇒ a few MB even at 10⁹ vectors)
    def scored(vecs: DataFrame): DataFrame =
      vecs.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(anchors))
        .select(col("vec_id"), col("cell"),
          Knn.dotFold(col("embedding"), col("ce")).as("adot"))
    // Assignment argmax as ONE map-side-complete aggregate: the anchors are
    // broadcast, so every (vec, anchor) score of a vector sits in the same
    // input partition and the max_by partial finishes in-stage — the only
    // shuffle is n 2-column rows. (The old formulation cached the full
    // n·nlist scored frame and ranked it with a window: a shuffle + sort of
    // the whole O(n^1.5) frame just to pick each vector's max. max_by's
    // (adot, -cell) struct key replays the window's exact tie-break:
    // highest dot, then LOWEST cell.)
    val assign = scored(emb)
      .groupBy(col("vec_id").as("b_id"))
      .agg(max_by(col("cell"), struct(col("adot"), (-col("cell")).as("nc"))).as("cell"))
    // probe ranking needs top-nprobe PER QUERY only — score just the
    // queryN-row stratum (queryN·nlist rows; the window sort is trivial)
    val probes = scored(emb.join(broadcast(Knn.queryIds(emb)), "vec_id"))
      .withColumn("ark", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("adot").desc, col("cell").asc)))
      .filter(col("ark") <= nprobe)
      .select(col("vec_id").as("a_id"), col("cell"))
    // each b sits in exactly one cell and each (a, cell) probe is unique, so
    // (a_id, b_id) is already distinct — no dedup stage before scoring
    val cand = probes.join(assign, "cell")
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id")
    Knn.scoredTopK(emb, cand, k)
  }

  /** Driver query: anchor-IVF top-5 with the same nlist/nprobe curve as
    * [[s3KnnIvf]] — but hash-exact against DuckDB (the oracle recomputes the
    * anchor choice, assignment argmax, probe ranking, and exact rerank). */
  def s3bKnnIvfAnchor(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables.embeddings(spark, dir)
    val n = graft.Tables.cachedCount(spark, dir, "embeddings")
    val nlist = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    val nprobe = math.max(2, nlist / 4)
    anchorIvfTopK(emb, nlist, nprobe, k = 5).orderBy("a_id", "rk")
  }

  /** Hierarchical (two-level) anchor IVF — the 100 TB assignment path. The
    * flat tiers (s3/s3b/d9) pay the standard IVF build cost: one dot per
    * (vector, cell) = O(n·nlist), which at the nlist ≈ √n parameterization
    * is O(n^1.5) — measured 12–18× growth at 10× data on the sf10 curve,
    * under the 31.6× the curve predicts but still the whole-query
    * bottleneck. The classic fix (IMI / hierarchical coarse quantizers,
    * Babenko & Lempitsky 2012) splits assignment in two: pick the nearest
    * of ncoarse ≈ √nlist COARSE anchors (√nlist dots), then the nearest
    * FINE anchor within that coarse group only (≈ nlist/ncoarse ≈ √nlist
    * dots) — O(n·2√nlist) = O(n^1.25) total, 13× fewer dots than s3b at
    * sf10's 500k vectors. The price is the standard hierarchical-recall
    * trade: a vector whose best fine anchor lives in a different coarse
    * group lands in a near-optimal cell instead.
    *
    * Everything stays a pure function of the data — coarse anchors are the
    * ncoarse md5-smallest of the SAME ranked anchor list s3b uses, fine
    * anchors join their argmax coarse group, and every argmax breaks ties
    * to the lower id — so the whole pipeline is DuckDB-oracle-gated like
    * s3b. Probe side is IDENTICAL to s3b (the query stratum is a fixed
    * [[Knn.queryN]] rows; scoring it against all nlist fine anchors is
    * queryN·nlist — noise), so s3c differs from s3b only where the scale
    * cost lives: the corpus assignment pass.
    *
    * Dataflow shape: every join against an anchor-derived frame broadcasts
    * ≤ nlist rows (√n ⇒ a few MB at 10⁹ vectors — the bounded-side
    * argument of s3b), both argmax passes are map-side-complete `max_by`
    * aggregates (the broadcast puts all of a vector's anchor scores in one
    * input partition), and the only corpus-sized exchanges are n-row
    * 2-to-3-column frames. */
  def twoLevelAnchorTopK(emb: DataFrame, nlist: Int, nprobe: Int, k: Int): DataFrame = {
    val ncoarse = math.max(2, math.ceil(math.sqrt(nlist.toDouble)).toInt)
    val ak = graft.dedup.Dedup.md5Hash60(
      concat(lit("ivfanchor|"), col("vec_id").cast("string")))
    // nlist rows; persisted — read by coarse, the fine-group build, and the
    // probe scorer, each of which would otherwise re-run the corpus-wide
    // TakeOrdered underneath. The single-partition window is over nlist
    // (≈ √n) rows, bounded at any corpus size.
    val ranked = graft.util.Caches.scoped(emb
      .select(col("vec_id").as("cell"), col("embedding").as("ce"), ak.as("ak"))
      .orderBy(col("ak"), col("cell")).limit(nlist)
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ak"), col("cell"))))
      .select("cell", "ce", "r"))
    val coarse = ranked.filter(col("r") <= ncoarse)
      .select(col("cell").as("g"), col("ce").as("cg"))
    // fine anchor -> coarse group: argmax dot, ties to the lower group id.
    // nlist·ncoarse dots over two bounded frames — driver-scale work kept
    // distributed anyway so the plan is one shape at every size.
    val fineGroups = ranked.select(col("cell"), col("ce"))
      .crossJoin(broadcast(coarse))
      .select(col("cell"), col("ce"), col("g"),
        Knn.dotFold(col("ce"), col("cg")).as("gd"))
      .groupBy("cell")
      .agg(max_by(col("g"), struct(col("gd"), (-col("g")).as("ng"))).as("g"),
        first(col("ce")).as("ce"))
    // corpus pass 1: nearest coarse group (n·ncoarse dots). The embedding
    // rides the aggregate (first() — constant per vec_id) so the fine pass
    // needs no second corpus join.
    val coarseAssign = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(coarse))
      .select(col("vec_id"), col("embedding"), col("g"),
        Knn.dotFold(col("embedding"), col("cg")).as("cd"))
      .groupBy("vec_id")
      .agg(max_by(col("g"), struct(col("cd"), (-col("g")).as("ng"))).as("g"),
        first(col("embedding")).as("embedding"))
    // corpus pass 2: nearest fine anchor WITHIN the assigned group
    // (n·(nlist/ncoarse) dots on average)
    val fineAssign = coarseAssign
      .join(broadcast(fineGroups.select(col("g"), col("cell"), col("ce"))), "g")
      .select(col("vec_id"), col("cell"),
        Knn.dotFold(col("embedding"), col("ce")).as("fd"))
      .groupBy(col("vec_id").as("b_id"))
      .agg(max_by(col("cell"), struct(col("fd"), (-col("cell")).as("nc"))).as("cell"))
    // probe side: verbatim s3b — rank ALL fine anchors per query vector
    val probes = emb.join(broadcast(Knn.queryIds(emb)), "vec_id")
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(ranked.select(col("cell"), col("ce"))))
      .select(col("vec_id"), col("cell"),
        Knn.dotFold(col("embedding"), col("ce")).as("adot"))
      .withColumn("ark", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("adot").desc, col("cell").asc)))
      .filter(col("ark") <= nprobe)
      .select(col("vec_id").as("a_id"), col("cell"))
    val cand = probes.join(fineAssign, "cell")
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id")
    Knn.scoredTopK(emb, cand, k)
  }

  /** Driver query: two-level anchor IVF, same nlist/nprobe curve as s3b. */
  def s3cKnnIvf2Level(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables.embeddings(spark, dir)
    val n = graft.Tables.cachedCount(spark, dir, "embeddings")
    val nlist = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)
    val nprobe = math.max(2, nlist / 4)
    twoLevelAnchorTopK(emb, nlist, nprobe, k = 5).orderBy("a_id", "rk")
  }

  /** S5: exact per-label centroids — the distributed E-step every k-means /
    * IVF build runs at full scale, expressed as pure relational dataflow.
    * posexplode is map-side (n·dim rows never materialize past the partial
    * aggregate); the only shuffle is the (label, dim) aggregate whose
    * cardinality is |labels|·dim — fixed, tiny, independent of corpus size.
    *
    * Determinism: each float component is quantized to an exact integer
    * (round(v·10⁶) — one IEEE multiply then half-away-from-zero rounding,
    * identical in both engines) and summed as BIGINT, so the aggregate is
    * order-independent; `centroid` is ONE double division of two exactly-
    * representable integers. No float summation ever crosses the shuffle —
    * the same rule the money/decimal convention enforces elsewhere. */
  def centroidsByLabel(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("q", round(col("v").cast("double") * lit(1000000.0)).cast("long"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), sum("q").as("sum_q"))
      .withColumn("centroid",
        col("sum_q").cast("double") / (col("n").cast("double") * lit(1000000.0)))
      .select(col("label"), col("dim").cast("long").as("dim"),
        col("n"), col("sum_q"), col("centroid"))
      .orderBy("label", "dim")

  def s5Centroids(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    centroidsByLabel(graft.Tables.embeddings(spark, dir))

  /** Dispatch threshold for [[s3dKnnAuto]]. Measured (round 11, this box,
    * targeted bench; n = embeddings cardinality; sf10 from r10 campaign):
    *   n = 500  (sf0.01): s3b 0.93 s vs s3c 1.18 s  (flat: fewer passes)
    *   n = 2000 (sf0.1):  s3b 1.05 s vs s3c 1.24 s
    *   n = 20k  (sf1):    s3b 4.70 s vs s3c 2.95 s  (two-level, 1.6×)
    *   n = 200k (sf10):   s3b 70.8 s vs s3c 9.6 s   (flat O(n·nlist) = O(n^1.5))
    * The cutover sits in the measured (2k, 20k) bracket. 8192 errs
    * toward the two-level side of the bracket's geometric middle (~6.3k)
    * because the wrong-side risk is asymmetric: below the cutover s3c
    * costs a constant ~0.2 s of extra passes, above it s3b's n·√n dot
    * count grows as n^1.5 (the 70.8 s row is that term alone). */
  val flatQuantizerMaxN = 8192L

  /** s3 anchor family auto-dispatch (round-11 ask): routes the flat
    * O(n^1.5) quantizer away above the cutover, retiring s3b's standalone
    * `weak` scale grade. Explicit variants remain for the oracle gate. */
  def s3dKnnAuto(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val n = graft.Tables.cachedCount(spark, dir, "embeddings")
    if (chooseAnchorIvf(n) == "flat") s3bKnnIvfAnchor(spark, dir)
    else s3cKnnIvf2Level(spark, dir)
  }

  private[graft] def chooseAnchorIvf(n: Long): String =
    if (n <= flatQuantizerMaxN) "flat" else "two-level"

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("s3_knn_ivf" -> (s3KnnIvf _),
        "s3b_knn_ivf_anchor" -> (s3bKnnIvfAnchor _),
        "s3c_knn_ivf_2level" -> (s3cKnnIvf2Level _),
        "s3d_knn_auto" -> (s3dKnnAuto _),
        "s5_centroids" -> (s5Centroids _))

  def oracle: Map[String, String] =
    s3FittedOracle.map("s3_knn_ivf" -> _).toMap ++ Map(
    "s5_centroids" ->
      """WITH e AS (
        |  SELECT label, embedding AS emb,
        |    unnest(range(0, len(embedding))) AS dim
        |  FROM embeddings),
        |q AS (
        |  SELECT label, dim,
        |    CAST(round(CAST(emb[dim + 1] AS DOUBLE) * 1000000) AS BIGINT) AS q
        |  FROM e)
        |SELECT label, dim, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sum_q,
        |  CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE) / (COUNT(*) * 1000000.0)
        |    AS centroid
        |FROM q GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    "s3b_knn_ivf_anchor" -> s3bSql,
    // the oracle gate runs at sf0.01 (n = 500 ≤ flatQuantizerMaxN; the
    // calibration table above records the tier cardinalities): dispatch
    // deterministically routes to the flat anchor variant there
    "s3d_knn_auto" -> s3bSql,
    "s3c_knn_ivf_2level" ->
      s"""WITH params AS (
        |  SELECT GREATEST(4, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) AS nlist,
        |         GREATEST(2, GREATEST(4, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) // 4) AS nprobe,
        |         GREATEST(2, CAST(ceil(sqrt(GREATEST(4, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)))) AS BIGINT)) AS ncoarse
        |  FROM embeddings),
        |ranked AS (
        |  SELECT cell, ce, r FROM (
        |    SELECT vec_id AS cell, embedding AS ce,
        |      row_number() OVER (ORDER BY
        |        CAST('0x' || substr(md5('ivfanchor|' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
        |        vec_id) AS r
        |    FROM embeddings) t CROSS JOIN params
        |  WHERE r <= params.nlist),
        |coarse AS (
        |  SELECT cell AS g, ce AS cg FROM ranked CROSS JOIN params
        |  WHERE r <= params.ncoarse),
        |finegrp AS (
        |  SELECT cell, ce, g FROM (
        |    SELECT f.cell, f.ce, c.g,
        |      row_number() OVER (PARTITION BY f.cell ORDER BY
        |        list_reduce(list_transform(range(1, len(f.ce) + 1),
        |          i -> CAST(f.ce[i] AS DOUBLE) * CAST(c.cg[i] AS DOUBLE)),
        |          (acc, x) -> acc + x) DESC, c.g) AS grk
        |    FROM ranked f CROSS JOIN coarse c) t WHERE grk = 1),
        |cassign AS (
        |  SELECT vec_id, g FROM (
        |    SELECT e.vec_id, c.g,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(e.embedding) + 1),
        |          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cg[i] AS DOUBLE)),
        |          (acc, x) -> acc + x) DESC, c.g) AS crk
        |    FROM embeddings e CROSS JOIN coarse c) t WHERE crk = 1),
        |fassign AS (
        |  SELECT b_id, cell FROM (
        |    SELECT e.vec_id AS b_id, f.cell,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(e.embedding) + 1),
        |          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(f.ce[i] AS DOUBLE)),
        |          (acc, x) -> acc + x) DESC, f.cell) AS frk
        |    FROM embeddings e JOIN cassign ca ON ca.vec_id = e.vec_id
        |         JOIN finegrp f ON f.g = ca.g) t WHERE frk = 1),
        |${Knn.queryIdsSql},
        |adots AS (
        |  SELECT e.vec_id, r.cell,
        |    list_reduce(list_transform(range(1, len(e.embedding) + 1),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(r.ce[i] AS DOUBLE)),
        |      (acc, x) -> acc + x) AS adot
        |  FROM embeddings e CROSS JOIN ranked r
        |  WHERE e.vec_id IN (SELECT vec_id FROM q_ids)),
        |probes AS (
        |  SELECT a_id, cell FROM (
        |    SELECT d.vec_id AS a_id, d.cell,
        |      row_number() OVER (PARTITION BY d.vec_id
        |        ORDER BY d.adot DESC, d.cell) AS ark
        |    FROM adots d) t
        |  CROSS JOIN params WHERE ark <= params.nprobe),
        |cand AS (
        |  SELECT a_id, b_id FROM probes JOIN fassign USING (cell)
        |  WHERE a_id <> b_id),
        |dots AS (
        |  SELECT cand.a_id, cand.b_id,
        |    ${Knn.dotSql} AS dot
        |  FROM cand JOIN embeddings a ON a.vec_id = cand.a_id
        |            JOIN embeddings b ON b.vec_id = cand.b_id),
        |final AS (
        |  SELECT a_id, b_id, dot,
        |    row_number() OVER (PARTITION BY a_id ORDER BY dot DESC, b_id) AS rk
        |  FROM dots)
        |SELECT a_id, rk, b_id, dot FROM final WHERE rk <= 5
        |ORDER BY a_id, rk""".stripMargin
  )

  /** s3b's oracle text — shared with s3d_knn_auto (whose dispatch at the
    * gate's corpus size deterministically routes to the flat variant). */
  private lazy val s3bSql: String =
    s"""WITH params AS (
      |  SELECT GREATEST(4, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) AS nlist,
      |         GREATEST(2, GREATEST(4, CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) // 4) AS nprobe
      |  FROM embeddings),
      |anchors AS (
      |  SELECT cell, ce FROM (
      |    SELECT vec_id AS cell, embedding AS ce,
      |      row_number() OVER (ORDER BY
      |        CAST('0x' || substr(md5('ivfanchor|' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
      |        vec_id) AS r
      |    FROM embeddings) CROSS JOIN params
      |  WHERE r <= params.nlist),
      |adots AS (
      |  SELECT e.vec_id, a.cell,
      |    list_reduce(list_transform(range(1, len(e.embedding) + 1),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(a.ce[i] AS DOUBLE)),
      |      (acc, x) -> acc + x) AS adot
      |  FROM embeddings e CROSS JOIN anchors a),
      |ranked AS (
      |  SELECT vec_id, cell, adot,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY adot DESC, cell) AS ark
      |  FROM adots),
      |assign AS (SELECT vec_id AS b_id, cell FROM ranked WHERE ark = 1),
      |${Knn.queryIdsSql},
      |probes AS (
      |  SELECT r.vec_id AS a_id, r.cell
      |  FROM ranked r CROSS JOIN params
      |  WHERE r.vec_id IN (SELECT vec_id FROM q_ids)
      |    AND r.ark <= params.nprobe),
      |cand AS (
      |  SELECT a_id, b_id FROM probes JOIN assign USING (cell)
      |  WHERE a_id <> b_id),
      |dots AS (
      |  SELECT cand.a_id, cand.b_id,
      |    ${Knn.dotSql} AS dot
      |  FROM cand JOIN embeddings a ON a.vec_id = cand.a_id
      |            JOIN embeddings b ON b.vec_id = cand.b_id),
      |final AS (
      |  SELECT a_id, b_id, dot,
      |    row_number() OVER (PARTITION BY a_id ORDER BY dot DESC, b_id) AS rk
      |  FROM dots)
      |SELECT a_id, rk, b_id, dot FROM final WHERE rk <= 5
      |ORDER BY a_id, rk""".stripMargin
}
