package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.text.TextAnalysis.{fingerprint, shingles, tokens}

/** Deduplication tier for training-data pipelines: exact (hash groupBy),
  * n-gram Jaccard, MinHash+LSH, and SimHash near-dup detection.
  *
  * Scale design (the whole point of each variant):
  *  - exact: one shuffle on a 128-bit fingerprint — embarrassingly scalable.
  *  - n-gram Jaccard: the *exact* similarity join — O(pairs sharing a
  *    shingle); fine at 10⁵ docs, quadratic blowup risk at 10⁹. It is the
  *    correctness oracle for the sketch variants.
  *  - MinHash+LSH: signatures are a fixed 16 longs/doc regardless of doc
  *    size; banding turns all-pairs into an equi-join on (band, band_sig) —
  *    the only pairs materialized are hash-bucket collisions. This is the
  *    100 TB path (cost ≈ |docs|·|shingles|·|seeds| map-side + tiny joins).
  *  - SimHash: one 60-bit code/doc; near-dup = small Hamming distance.
  *
  * All hashes are md5-derived (hex→int64) so every engine computes identical
  * values — murmur/xxhash implementations differ across engines.
  */
object Dedup {

  /** 60-bit engine-portable hash: top 15 hex chars of md5, as int64 ≥ 0. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** Exact dedup: keep the lowest doc_id per content fingerprint. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val byFp = Window.partitionBy("fp")
    docs.withColumn("fp", fingerprint(col(textCol)))
      .withColumn("canonical_id", min(idCol).over(byFp))
      .filter(col(idCol) === col("canonical_id"))
      .drop("canonical_id")
  }

  /** Distinct (doc_id, shingle) pairs — shared by Jaccard and MinHash. */
  private def shingleRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(shingles(tokens(col("text")))).as("s"))

  /** D2: exact n-gram Jaccard similarity join via shingle-inverted-index
    * self-join. Returns pairs with jaccard ≥ threshold. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingleRows(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("a_id", "s")
    val b = sh.toDF("b_id", "s2")
    val common = a.join(b, col("s") === col("s2") && col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("common"))
    common
      .join(sizes.toDF("a_id", "na"), "a_id")
      .join(sizes.toDF("b_id", "nb"), "b_id")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  val numHashes = 16
  val bandSize = 4

  /** MinHash signatures: (doc_id, band, band_sig) — one row per band. */
  def minHashBands(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val seeds = spark.range(numHashes).select(col("id").cast("int").as("seed"))
    shingleRows(docs)
      .crossJoin(broadcast(seeds))
      .select(col("doc_id"), col("seed"),
        md5Hash60(concat(col("seed").cast("string"), lit("|"), col("s"))).as("h"))
      .groupBy("doc_id", "seed").agg(min("h").as("mh"))
      .withColumn("band", floor(col("seed") / bandSize).cast("int"))
      .groupBy("doc_id", "band")
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("seed"), col("mh")))),
          x => x.getField("mh").cast("string"))).as("band_sig"))
  }

  /** D3: MinHash+LSH near-dup pairs, verified with true Jaccard. Candidate
    * generation is an equi-join on (band, band_sig); only collisions are
    * verified. */
  def minHashLshPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val bands = minHashBands(docs)
    val cand = bands.toDF("a_id", "band", "sig")
      .join(bands.toDF("b_id", "band2", "sig2"),
        col("band") === col("band2") && col("sig") === col("sig2") &&
          col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val sh = shingleRows(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    pairsCommon(cand, sh, sizes, threshold)
  }

  /** Shared verify step: true Jaccard for an explicit candidate pair set. */
  private def pairsCommon(cand: DataFrame, sh: DataFrame, sizes: DataFrame,
                          threshold: Double): DataFrame = {
    val shA = sh.toDF("a_id", "sa")
    val shB = sh.toDF("bb_id", "sb")
    cand.join(shA, "a_id")
      .join(shB, col("b_id") === col("bb_id") && col("sa") === col("sb"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.toDF("a_id", "na"), "a_id")
      .join(sizes.toDF("b_id", "nb"), "b_id")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  val simHashBits = 60

  /** D4: 60-bit SimHash code per doc from distinct-token md5 hashes. */
  def simHash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
      .withColumn("h", md5Hash60(col("tok")))
      .crossJoin(broadcast(docs.sparkSession.range(simHashBits)
        .select(col("id").cast("int").as("j"))))
      .withColumn("contrib",
        when(expr("(h >> j) & 1") === 1, 1).otherwise(-1))
      .groupBy("doc_id", "j").agg(sum("contrib").as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("CAST(1 AS BIGINT) << j")).otherwise(0L)).as("simhash"))

  /** D4 pairs: Hamming distance ≤ maxHamming over all doc pairs. */
  def simHashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val codes = simHash(docs)
    codes.toDF("a_id", "ha")
      .join(codes.toDF("b_id", "hb"), col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(expr("ha ^ hb")).cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  // ---- oracle-checked queries --------------------------------------------

  def d1ExactDedup(spark: SparkSession, dir: String): DataFrame =
    exactDedup(Tables.documents(spark, dir), "doc_id", "text")
      .select("doc_id", "fp", "lang", "n_chars").orderBy("doc_id")

  def d2NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(Tables.documents(spark, dir), 0.5).orderBy("a_id", "b_id")

  def d3MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minHashLshPairs(Tables.documents(spark, dir), 0.5).orderBy("a_id", "b_id")

  def d4Simhash(spark: SparkSession, dir: String): DataFrame =
    simHashPairs(Tables.documents(spark, dir), 10).orderBy("a_id", "b_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_exact_dedup" -> (d1ExactDedup _),
    "d2_ngram_jaccard" -> (d2NgramJaccard _),
    "d3_minhash_lsh" -> (d3MinhashLsh _),
    "d4_simhash" -> (d4Simhash _)
  )

  private val shingleSqlCtes =
    """toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3 THEN
      |    list_distinct(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |    ELSE [] END) AS s
      |  FROM toks),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  def oracle: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """WITH f AS (
        |  SELECT doc_id, md5(lower(trim(text))) AS fp, lang, n_chars,
        |    MIN(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canon
        |  FROM documents)
        |SELECT doc_id, fp, lang, n_chars FROM f WHERE doc_id = canon
        |ORDER BY doc_id""".stripMargin,
    "d2_ngram_jaccard" ->
      s"""WITH $shingleSqlCtes,
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |  CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
        |FROM pairs p JOIN sizes sa ON p.a_id = sa.doc_id
        |             JOIN sizes sb ON p.b_id = sb.doc_id
        |WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    "d3_minhash_lsh" ->
      s"""WITH $shingleSqlCtes,
        |mh AS (
        |  SELECT doc_id, seed.i AS seed,
        |    MIN(CAST('0x' || substr(md5(CAST(seed.i AS VARCHAR) || '|' || s), 1, 15) AS BIGINT)) AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS i) seed
        |  GROUP BY doc_id, seed.i),
        |bands AS (
        |  SELECT doc_id, CAST(floor(seed / 4) AS INT) AS band,
        |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS band_sig
        |  FROM mh GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
        |common AS (
        |  SELECT c.a_id, c.b_id, COUNT(*) AS common
        |  FROM cand c JOIN sh x ON x.doc_id = c.a_id
        |              JOIN sh y ON y.doc_id = c.b_id AND y.s = x.s
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |  CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
        |FROM common p JOIN sizes sa ON p.a_id = sa.doc_id
        |              JOIN sizes sb ON p.b_id = sb.doc_id
        |WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    "d4_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok
        |  FROM documents),
        |th AS (
        |  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks),
        |bits AS (
        |  SELECT doc_id, j.j AS j,
        |    SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS j) j
        |  GROUP BY 1, 2),
        |codes AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS simhash
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM codes a JOIN codes b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 10
        |ORDER BY a_id, b_id""".stripMargin
  )
}
