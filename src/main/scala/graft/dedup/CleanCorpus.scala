package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.text.TextAnalysis.{fingerprint, tokens}

/** The canonical training-data cleaning pipeline as ONE composed query:
  *
  *   1. exact dedup — keep the lowest doc_id per content fingerprint;
  *   2. near-dup removal — for every Jaccard ≥ 0.5 pair, keep the lower id
  *      (greedy survivor rule: a doc is dropped if ANY kept-or-dropped
  *      lower-id doc is near-identical — transitively consistent because
  *      pair relations here are symmetric and we drop all `b` sides);
  *   3. quality filter — minimum token count and type-token ratio;
  *
  * emitting the kept corpus with a `drop_stage` audit column for documents
  * that were removed (the shape a 100 TB data-cleaning job actually needs:
  * the drop *reason* ships with the lineage, not just the survivors). */
object CleanCorpus {

  def clean(docs: DataFrame, jaccardThreshold: Double = 0.5,
            minTokens: Int = 20, minTtr: Double = 0.3): DataFrame = {
    val staged = graft.text.TextAnalysis.withCanonicalId(docs, "doc_id", "text")
      .withColumn("n_tokens", size(tokens(col("text"))).cast("bigint"))
      .withColumn("ttr",
        size(array_distinct(tokens(col("text")))).cast("double") / col("n_tokens"))

    // prefix-filtered variant: identical pairs (DedupSpec proves equivalence)
    // but candidate generation stays bounded on zipf corpora — the scale path.
    val nearDupB = Dedup.ngramJaccardPairsPrefix(docs, jaccardThreshold)
      .select(col("b_id").as("doc_id")).distinct()

    staged
      .join(nearDupB.withColumn("is_neardup", lit(true)), Seq("doc_id"), "left")
      .withColumn("drop_stage",
        when(col("doc_id") =!= col("canonical_id"), "exact_dup")
          .when(col("is_neardup"), "near_dup")
          .when(col("n_tokens") < minTokens, "too_short")
          .when(col("ttr") < minTtr, "low_diversity")
          .otherwise("kept"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("drop_stage"))
  }

  def d6CleanCorpus(spark: SparkSession, dir: String): DataFrame =
    clean(Tables.documents(spark, dir)).orderBy("doc_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d6_clean_corpus" -> (d6CleanCorpus _))

  def oracle: Map[String, String] = Map(
    "d6_clean_corpus" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, text, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |staged AS (
        |  SELECT doc_id, lang,
        |    md5(lower(trim(text))) AS fp,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr
        |  FROM toks),
        |canon AS (
        |  SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS canonical_id FROM staged),
        |sh AS (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3 THEN
        |    list_distinct(list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |    ELSE [] END) AS s
        |  FROM toks),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |neardup AS (
        |  SELECT DISTINCT b_id AS doc_id
        |  FROM pairs p JOIN sizes sa ON p.a_id = sa.doc_id
        |               JOIN sizes sb ON p.b_id = sb.doc_id
        |  WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5)
        |SELECT c.doc_id, c.lang, c.n_tokens,
        |  CASE WHEN c.doc_id <> c.canonical_id THEN 'exact_dup'
        |       WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
        |       WHEN c.n_tokens < 20 THEN 'too_short'
        |       WHEN c.ttr < 0.3 THEN 'low_diversity'
        |       ELSE 'kept' END AS drop_stage
        |FROM canon c LEFT JOIN neardup nd ON nd.doc_id = c.doc_id
        |ORDER BY c.doc_id""".stripMargin)
}
