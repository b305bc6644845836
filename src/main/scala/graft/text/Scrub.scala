package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII scrubbing and URL filtering — the redaction/blocklist tier every
  * production training-data pipeline runs before anything else touches the
  * text (C4's cleaning stage and The Pile's preprocessing both lead with
  * exactly these two passes — public pipeline literature, e.g. Raffel et
  * al. 2020 §2.2).
  *
  * The synthetic `documents` text is a closed word vocabulary with no
  * natural PII or URLs, so each query first AUGMENTS the text with
  * deterministic doc_id-derived contact strings / URLs — the same
  * reconstruct-from-metadata pattern as `Multimodal.syntheticMedia` — and
  * the oracle performs the identical augmentation in SQL. Two engines
  * agreeing on "nothing matched" would prove nothing (the j04 lesson);
  * this way every row exercises every regex.
  *
  * Engine parity: Java regex (Spark) and RE2 (DuckDB) agree on this
  * pattern subset — character classes, bounded repetition, greedy `+` with
  * leftmost-first semantics, single capture group. No backrefs, no
  * lookaround (RE2 has neither). All counts are cast to BIGINT on both
  * sides; replacement order (emails → phones → IPs) is fixed so chained
  * rewrites can't interleave differently.
  *
  * Scale shape: both ops are pure per-row projections (codegen'd
  * `regexp_replace` / `regexp_extract_all`) — zero shuffles for t11; t12
  * adds one explode and one broadcast anti-join against the constant-size
  * blocklist. Nothing here depends on corpus size.
  */
object Scrub {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+1-555-[0-9]{4}"
  val ipRe = "10\\.[0-9]+\\.[0-9]+\\.[0-9]+"
  val urlRe = "https?://[^ ]+"

  /** Deterministic PII augmentation: contact line derived from doc_id. */
  private def withPii(docs: DataFrame): DataFrame =
    docs.withColumn("aug", concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail"), (col("doc_id") % 5).cast("string"), lit(".example.com"),
      lit(" phone +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" from 10."), (col("doc_id") % 256).cast("string"),
      lit(".0."), ((col("doc_id") * 7) % 256).cast("string")))

  /** Redact emails, then phones, then IPs; count each kind first. */
  def redactPii(docs: DataFrame): DataFrame = {
    def n(c: Column, re: String) = size(regexp_extract_all(c, lit(re), lit(0))).cast("bigint")
    withPii(docs)
      .withColumn("n_emails", n(col("aug"), emailRe))
      .withColumn("n_phones", n(col("aug"), phoneRe))
      .withColumn("n_ips", n(col("aug"), ipRe))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("aug"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"),
          ipRe, "<IP>"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        col("redacted"))
  }

  /** Deterministic URL augmentation: two URLs per doc (different schemes,
    * different domain families) so extraction yields multiple rows. */
  private def withUrls(docs: DataFrame): DataFrame =
    docs.withColumn("aug", concat(
      col("text"),
      lit(" see https://site"), (col("doc_id") % 7).cast("string"),
      lit(".example.org/p/"), col("doc_id").cast("string"),
      lit(" and http://cdn"), (col("doc_id") % 3).cast("string"),
      lit(".example.net/x")))

  val blockedDomains = Seq("site0.example.org", "site4.example.org", "cdn1.example.net")

  /** Extract every URL, derive its domain, drop blocklisted domains via a
    * broadcast anti-join (the blocklist is constant-size by nature). */
  def extractUrls(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val block = broadcast(blockedDomains.toDF("blocked"))
    withUrls(docs)
      .select(col("doc_id"),
        explode(regexp_extract_all(col("aug"), lit(urlRe), lit(0))).as("url"))
      .withColumn("domain", regexp_extract(col("url"), "https?://([^/]+)", 1))
      .join(block, col("domain") === col("blocked"), "left_anti")
      .select("doc_id", "url", "domain")
  }

  def t11PiiRedact(spark: SparkSession, dir: String): DataFrame =
    redactPii(Tables.documents(spark, dir)).orderBy("doc_id")

  def t12UrlExtract(spark: SparkSession, dir: String): DataFrame =
    extractUrls(Tables.documents(spark, dir)).orderBy("doc_id", "url")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t11_pii_redact" -> (t11PiiRedact _),
    "t12_url_extract" -> (t12UrlExtract _)
  )

  def oracle: Map[String, String] = Map(
    "t11_pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id, text || ' contact user' || doc_id
        |    || '@mail' || (doc_id % 5) || '.example.com'
        |    || ' phone +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    || ' from 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256)
        |    AS a
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(a, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(a, '10\.[0-9]+\.[0-9]+\.[0-9]+')) AS BIGINT) AS n_ips,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
        |    '10\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g') AS redacted
        |FROM aug ORDER BY doc_id""".stripMargin,
    "t12_url_extract" ->
      """WITH aug AS (
        |  SELECT doc_id, text || ' see https://site' || (doc_id % 7)
        |    || '.example.org/p/' || doc_id
        |    || ' and http://cdn' || (doc_id % 3) || '.example.net/x' AS a
        |  FROM documents),
        |urls AS (
        |  SELECT doc_id, unnest(regexp_extract_all(a, 'https?://[^ ]+')) AS url
        |  FROM aug),
        |dom AS (
        |  SELECT doc_id, url, regexp_extract(url, 'https?://([^/]+)', 1) AS domain
        |  FROM urls)
        |SELECT doc_id, url, domain FROM dom
        |WHERE domain NOT IN ('site0.example.org', 'site4.example.org', 'cdn1.example.net')
        |ORDER BY doc_id, url""".stripMargin
  )
}
