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

  /** Deterministic MESSY-URL augmentation for t20: five source variants —
    * plain, case-mangled scheme+host, explicit default port, reordered
    * query params + fragment, trailing slash — that all canonicalize to
    * one URL per doc_id group (doc_id % 100), so the dedup genuinely
    * collapses cross-variant groups. */
  private def withMessyUrl(docs: DataFrame): DataFrame = {
    val k = (col("doc_id") % 100).cast("string")
    val variant = (col("doc_id") % 5).cast("int")
    val url = when(variant === 0,
        concat(lit("http://host"), k, lit(".example.com/a/"), k, lit("?x=1&b=2")))
      .when(variant === 1,
        concat(lit("HTTP://HOST"), k, lit(".EXAMPLE.COM/a/"), k, lit("?x=1&b=2")))
      .when(variant === 2,
        concat(lit("http://host"), k, lit(".example.com:80/a/"), k, lit("?x=1&b=2")))
      .when(variant === 3,
        concat(lit("http://host"), k, lit(".example.com/a/"), k, lit("?b=2&x=1#frag")))
      .otherwise(
        concat(lit("http://host"), k, lit(".example.com/a/"), k, lit("/?x=1&b=2")))
    docs.withColumn("url", url)
  }

  /** t20: URL canonicalization + canonical-URL dedup — the CommonCrawl-
    * style "one document per canonical URL" pass. Canonical form:
    * lowercase scheme+host, default port stripped, fragment dropped,
    * query params SORTED, trailing path slash removed (root kept). All
    * pure codegen'd projections (regexp_extract / split / sort_array —
    * no UDF), then ONE canonical-key shuffle for the keep-lowest-doc_id
    * election — the d1 exact-dedup shape, so it scales identically. */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    // strip a port only when it is the DEFAULT for the scheme — http://h:443
    // and https://h:80 are non-default and must survive canonicalization
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path0 = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val path = when(path0 === "" || path0 === "/", lit("/"))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val qSorted = array_join(sort_array(split(query, "&")), "&")
    concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), qSorted)))
  }

  def canonicalUrlDedup(docs: DataFrame): DataFrame = {
    withMessyUrl(docs)
      .select(col("doc_id"), canonicalizeUrl(col("url")).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_variants"))
      .orderBy("canonical_url")
  }

  def t11PiiRedact(spark: SparkSession, dir: String): DataFrame =
    redactPii(Tables.documents(spark, dir)).orderBy("doc_id")

  def t12UrlExtract(spark: SparkSession, dir: String): DataFrame =
    extractUrls(Tables.documents(spark, dir)).orderBy("doc_id", "url")

  def t20UrlCanonical(spark: SparkSession, dir: String): DataFrame =
    canonicalUrlDedup(Tables.documents(spark, dir))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t11_pii_redact" -> (t11PiiRedact _),
    "t12_url_extract" -> (t12UrlExtract _),
    "t20_url_canonical" -> (t20UrlCanonical _)
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
    "t20_url_canonical" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 5 AS INT)
        |      WHEN 0 THEN 'http://host' || (doc_id % 100) || '.example.com/a/' || (doc_id % 100) || '?x=1&b=2'
        |      WHEN 1 THEN 'HTTP://HOST' || (doc_id % 100) || '.EXAMPLE.COM/a/' || (doc_id % 100) || '?x=1&b=2'
        |      WHEN 2 THEN 'http://host' || (doc_id % 100) || '.example.com:80/a/' || (doc_id % 100) || '?x=1&b=2'
        |      WHEN 3 THEN 'http://host' || (doc_id % 100) || '.example.com/a/' || (doc_id % 100) || '?b=2&x=1#frag'
        |      ELSE 'http://host' || (doc_id % 100) || '.example.com/a/' || (doc_id % 100) || '/?x=1&b=2'
        |    END AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path0,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM aug),
        |canon AS (
        |  SELECT doc_id,
        |    scheme || '://' ||
        |    (CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |          WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |          ELSE hostport END) ||
        |    (CASE WHEN path0 = '' OR path0 = '/' THEN '/'
        |          ELSE regexp_replace(path0, '/+$', '') END) ||
        |    (CASE WHEN query = '' THEN ''
        |          ELSE '?' || array_to_string(list_sort(string_split(query, '&')), '&') END)
        |    AS canonical_url
        |  FROM parts)
        |SELECT canonical_url, CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_variants
        |FROM canon GROUP BY canonical_url ORDER BY canonical_url""".stripMargin,
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
