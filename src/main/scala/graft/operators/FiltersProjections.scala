package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Aggregates.dec

/** Filter / projection / scalar-function tier (SURVEY.md §2.2, §2.8).
  *
  * Each query re-expresses one reference operator over the star schema. All
  * predicates are plain `Column` expressions so Catalyst pushes them into the
  * parquet scan (verify: `PushedFilters` in `.explain("formatted")`) — the
  * Spark-native form of the reference's "cheap filter before expensive parse"
  * trick (pdf_parser.py:108-110).
  */
object FiltersProjections {

  /** F1 page predicate analog — substring containment filter, pushed to scan.
    * Ref: pdf_parser.py:108-110 (`"Transaction Details" in page_text`). */
  def f01Contains(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").contains("table"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  /** F2 row-arity predicate analog — minimum token count.
    * Ref: pdf_parser.py:332-333 (`len(words) >= 4`). */
  def f02Arity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast("bigint"))
      .filter(col("n_tokens") >= 40)
      .select(col("doc_id"), col("n_tokens"))
      .orderBy("doc_id")

  /** F3 shape predicate analog — anchored regex match on a key column.
    * Ref: pdf_parser.py:336-339 (`re.match(r'^\d{2}/\d{2}$', ...)`). */
  def f03RegexShape(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .filter(col("s_name").rlike("^Supplier#\\d{9}$") && col("s_suppkey") % 7 === 0)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy("s_suppkey")

  /** F5 payment anti-filter analog — negated upper-case containment.
    * Ref: pdf_parser.py:368-370 (`'PAYMENT THANK YOU' in description.upper()`). */
  def f05AntiContains(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(!upper(col("text")).contains("SPARK") && col("lang") === "en")
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** F6 min-length predicate. Ref: pdf_parser.py:372-373. */
  def f06MinLength(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) >= 3 && col("n_chars") < 200)
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")

  /** P2 amount normalization + P3 credit-sign classification + F4 amount
    * shape predicate, on money strings synthesized from `o_totalprice`.
    * Ref: pdf_parser.py:385-395 (strip `$`/`,` + float cast),
    * pdf_parser.py:355-377 (negate credits), pdf_parser.py:344-353 (shape). */
  def p02MoneyParse(spark: SparkSession, dir: String): DataFrame = {
    val moneyStr = concat(lit("$"), col("o_totalprice").cast(DecimalType(12, 2)).cast("string"))
    Tables.orders(spark, dir)
      .withColumn("money_str", moneyStr)
      .withColumn("is_amount_shaped", col("money_str").rlike("^\\$[\\d,]+\\.\\d{2}$"))
      .withColumn("parsed", regexp_replace(col("money_str"), "[$,]", "").cast(DecimalType(12, 2)))
      .withColumn("signed_amount",
        when(col("o_orderstatus") === "F", -col("parsed")).otherwise(col("parsed")).cast("double"))
      .select(col("o_orderkey"), col("money_str"), col("is_amount_shaped"), col("signed_amount"))
      .orderBy("o_orderkey")
  }

  /** P5 display-string projection over a broadcast dim-dim join.
    * Ref: excel_builder.py:108 (`f"{code} - {desc}"`). */
  def p05DisplayConcat(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey"), concat_ws(" - ", col("n_name"), col("r_name")).as("display"))
      .orderBy("n_nationkey")
  }

  /** P6 cell projection analog — trim + split + positional extract.
    * Ref: pdf_parser.py:474-478 (cells[0]→code, cells[1]→name). */
  def p06SplitExtract(spark: SparkSession, dir: String): DataFrame = {
    val parts = split(trim(col("p_name")), " ")
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        element_at(parts, 1).as("adjective"),
        element_at(parts, -1).as("noun"))
      .orderBy("p_partkey")
  }

  /** Scalar-function suite (§2.8): JSON extract, upper/lower, date format,
    * extract, floor bucketing, conditional negation — one wide projection.
    * Ref: config.py:32 (json), pdf_parser.py:369 (upper), email_fetcher.py:39
    * (strftime), pdf_parser.py:377 (negation). */
  def scalarSuite(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        upper(col("event_type")).as("etype_upper"),
        date_format(col("ts"), "yyyy-MM-dd").as("day_str"),
        hour(col("ts")).cast("bigint").as("hour_of_day"),
        floor(col("value") / 10).cast("bigint").as("value_bucket"),
        when(col("event_type") === "error", -col("value")).otherwise(col("value")).as("signed_value"))
      .orderBy("event_id")

  /** Error-safe cast suite (§2.8 continued): `try_cast`/`try_divide` — the
    * ANSI-adjacent surface that turns malformed input into NULLs instead of
    * task failures, which is what a 100 TB ingest of dirty text demands (a
    * single bad row must not kill a 10⁵-task stage). Mixed valid/invalid
    * targets so both branches are exercised; division-by-zero parity is
    * NULL in both engines. */
  def scalarTry(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        expr("try_cast(split_part(p_brand, '#', 2) AS INT)").as("brand_num"),
        expr("try_cast(p_type AS INT)").as("bad_int"),
        expr("try_divide(p_size, p_partkey % 7)").as("size_ratio"),
        expr("try_cast(p_name AS DATE)").as("bad_date"),
        expr("try_cast(concat('2024-', cast(p_partkey % 15 as string), '-01') AS DATE)")
          .as("maybe_date"))
      .orderBy("p_partkey")

  /** Version-compare via array higher-order functions: split a version
    * string into int components, compare lexicographically.
    * Ref: update_checker.py:89-96. */
  def versionCompare(spark: SparkSession, dir: String): DataFrame = {
    val v = concat(col("p_size").cast("string"), lit("."),
      (col("p_partkey") % 10).cast("string"), lit("."),
      (col("p_partkey") % 100).cast("string"))
    val comps = transform(split(col("version"), "\\."), x => x.cast("int"))
    val c0 = element_at(col("comps"), 1)
    val c1 = element_at(col("comps"), 2)
    val c2 = element_at(col("comps"), 3)
    Tables.part(spark, dir)
      .withColumn("version", v)
      .withColumn("comps", comps)
      .withColumn("cmp_latest",
        when(c0 =!= 25, when(c0 > 25, 1).otherwise(-1))
          .when(c1 =!= 5, when(c1 > 5, 1).otherwise(-1))
          .when(c2 =!= 50, when(c2 > 50, 1).otherwise(-1))
          .otherwise(0))
      .select(col("p_partkey"), col("version"), col("cmp_latest"))
      .orderBy("p_partkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f01_contains_filter" -> (f01Contains _),
    "f02_arity_filter" -> (f02Arity _),
    "f03_regex_shape" -> (f03RegexShape _),
    "f05_anti_contains" -> (f05AntiContains _),
    "f06_min_length" -> (f06MinLength _),
    "p02_money_parse" -> (p02MoneyParse _),
    "p05_display_concat" -> (p05DisplayConcat _),
    "p06_split_extract" -> (p06SplitExtract _),
    "scalar_suite" -> (scalarSuite _),
    "scalar_try" -> (scalarTry _),
    "version_compare" -> (versionCompare _)
  )

  def oracle: Map[String, String] = Map(
    "scalar_try" ->
      """SELECT p_partkey,
        |  TRY_CAST(split_part(p_brand, '#', 2) AS INT) AS brand_num,
        |  TRY_CAST(p_type AS INT) AS bad_int,
        |  p_size / (p_partkey % 7) AS size_ratio,
        |  TRY_CAST(p_name AS DATE) AS bad_date,
        |  TRY_CAST('2024-' || CAST(p_partkey % 15 AS VARCHAR) || '-01' AS DATE)
        |    AS maybe_date
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f01_contains_filter" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE contains(text, 'table') ORDER BY doc_id""".stripMargin,
    "f02_arity_filter" ->
      """SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens
        |FROM documents WHERE len(string_split_regex(trim(text), '\s+')) >= 40
        |ORDER BY doc_id""".stripMargin,
    "f03_regex_shape" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |WHERE regexp_matches(s_name, '^Supplier#\d{9}$') AND s_suppkey % 7 = 0
        |ORDER BY s_suppkey""".stripMargin,
    "f05_anti_contains" ->
      """SELECT doc_id, lang FROM documents
        |WHERE NOT contains(upper(text), 'SPARK') AND lang = 'en'
        |ORDER BY doc_id""".stripMargin,
    "f06_min_length" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE length(trim(text)) >= 3 AND n_chars < 200 ORDER BY doc_id""".stripMargin,
    "p02_money_parse" ->
      """WITH m AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         '$' || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS money_str
        |  FROM orders)
        |SELECT o_orderkey, money_str,
        |  regexp_matches(money_str, '^\$[\d,]+\.\d{2}$') AS is_amount_shaped,
        |  CAST(CASE WHEN o_orderstatus = 'F'
        |       THEN -CAST(regexp_replace(money_str, '[$,]', '', 'g') AS DECIMAL(12,2))
        |       ELSE CAST(regexp_replace(money_str, '[$,]', '', 'g') AS DECIMAL(12,2)) END
        |       AS DOUBLE) AS signed_amount
        |FROM m ORDER BY o_orderkey""".stripMargin,
    "p05_display_concat" ->
      """SELECT n_nationkey, n_name || ' - ' || r_name AS display
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "p06_split_extract" ->
      """SELECT p_partkey,
        |  string_split(trim(p_name), ' ')[1] AS adjective,
        |  string_split(trim(p_name), ' ')[-1] AS noun
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_suite" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  upper(event_type) AS etype_upper,
        |  strftime(ts, '%Y-%m-%d') AS day_str,
        |  CAST(hour(ts) AS BIGINT) AS hour_of_day,
        |  CAST(floor(value / 10) AS BIGINT) AS value_bucket,
        |  CASE WHEN event_type = 'error' THEN -value ELSE value END AS signed_value
        |FROM events ORDER BY event_id""".stripMargin,
    "version_compare" ->
      """WITH v AS (
        |  SELECT p_partkey,
        |    CAST(p_size AS VARCHAR) || '.' || CAST(p_partkey % 10 AS VARCHAR)
        |      || '.' || CAST(p_partkey % 100 AS VARCHAR) AS version
        |  FROM part),
        |c AS (SELECT p_partkey, version,
        |  CAST(string_split(version, '.')[1] AS INT) AS c0,
        |  CAST(string_split(version, '.')[2] AS INT) AS c1,
        |  CAST(string_split(version, '.')[3] AS INT) AS c2 FROM v)
        |SELECT p_partkey, version,
        |  CASE WHEN c0 <> 25 THEN CASE WHEN c0 > 25 THEN 1 ELSE -1 END
        |       WHEN c1 <> 5  THEN CASE WHEN c1 > 5  THEN 1 ELSE -1 END
        |       WHEN c2 <> 50 THEN CASE WHEN c2 > 50 THEN 1 ELSE -1 END
        |       ELSE 0 END AS cmp_latest
        |FROM c ORDER BY p_partkey""".stripMargin
  )
}
