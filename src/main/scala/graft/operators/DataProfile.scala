package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-column data profiling — the "analyze my table" surface every
  * training-data pipeline runs before trusting a corpus: for each profiled
  * column, row count, null count, exact distinct count, and lexicographic
  * min/max of the stringified values. One melt pass over the table, never
  * one scan per column.
  *
  * 100 TB shape: the melt explodes each row into ncols (column, value)
  * pairs, but the FIRST aggregation keys on (column, value) — high
  * cardinality and partial-agg combinable, so the wide shuffle carries only
  * distinct pairs, not the exploded table. The second aggregation reduces
  * ncols keys over already-collapsed rows. Exact distinct counts come from
  * that two-level shape instead of n parallel COUNT(DISTINCT col) in one
  * Aggregate, which would Expand the input n-fold and push the full table
  * through the shuffle once per column (PlanSpec pins no Expand, exactly
  * two hash exchanges).
  */
object DataProfile {

  /** Profile the given (name, expression) columns of `df`. Expressions are
    * stringified (the melted array needs one type); numeric columns should
    * arrive pre-cast to a fixed-scale decimal so both engines print the
    * same digits, timestamps as epoch micros. */
  def profile(pairs: Seq[(String, Column)], df: DataFrame): DataFrame = {
    val melted = df.select(explode(array(pairs.map { case (n, c) =>
      struct(lit(n).as("column_name"), c.cast("string").as("value"))
    }: _*)).as("p")).select("p.column_name", "p.value")
    val perValue = melted.groupBy("column_name", "value")
      .agg(count(lit(1)).as("cnt"))
    perValue.groupBy("column_name").agg(
      sum("cnt").as("n_rows"),
      coalesce(sum(when(col("value").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
      count(when(col("value").isNotNull, lit(1))).as("n_distinct"),
      min("value").as("min_value"),
      max("value").as("max_value"))
  }

  private val profiledCols =
    Seq("event_id", "user_id", "event_type", "value", "ts_us", "non_click_type")

  /** Driver query: profile the events table — ids, a category, a decimal
    * measure, the timestamp (as epoch µs), and a derived nullable column so
    * the null-count path is exercised on real rows. */
  def dqProfile(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    profile(Seq(
      "event_id" -> col("event_id"),
      "user_id" -> col("user_id"),
      "event_type" -> col("event_type"),
      "value" -> col("value").cast("decimal(18,4)"),
      "ts_us" -> unix_micros(col("ts")),
      "non_click_type" ->
        when(col("event_type") === "click", lit(null)).otherwise(col("event_type"))
    ), ev).orderBy("column_name")
  }

  /** Referential-integrity audit across the star schema: for each
    * FK relationship, total fact rows, orphan rows (left anti join), and
    * distinct orphan keys. Anti joins are the scale-correct mechanism
    * (broadcast for small dims, shuffle for fact-fact — planner's choice);
    * counts aggregate before the union, so the result frame is
    * relationship-sized. The audit every pipeline runs before trusting a
    * join's completeness. */
  def dqRefIntegrity(spark: SparkSession, dir: String): DataFrame = {
    def audit(rel: String, fact: DataFrame, fk: String,
              dim: DataFrame, pk: String): DataFrame = {
      val orphans = fact.select(col(fk))
        .join(dim.select(col(pk).as(fk)), Seq(fk), "left_anti")
      val totals = fact.agg(count(lit(1)).as("n_rows"))
      orphans.agg(count(lit(1)).as("n_orphans"),
          countDistinct(col(fk)).as("n_orphan_keys"))
        .crossJoin(totals)
        .select(lit(rel).as("relationship"), col("n_rows"),
          col("n_orphans"), col("n_orphan_keys"))
    }
    val li = graft.Tables.lineitem(spark, dir)
    val o = graft.Tables.orders(spark, dir)
    val c = graft.Tables.customer(spark, dir)
    val s = graft.Tables.supplier(spark, dir)
    val n = graft.Tables.nation(spark, dir)
    // the generator keeps the star schema RI-clean (the four real
    // relationships must audit to zero orphans); the even-key "stale dim
    // snapshot" guarantees a non-vacuous orphan path in the same run
    audit("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey")
      .unionByName(audit("lineitem.l_suppkey->supplier", li, "l_suppkey", s, "s_suppkey"))
      .unionByName(audit("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"))
      .unionByName(audit("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"))
      .unionByName(audit("lineitem->orders_even_snapshot", li, "l_orderkey",
        o.filter(col("o_orderkey") % 2 === 0), "o_orderkey"))
      .orderBy("relationship")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("dq_profile" -> (dqProfile _),
        "dq_ref_integrity" -> (dqRefIntegrity _))

  def oracle: Map[String, String] = {
    val perCol = profiledCols.map { c =>
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  MIN($c) AS min_value, MAX($c) AS max_value FROM s""".stripMargin
    }.mkString("\nUNION ALL\n")
    Map("dq_ref_integrity" -> {
      def rel(name: String, fact: String, fk: String, dim: String,
              pk: String, dimFilter: String = ""): String =
        s"""SELECT '$name' AS relationship,
           |  (SELECT COUNT(*) FROM $fact) AS n_rows,
           |  COUNT(*) AS n_orphans, COUNT(DISTINCT $fk) AS n_orphan_keys
           |FROM $fact f WHERE NOT EXISTS
           |  (SELECT 1 FROM $dim d WHERE d.$pk = f.$fk$dimFilter)""".stripMargin
      Seq(
        rel("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        rel("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        rel("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        rel("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        rel("lineitem->orders_even_snapshot", "lineitem", "l_orderkey", "orders",
          "o_orderkey", " AND d.o_orderkey % 2 = 0")
      ).mkString("", "\nUNION ALL\n", "\nORDER BY relationship")
    },
    "dq_profile" ->
      s"""WITH s AS (
         |  SELECT CAST(event_id AS VARCHAR) AS event_id,
         |         CAST(user_id AS VARCHAR) AS user_id,
         |         event_type,
         |         CAST(CAST(value AS DECIMAL(18,4)) AS VARCHAR) AS value,
         |         CAST(epoch_us(ts) AS VARCHAR) AS ts_us,
         |         nullif(event_type, 'click') AS non_click_type
         |  FROM events)
         |$perCol
         |ORDER BY column_name""".stripMargin)
  }
}
