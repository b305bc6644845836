package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Aggregation-tier operators (SURVEY.md §2.4, §2.5, §2.6).
  *
  * Cross-engine determinism convention used by every oracle-checked query in
  * this library: monetary/double measures are cast to DECIMAL **before**
  * aggregation so the sum is exact and associative (partial-aggregation order
  * can't change the result), then the final value is cast back to DOUBLE
  * (a well-defined nearest-double conversion both Spark and DuckDB agree on).
  * Every query ends with a total-order `orderBy` over unique keys so row
  * order is deterministic too.
  */
object Aggregates {

  /** Money-exact cast: DECIMAL(18,4) holds any value in the test schema and
    * sums without overflow at 100 TB scale factors (Spark widens sum results
    * to DECIMAL(28,4) automatically). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** A5/A8 analog + TPC-H Q1 shape: pricing summary over the `lineitem`
    * fact. Partial (map-side) aggregation makes this a single shuffle of
    * |groups| rows per partition — scale-safe at any SF.
    * Ref: counts at main.py:40-58, accumulate at main.py:103. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        cast_double(sum(dec(col("l_quantity")))).as("sum_qty"),
        cast_double(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        cast_double(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private def cast_double(c: Column): Column = c.cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1PricingSummary _)
  )

  def oracle: Map[String, String] = Map(
    "q1_agg" -> q1PricingSummarySql
  )
}
