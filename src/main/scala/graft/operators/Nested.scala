package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Aggregates.dec

/** Nested-data engineering: build ordered struct-array records (the packed
  * document/training-record shape — one row per entity, detail lines as a
  * sorted nested array) and consume them with higher-order functions
  * WITHOUT re-exploding. The flat output keeps the oracle gate honest:
  * DuckDB computes the same scalars relationally, so the gate proves the
  * nested construction and the array-order contract, not just the final
  * arithmetic.
  *
  * Scale shape: one shuffle (groupBy the record key) builds the arrays;
  * every derived scalar is a map-side higher-order expression over the
  * built array — no second shuffle, no explode-back. Array order is a
  * CONTRACT, not luck: `collect_list` alone is partition-order-dependent,
  * so the struct puts the line number first and `sort_array` pins the
  * total order after collection.
  *
  * Ref: generalizes the reference's per-statement transaction grouping
  * (pdf_parser.py's page → txn list) to the nested-record form columnar
  * training pipelines write.
  */
object Nested {

  /** n1: pack each order's lineitems into a sorted struct array, then read
    * everything back off the array alone — size, an exact decimal fold of
    * the prices (`aggregate` with a decimal accumulator: fold order is
    * array order, decimal addition is exact, so the fold equals SUM), the
    * first/last line's fields positionally, and a filtered count through a
    * lambda predicate. */
  def n1NestedRecords(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        struct(col("l_linenumber").as("ln"), col("l_partkey").as("pk"),
          col("l_quantity").as("qty"), dec(col("l_extendedprice")).as("price_d"))
          .as("item"))
    li.groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("item"))).as("items"))
      .select(
        col("l_orderkey"),
        size(col("items")).as("n_items"),
        aggregate(col("items"), lit(0).cast(DecimalType(28, 4)),
          (acc, x) => (acc + x.getField("price_d")).cast(DecimalType(28, 4)))
          .cast("double").as("total"),
        element_at(col("items"), 1).getField("pk").as("first_part"),
        element_at(col("items"), -1).getField("qty").as("last_qty"),
        size(filter(col("items"), x => x.getField("qty") >= 30))
          .as("n_bulk_lines"))
      .orderBy("l_orderkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "n1_nested_records" -> (n1NestedRecords _)
  )

  /** Oracle: the same scalars computed relationally — COUNT/SUM/argmin/
    * argmax/filtered COUNT per order. A mismatch in ANY column means the
    * nested array was built in the wrong order or the fold drifted.
    * The window ORDER BY lists every struct field in struct-comparison
    * order: the synthetic lineitem has duplicate l_linenumber within an
    * order, and `sort_array` breaks such ties by the remaining fields —
    * an oracle ordering by line number alone would tie-break arbitrarily
    * and disagree on first_part/last_qty. */
  def oracle: Map[String, String] = Map(
    "n1_nested_records" ->
      """WITH r AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |    CAST(l_extendedprice AS DECIMAL(18,4)) AS price_d,
        |    row_number() OVER (PARTITION BY l_orderkey
        |                       ORDER BY l_linenumber, l_partkey,
        |                                l_quantity, price_d) AS rn_asc,
        |    row_number() OVER (PARTITION BY l_orderkey
        |                       ORDER BY l_linenumber DESC, l_partkey DESC,
        |                                l_quantity DESC, price_d DESC)
        |      AS rn_desc
        |  FROM lineitem)
        |SELECT l_orderkey,
        |  CAST(COUNT(*) AS INT) AS n_items,
        |  CAST(SUM(price_d) AS DOUBLE) AS total,
        |  MIN(CASE WHEN rn_asc = 1 THEN l_partkey END) AS first_part,
        |  MIN(CASE WHEN rn_desc = 1 THEN l_quantity END) AS last_qty,
        |  CAST(COUNT(*) FILTER (WHERE l_quantity >= 30) AS INT) AS n_bulk_lines
        |FROM r GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin
  )
}
