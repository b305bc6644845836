package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton) multi-dimensional clustering — the layout trick behind
  * 2-D file skipping at 100 TB: sort by the bit-interleaved key and BOTH
  * dimensions end up range-clustered per file, so parquet min/max stats
  * prune scans for predicates on either (or both) columns, where a 1-D sort
  * gives tight stats on one column and full-range stats on the other.
  *
  * `zValue` is pure bit arithmetic composed from builtin codegen'd
  * expressions (shifts/and/or folds — no UDF, stays inside whole-stage
  * codegen), so it is also engine-portable: the oracle recomputes it term
  * for term ([[zValueSql]] is generated from the same loop).
  *
  * The driver query clusters lineitem by z(l_partkey, l_suppkey), cuts the
  * curve into 64 equal z-ranges (the file boundaries a
  * `repartitionByRange(z).sortWithinPartitions(z)` write would produce),
  * and emits each bucket's bounding box — the exact min/max stats those
  * files would carry. ZOrderSpec pins the curve order and the locality win
  * over a 1-D sort. */
object ZOrder {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions): z = Σⱼ ((x>>j)&1)<<2j | ((y>>j)&1)<<(2j+1). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { j =>
      shiftleft(shiftrightunsigned(x, j).bitwiseAND(lit(1L)), 2 * j)
        .bitwiseOR(shiftleft(shiftrightunsigned(y, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce(_ bitwiseOR _)

  /** The same interleave as SQL text, generated from the same loop so the
    * two engines cannot drift. */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { j =>
      s"((($x >> $j) & 1) << ${2 * j}) | ((($y >> $j) & 1) << ${2 * j + 1})"
    }.mkString("(", " | ", ")")

  val nBuckets = 64L

  /** Driver query: 64 z-range buckets over lineitem's (partkey, suppkey)
    * plane, each with its bounding box. The single corpus-sized pass is the
    * scan + z computation; the bucket cut uses the global max z — a 1-row
    * aggregate broadcast back (never a global window). */
  def zorderCluster(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
      .withColumn("z", zValue(col("x"), col("y")))
    val zmax = keyed.agg(max("z").as("zmax"))
    keyed.crossJoin(broadcast(zmax))
      .withColumn("bucket", expr(s"(z * $nBuckets) div (zmax + 1)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
      .orderBy("bucket")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("zorder_cluster" -> (zorderCluster _))

  def oracle: Map[String, String] = Map(
    "zorder_cluster" ->
      s"""WITH keyed AS (
         |  SELECT l_partkey AS x, l_suppkey AS y,
         |    ${zValueSql("l_partkey", "l_suppkey")} AS z
         |  FROM lineitem),
         |m AS (SELECT MAX(z) AS zmax FROM keyed)
         |SELECT (z * $nBuckets) // (zmax + 1) AS bucket, COUNT(*) AS n,
         |  MIN(x) AS x_min, MAX(x) AS x_max,
         |  MIN(y) AS y_min, MAX(y) AS y_max
         |FROM keyed CROSS JOIN m
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
