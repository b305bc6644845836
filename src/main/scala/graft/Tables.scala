package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver star schema (TESTDATA.md). One parquet file per
  * table under `$dir/`. All query functions take the sf dir explicitly so the
  * same code runs at any scale factor.
  *
  * Scale note: at 100 TB the fact tables (`lineitem`, `orders`, `events`,
  * `documents`) would be multi-file, partitioned datasets; `spark.read
  * .parquet(dir)` handles that transparently (file listing + partition
  * pruning). Dimensions (`region`, `nation`, `supplier`, `customer`, `part`)
  * stay broadcast-size by design — every join in this library that touches
  * them is written broadcast-side-right.
  */
object Tables {
  val factNames = Seq("lineitem", "orders", "events", "documents", "embeddings")
  val dimNames  = Seq("region", "nation", "customer", "supplier", "part")
  val all: Seq[String] = dimNames ++ factNames

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects. Sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * (see GraftSession) so it arrives as nanos-since-epoch LongType; convert
    * to µs TimestampType by truncation — exactly how DuckDB (µs-native)
    * reads the same file, so oracle comparisons agree to the microsecond. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(nsToMicrosFloor("ts")))
    else raw
  }

  /** Floor division ns→µs. `ts div 1000` truncates toward zero, which for
    * pre-1970 nanos lands one µs late vs DuckDB's floor conversion; the
    * modular form floors without a double-precision detour (nanos since
    * epoch exceed 2^53, so `floor(ts / 1000)` would round). */
  def nsToMicrosFloor(colName: String): org.apache.spark.sql.Column =
    expr(s"($colName - (($colName % 1000) + 1000) % 1000) div 1000")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
