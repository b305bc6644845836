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

  private val countMemo = scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  /** Row count of a driver table, memoized per (dir, table) — queries that
    * size themselves from the corpus (LSH code width, IVF nlist) would
    * otherwise pay a counting job on every invocation in a long-lived
    * Verify/Bench session. The test tables are immutable, so the memo is
    * safe for the JVM's lifetime. */
  def cachedCount(spark: SparkSession, dir: String, name: String): Long =
    countMemo.getOrElseUpdate((dir, name), load(spark, dir, name).count())

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  /** `events.ts` has shipped in two parquet encodings across driver data
    * generations, both normalized here to µs `TimestampType` so every
    * downstream `unix_micros`/watermark/window sees one type:
    *  - TIMESTAMP(NANOS), which Spark's vectorized reader rejects; sessions
    *    set `spark.sql.legacy.parquet.nanosAsLong` (see GraftSession) so it
    *    arrives as nanos-since-epoch LongType → truncate to µs, exactly how
    *    DuckDB (µs-native) reads the same file;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads as
    *    TIMESTAMP_NTZ → cast to TimestampType. The session timezone is
    *    pinned to UTC (GraftSession), so the cast preserves the wall-clock
    *    micros bit-for-bit — the same naive value DuckDB's TIMESTAMP sees —
    *    and oracle comparisons agree to the microsecond either way. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(nsToMicrosTrunc("ts")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      case other =>
        // Fail at load, not at some downstream unix_micros/window call: an
        // unrecognized encoding (TIMESTAMP millis, raw INT64 with the
        // nanosAsLong flag unset, ...) means the normalization contract
        // above doesn't hold and every events oracle would silently desync.
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected LongType " +
            "(TIMESTAMP(NANOS) via nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }

  /** ns→µs the way DuckDB does it: **truncation toward zero**. Verified
    * empirically against DuckDB 1.0.0 reading TIMESTAMP(NANOS) parquet
    * (-1 ns → 0 µs, -1500 ns → -1 µs, +1500 ns → 1 µs), which is exactly
    * SQL `div` semantics. Do NOT "fix" this to floor division — floor lands
    * pre-1970 sub-µs instants one µs earlier than the oracle engine and
    * desyncs every events-based oracle query. */
  def nsToMicrosTrunc(colName: String): org.apache.spark.sql.Column =
    expr(s"$colName div 1000")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
