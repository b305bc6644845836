package graft

import org.apache.spark.sql.functions._

/** Storage layer: partitioned writes with partition pruning (the mechanism
  * that turns a 100 TB scan into a few-file read), plus csv/json/orc
  * round-trips with explicit schemas. */
class StorageSpec extends SparkSpec {

  def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/out"

  test("partitionBy layout prunes partitions at read (PartitionFilters)") {
    val out = tmp("part")
    Tables.events(spark, sf0001)
      .write.partitionBy("event_type").parquet(out)
    val clicks = spark.read.parquet(out).filter(col("event_type") === "click")
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    val expected = Tables.events(spark, sf0001)
      .filter(col("event_type") === "click").count()
    assert(clicks.count() === expected)
    // pruning actually skipped the other partitions' files
    val scanned = clicks.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("event_type=purchase"))
  }

  test("S8 month-partitioned landing prunes to one month at read") {
    // The S8 attachment-landing layout (Ingest.withMonthPartition) writes
    // month=yyyy-MM directories; at 100 TB the whole point is that a
    // single-month read lists one directory. Drive the real helper over the
    // events table (ts standing in for modificationTime), write partitioned,
    // and assert the scan's PartitionFilters prune to exactly that month.
    val out = tmp("s8month")
    // sf0.001 events sit inside one calendar month — spread the landing
    // times across three months so pruning has something to skip
    val landed = graft.sources.Ingest.withMonthPartition(
      Tables.events(spark, sf0001)
        .withColumn("modificationTime",
          add_months(col("ts"), (col("user_id") % 3).cast("int")).cast("timestamp"))
        .drop("ts"))
    landed.write.partitionBy("month").parquet(out)
    val months = landed.select("month").distinct().orderBy("month")
      .collect().map(_.getString(0))
    assert(months.length > 1, s"fixture must span months: ${months.toSeq}")
    val one = spark.read.parquet(out).filter(col("month") === months.head)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(month"), plan)
    assert(one.count() ===
      landed.filter(col("month") === months.head).count())
    // the file listing actually skipped every other month's directory
    val scanned = one.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    months.tail.foreach(m => assert(!scanned.contains(s"month=$m"), m))
  }

  test("ns→µs conversion truncates toward zero (pre-1970 parity with DuckDB)") {
    import spark.implicits._
    // Pinned against DuckDB 1.0.0's empirically-verified TIMESTAMP(NANOS)
    // read: -1 ns → 0 µs, -1500 ns → -1 µs (truncation, NOT floor). A floor
    // implementation would return -1 and -2 here and break oracle parity
    // for any pre-1970 event timestamp.
    val got = Seq(-1L, -999L, -1000L, -1001L, -1500L, 0L, 999L, 1000L, 1500L)
      .toDF("ts").select(Tables.nsToMicrosTrunc("ts").as("us"))
      .as[Long].collect().toSeq
    assert(got === Seq(0L, 0L, -1L, -1L, -1L, 0L, 0L, 1L, 1L))
  }

  test("csv round-trip with explicit schema") {
    val out = tmp("csv")
    val src = Tables.nation(spark, sf0001)
    src.write.option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(src.schema).csv(out)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("json round-trip with explicit schema") {
    val out = tmp("json")
    val src = Tables.region(spark, sf0001)
    src.write.json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(back.orderBy("r_regionkey").collect().toSeq ===
      src.orderBy("r_regionkey").collect().toSeq)
  }

  test("orc round-trip preserves schema and values") {
    val out = tmp("orc")
    val src = Tables.supplier(spark, sf0001)
    src.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.schema === src.schema)
    assert(back.orderBy("s_suppkey").collect().toSeq ===
      src.orderBy("s_suppkey").collect().toSeq)
  }
}
