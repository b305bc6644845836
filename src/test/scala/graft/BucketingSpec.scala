package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the zero-shuffle path for repeated big-big
  * joins at 100 TB. Bucketing is declared once at write time (`bucketBy` on
  * the join key) and every later join or aggregate on that key reads the
  * co-located layout instead of shuffling — the standard warehouse pattern
  * for a fact table joined on the same key by many downstream queries.
  * These tests pin the three planner payoffs: join without Exchange,
  * aggregate without Exchange, and bucket pruning on key-equality filters.
  * (local[4] writes 8 buckets; on a cluster the bucket count scales with
  * the data, the plan shape is identical.) */
class BucketingSpec extends SparkSpec {

  private def noBroadcast[T](f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, prev)
  }

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  // one-time: write orders/lineitem bucketed by the join key into a temp
  // external location (in-memory catalog; no Hive needed)
  private lazy val setup: Unit = {
    val dir = java.nio.file.Files.createTempDirectory("buckets")
    Tables.orders(spark, sf0001).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", dir.resolve("orders_b").toString)
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, sf0001).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", dir.resolve("lineitem_b").toString)
      .mode("overwrite").saveAsTable("lineitem_b")
  }

  test("bucketed fact-fact join needs no Exchange on either side") {
    setup
    noBroadcast {
      val j = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      val p = plan(j)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("Exchange"),
        s"co-located bucketed join should read both sides in place:\n$p")
      assert(p.contains("Bucketed: true"), p)
      // and it computes the same thing as the shuffled parquet join
      val plainCount = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() === plainCount)
    }
  }

  test("aggregate on the bucket key reuses the on-disk partitioning") {
    setup
    val a = spark.table("lineitem_b").groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"))
    val p = plan(a)
    assert(!p.contains("Exchange hashpartitioning"),
      s"groupBy on the bucket key should not shuffle:\n$p")
  }

  test("key-equality filters prune to a single bucket at scan time") {
    setup
    // A filter-only query has no operator that needs the bucket
    // distribution, so DisableUnnecessaryBucketedScan would flip the scan
    // to "Bucketed: false" — which also discards the bucket-pruning
    // filter. Pin auto-bucketed-scan off to exercise the pruning path a
    // real warehouse keeps for point lookups on the bucket key.
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val someKey = spark.table("orders_b").select(min("o_orderkey")).first().getLong(0)
      val f = spark.table("orders_b").filter(col("o_orderkey") === someKey)
      val p = plan(f)
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected bucket pruning on the equality filter:\n$p")
      assert(f.count() >= 1)
    } finally spark.conf.set(key, prev)
  }
}
