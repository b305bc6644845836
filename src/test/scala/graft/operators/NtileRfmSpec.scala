package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

/** Pins [[SetOpsWindows.ntileFromRank]]'s boundary arithmetic to Spark's own
  * `ntile` window (the reference implementation of the standard NTILE
  * definition), including the uneven-bucket cases n % k != 0 — and the
  * scale contract of the a23 RFM query (no one-task global window). */
class NtileRfmSpec extends SparkSpec {

  test("ntileFromRank matches the ntile window for uneven n % k") {
    import spark.implicits._
    for (n <- Seq(3L, 7L, 10L, 23L); k <- Seq(2, 4, 5)) {
      val df = (1L to n).toDF("rank")
      val viaWindow = df
        .withColumn("b", ntile(k).over(Window.orderBy("rank")).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaArith = df
        .withColumn("b", SetOpsWindows.ntileFromRank(col("rank"), n, k))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaArith === viaWindow, s"n=$n k=$k")
    }
  }

  test("ntileFromRank with fewer rows than buckets: bucket = rank") {
    import spark.implicits._
    val df = (1L to 3L).toDF("rank")
      .withColumn("b", SetOpsWindows.ntileFromRank(col("rank"), 3L, 5))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("a23_rfm plans no single-partition global window") {
    val plan = SetOpsWindows.a23Rfm(spark, sf0001)
      .queryExecution.executedPlan.toString
    // a bare Window.orderBy would appear as an Exchange SinglePartition
    // feeding a Window node; the rank attach must stay range-partitioned
    assert(!plan.contains("Window"), "global ntile must not use a window")
    assert(plan.contains("rangepartitioning"),
      "rank attach should range-partition on the score dimension")
  }

  test("rfm scores are quintiles: each score bucket holds n/5 +- 1 customers") {
    val out = SetOpsWindows.a23Rfm(spark, sf0001)
    val n = out.count()
    for (c <- Seq("r_score", "f_score", "m_score")) {
      val sizes = out.groupBy(c).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sizes.keySet === (1L to 5L).toSet, s"$c covers 1..5")
      val (lo, hi) = (n / 5, n / 5 + (if (n % 5 == 0) 0 else 1))
      sizes.values.foreach(s => assert(s == lo || s == hi, s"$c sizes $sizes"))
    }
  }
}
