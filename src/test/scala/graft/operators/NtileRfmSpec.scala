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

  test("withGlobalPrefixSum equals the one-task window cumsum") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val df = (1L to 500L).map(i => (i, BigDecimal((i * 37) % 97) / 100))
      .toDF("k", "v")
      .select(col("k"), col("v").cast(DecimalType(38, 4)).as("v"))
      .repartition(13)
    val (got, total) = SetOpsWindows.withGlobalPrefixSum(
      spark, df, "v", "cum", Seq(col("v").desc, col("k").asc))
    val w = Window.orderBy(col("v").desc, col("k").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("cum", sum("v").over(w))
      .collect().map(r => r.getLong(0) -> r.getDecimal(2)).toMap
    val gotMap = got.collect().map(r =>
      r.getLong(r.fieldIndex("k")) -> r.getDecimal(r.fieldIndex("cum"))).toMap
    assert(gotMap.view.mapValues(_.stripTrailingZeros).toMap ===
      want.view.mapValues(_.stripTrailingZeros).toMap)
    assert(total.stripTrailingZeros ===
      want.values.map(scala.math.BigDecimal(_)).max.underlying.stripTrailingZeros)
  }

  test("a25 pareto classes are monotone and cover the corpus") {
    val out = SetOpsWindows.a25AbcPareto(spark, sf0001).collect()
    val byClass = out.groupBy(_.getString(3))
    assert(byClass.keySet.subsetOf(Set("A", "B", "C")))
    // every A part's revenue >= every C part's revenue (Pareto monotonicity)
    if (byClass.contains("A") && byClass.contains("C")) {
      val minA = byClass("A").map(_.getDouble(1)).min
      val maxC = byClass("C").map(_.getDouble(1)).max
      assert(minA >= maxC, s"A floor $minA vs C ceiling $maxC")
    }
  }

  test("a26 equi-depth buckets: sizes n/10 +- 1, disjoint increasing ranges") {
    val out = SetOpsWindows.a26EquidepthHist(spark, sf0001).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 10L))
    val sizes = out.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"equi-depth violated: ${sizes.toSeq}")
    // bucket k's hi <= bucket k+1's lo: ranges are ordered and disjoint
    // (equality allowed: ties can straddle a boundary)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2),
        s"bucket ranges overlap: ${a.getLong(0)} hi=${a.getDouble(3)} vs ${b.getLong(0)} lo=${b.getDouble(2)}")
    }
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
