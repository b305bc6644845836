package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class QuantileSampleSpec extends SparkSpec {

  test("sampled quantiles land inside the exact interquartile band") {
    val approx = Analytics.approxQuantileSample(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.75)").as("p75"),
        expr("percentile(l_extendedprice, 0.99)").as("p99"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet === exact.keySet && approx.nonEmpty)
    for ((flag, a) <- approx) {
      val e = exact(flag)
      val p50 = a.getAs[Double]("p50")
      assert(p50 >= e.getAs[Double]("p25") && p50 <= e.getAs[Double]("p75"),
        s"$flag: sampled p50 $p50 outside exact IQR")
      // p90 of the sample must sit in the upper half, below the exact p99
      assert(a.getAs[Double]("p90") > p50 &&
        a.getAs[Double]("p90") <= e.getAs[Double]("p99"), s"$flag")
      // 1/32 hash-threshold sample: within 2x of the expected size
      val m = a.getAs[Long]("sample_n").toDouble
      val expect = e.getAs[Long]("n").toDouble / 32
      assert(m > expect / 2 && m < expect * 2, s"$flag: sample_n $m vs $expect")
    }
  }
}
