package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Skew salting + bucketed co-located joins — the two shuffle-avoidance
  * techniques AQE can't supply on its own. */
class SkewBucketSpec extends SparkSpec {
  import graft.operators.Aggregates.dec

  test("salted aggregation equals direct aggregation exactly") {
    val li = Tables.lineitem(spark, sf0001)
    val direct = li.groupBy("l_returnflag")
      .agg(sum(dec(col("l_quantity"))).as("s"), count(lit(1)).as("n"),
        min(dec(col("l_extendedprice"))).as("mn"), max(dec(col("l_extendedprice"))).as("mx"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), "l_orderkey", 16,
      aggs = Seq(
        "s" -> Skew.SaltedSum("l_quantity", dec),
        "n" -> Skew.SaltedCount("l_linenumber"),
        "mn" -> Skew.SaltedMin("l_extendedprice", dec),
        "mx" -> Skew.SaltedMax("l_extendedprice", dec)))
    // structural check on the salted plan: two aggregation exchanges
    val p = salted.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
    val got = salted.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(got.keySet === direct.keySet)
    got.keySet.foreach { k =>
      assert(got(k)(0) === direct(k)(0), s"sum for $k")   // exact decimal sums
      assert(got(k)(1) === direct(k)(1), s"count for $k")
      assert(got(k)(2) === direct(k)(2), s"min for $k")
      assert(got(k)(3) === direct(k)(3), s"max for $k")
    }
  }

  test("salted join equals plain inner join exactly") {
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
    val cust = Tables.customer(spark, sf0001).select("c_custkey", "c_name")
    val plain = orders.join(cust, "c_custkey")
      .select("o_orderkey", "c_custkey", "c_name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(orders, cust, "c_custkey", "o_orderkey", 8)
      .select("o_orderkey", "c_custkey", "c_name")
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // a crashed prior run can leave the managed location behind without a
    // catalog entry; clear it or saveAsTable refuses
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("li_b", "ord_b").foreach { t =>
      val dir = new java.io.File(warehouse, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Tables.lineitem(spark, sf0001).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables.orders(spark, sf0001).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_b")
    val joined = spark.table("li_b").join(spark.table("ord_b"),
      col("l_orderkey") === col("o_orderkey"))
    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$p")
      assert(joined.count() === Tables.lineitem(spark, sf0001).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
