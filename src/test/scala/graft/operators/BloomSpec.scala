package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join: no false negatives ever (every inserted key
  * probes true), the prefilter genuinely prunes, and the final output is
  * exactly the plain semi join. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key probes true") {
    val keys = (1L to 2000L by 7).toDF("k")
    val words = Joins.bloomBuild(keys, "k")
    val misses = keys.filter(!Joins.bloomMightContain(words, col("k"))).count()
    assert(misses === 0)
  }

  test("filter prunes most non-members at documented geometry") {
    val keys = (1L to 3000L).toDF("k")
    val words = Joins.bloomBuild(keys, "k")
    val nonMembers = (100001L to 110000L).toDF("k")
    val fp = nonMembers.filter(Joins.bloomMightContain(words, col("k"))).count()
    // load ~0.05, k=2 → fp ≈ 0.2%; allow 10× slack before calling it broken
    assert(fp < 200, s"false-positive count $fp of 10000")
  }

  test("j07 equals the plain semi join exactly") {
    val li = Tables.lineitem(spark, sf0001)
    val hot = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 450000.0).select(col("o_orderkey"))
    val plain = li
      .join(hot.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSet
    val got = Joins.j07BloomSemi(spark, sf0001)
      .select("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSet
    assert(got === plain)
    assert(got.nonEmpty)
  }
}
