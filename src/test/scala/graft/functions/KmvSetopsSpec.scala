package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV k-min-hash sets and the union/Jaccard/intersection estimators. */
class KmvSetopsSpec extends SparkSpec {
  import spark.implicits._

  test("kmv_minhashes returns the sorted k smallest, partition-invariant") {
    val ids = (1 to 5000).map(_.toString)
    def mins(parts: Int): Seq[Long] =
      ids.toDF("v").repartition(parts)
        .agg(KmvCatalyst.kmv_minhashes(col("v")))
        .head().getSeq[Long](0)
    val a = mins(1)
    val b = mins(13)
    assert(a == b, "merge must be exact under any partitioning")
    assert(a.length == 256)
    assert(a == a.sorted, "must be ascending")
    // must be exactly the 256 smallest of all hashes
    val all = ids.map(KmvSketch.hash60).distinct.sorted.take(256)
    assert(a == all)
  }

  test("below k the set is exact and complete") {
    val got = (1 to 100).map(_.toString).toDF("v")
      .agg(KmvCatalyst.kmv_minhashes(col("v"))).head().getSeq[Long](0)
    assert(got.length == 100)
    assert(got.toSet == (1 to 100).map(i => KmvSketch.hash60(i.toString)).toSet)
  }

  test("set-algebra estimates track exact overlap within sketch error") {
    // Two overlapping ranges: |A|=3000, |B|=3000, |A∩B|=1000, |A∪B|=5000.
    val a = (1 to 3000).map(i => s"u$i")
    val b = (2001 to 5000).map(i => s"u$i")
    val df = a.map(("F", _)) ++ b.map(("O", _))
    val sk = df.toDF("s", "v")
      .agg(
        KmvCatalyst.kmv_minhashes(when(col("s") === "F", col("v"))).as("a"),
        KmvCatalyst.kmv_minhashes(when(col("s") === "O", col("v"))).as("b"))
      .withColumn("m", expr("slice(array_sort(array_union(a, b)), 1, 256)"))
    val row = sk.select(
      (lit(255.0) / (element_at(col("m"), 256).cast("double") / lit(1152921504606846976.0))).as("eu"),
      (size(array_intersect(array_intersect(col("m"), col("a")), col("b")))
        .cast("double") / size(col("m")).cast("double")).as("rho"))
      .head()
    val (eu, rho) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(eu - 5000) < 0.25 * 5000, s"union est $eu")
    assert(math.abs(rho * eu - 1000) < 0.40 * 1000, s"intersect est ${rho * eu}")
  }
}
