package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("transitive merge: a~b and b~c cluster a,b,c; canonical by frequency") {
    // widget/widgit/widgot are pairwise dist ≤ 1-2 (one family);
    // "sprocket" is its own island (dist > 2 from all of them), and "zzz"
    // a short-path singleton (len 3 < the q-gram bound → broadcast
    // fallback side) far from everything.
    val parts = Seq(
      (1L, "widget"), (2L, "widget"), (3L, "widget"),
      (4L, "widgit"), (5L, "widgot"),
      (6L, "sprocket"), (7L, "sprocket"),
      (8L, "zzz")
    ).toDF("p_partkey", "p_name")
    val dir = java.nio.file.Files.createTempDirectory("erspec").toString
    parts.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = EntityResolution.er1EntityClusters(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    // widget family: one cluster labeled by the min name, canonical=widget
    // (3 parts beats 1) — transitivity must pull all three variants in
    val widgetCluster = out("widget")._1
    assert(out("widgit")._1 == widgetCluster && out("widgot")._1 == widgetCluster)
    assert(Seq("widget", "widgit", "widgot").forall(out(_)._2 == 3L))
    assert(Seq("widget", "widgit", "widgot").forall(out(_)._4 == "widget"))
    // the sprocket island must NOT merge into the widget family
    assert(out("sprocket")._1 == "sprocket" && out("sprocket")._2 == 1L)
    assert(out("zzz")._1 == "zzz" && out("zzz")._2 == 1L && out("zzz")._4 == "zzz")
    out.values.groupBy(_._1).foreach { case (_, members) =>
      assert(members.map(_._2).toSet.size == 1, "cluster size must agree")
      assert(members.map(_._4).toSet.size == 1, "canonical must agree")
    }
  }

  test("er1 on sf0.001: every name appears once; cluster ids are members") {
    val rows = EntityResolution.er1EntityClusters(spark, sf0001).collect()
    val names = rows.map(_.getString(0))
    assert(names.distinct.length == names.length, "one row per distinct name")
    val byCluster = rows.groupBy(_.getString(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.exists(_.getString(0) == cid),
        s"cluster id $cid must itself be a member name")
      assert(members.forall(_.getLong(2) == members.length),
        s"cluster_size must equal the member count for $cid")
      // canonical is the member with max n_parts (min name on ties)
      val want = members.map(r => (r.getString(0), r.getLong(3)))
        .sortBy { case (n, c) => (-c, n) }.head._1
      assert(members.forall(_.getString(4) == want))
    }
  }
}
