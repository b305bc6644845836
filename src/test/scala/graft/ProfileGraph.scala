package graft

import org.apache.spark.sql.functions._

/** Manual phase-profiling harness for the iterative graph tier — NOT a
  * ScalaTest suite; run on demand with
  * `sbt "Test/runMain graft.ProfileGraph [sfDir]"` to see where g1/g1b
  * wall-time goes (setup vs per-round vs final sort). Kept in test scope so
  * it never ships in the library jar.
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm codegen/JIT outside the measured region, as Bench does
    graft.operators.Graph.g1PageRank(spark, "/root/testdata/sf0.001").count()
    graft.operators.Graph.g1bPersonalized(spark, "/root/testdata/sf0.001").count()

    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
    val edges = pairs.select(explode(array(
        struct(col("c").as("src"), col("s").as("dst")),
        struct(col("s").as("src"), col("c").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val adj = t("adjacency-build+checkpoint") {
      graft.util.Checkpoints.partitioned(
        graft.operators.Graph.adjacency(
          edges, graft.operators.Graph.defaultMaxAdjLen), "src")
    }
    val n = t("vertex count") { adj.filter(col("part") === 0).count() }
    println(s"PROF n=$n")
    val teleport = (15L * graft.operators.Graph.Scale) / (100L * n)
    var ranks = graft.util.Checkpoints.partitionedLazy(
      adj.filter(col("part") === 0).select(col("src").as("id"),
        lit(graft.operators.Graph.Scale / n).as("r")), "id")
    for (i <- 1 to 5) {
      ranks = graft.util.Checkpoints.partitionedLazy(
        graft.operators.Graph.pageRankStep(adj, ranks, teleport), "id")
      t(s"round $i materialize") { ranks.count() }
    }
    t("final sort+limit") {
      ranks.orderBy(desc("r"), col("id")).limit(100).collect().length
    }
    // ---- g1b phase breakdown (the PRODUCTION chains — pairWeights and
    // the seed-folded adjacency checkpoint — so the phase attribution
    // cannot drift from what g1bPersonalized actually plans) ----
    val pw = t("b: pair-weight agg") {
      val f = graft.operators.Graph.pairWeights(li, ord)
      f.count(); f
    }
    val wedges = pw
      .select(explode(array(
        struct(col("c").as("src"), col("s").as("dst"), col("w")),
        struct(col("s").as("src"), col("c").as("dst"), col("w")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
    val seeds = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select((col("c_custkey") * 2).as("id"))
    val nSeeds = t("b: seed count") { seeds.count() }
    val seedSet = seeds.select(col("id").as("src"), lit(true).as("is_seed"))
    val badj = t("b: adjacency+seed ckpt") {
      graft.util.Checkpoints.partitioned(
        wedges.groupBy("src").agg(
          collect_list(struct(col("dst"), col("w"))).as("adj"),
          sum("w").as("wsum"))
          .join(seedSet, Seq("src"), "left")
          .select(col("src"), col("adj"), col("wsum"),
            coalesce(col("is_seed"), lit(false)).as("is_seed")),
        "src")
    }
    val vertices = badj.select(col("src").as("id"), col("is_seed"))
    val btel = (15L * graft.operators.Graph.Scale) / (100L * nSeeds)
    var branks = graft.util.Checkpoints.partitionedLazy(
      vertices.select(col("id"),
        when(col("is_seed"), lit(graft.operators.Graph.Scale / nSeeds))
          .otherwise(lit(0L)).as("r")), "id")
    for (i <- 1 to 5) {
      branks = graft.util.Checkpoints.partitionedLazy(
        graft.operators.Graph.pprStep(badj, vertices, branks, btel), "id")
      t(s"b: round $i materialize") { branks.count() }
    }
    for (i <- 1 to 3) t(s"g1 end-to-end #$i") {
      graft.operators.Graph.g1PageRank(spark, dir).count()
    }
    for (i <- 1 to 3) t(s"g1b end-to-end #$i") {
      graft.operators.Graph.g1bPersonalized(spark, dir).count()
    }
    spark.stop()
  }
}
