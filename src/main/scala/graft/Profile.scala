package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiler: times sub-stages of the heavy queries. Not part of the
  * driver contract. */
object Profile {
  def t(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"${(System.nanoTime() - t0) / 1e9}%8.2fs  $name ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.headOption.contains("g2")) { profileG2(dir); return }
    if (args.headOption.contains("g1b")) { profileG1b(dir); return }
    if (args.headOption.contains("d4vol")) { profileD4Volumes(dir); return }
    val spark = GraftSession(s"local[8]", "8")
    import graft.text.TextAnalysis.{shingles, tokens}

    val docs = Tables.documents(spark, dir)
    docs.count()  // warm

    args.headOption.foreach {
      case "shj" => spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      case _ =>
    }

    val sh = docs.select(col("doc_id"), explode(shingles(tokens(col("text")))).as("s"))
    t("shingleRows")(sh)
    t("shingle freq")(sh.groupBy("s").count())
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    t("naive inverted join + count")(
      sh.toDF("a_id", "s").join(sh.toDF("b_id", "s2"),
          col("s") === col("s2") && col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("common")))
    t("d2 plain (inverted+verify)")(graft.dedup.Dedup.ngramJaccardPairs(docs, 0.5))
    t("d2 prefix-filtered")(graft.dedup.Dedup.ngramJaccardPairsPrefix(docs, 0.5))
    t("d3 bands")(graft.dedup.Dedup.minHashBands(
      graft.text.TextAnalysis.shingleRows(docs)))
    t("d3 full")(graft.dedup.Dedup.minHashLshPairs(docs, 0.5))
    val simCodes = graft.dedup.Dedup.simHash(docs)
    t("d4 codes")(simCodes)
    t("d4 banded candidates (vs n(n-1)/2 all-pairs)")(
      graft.dedup.Dedup.simHashCandidates(simCodes, 10))
    t("d4 full")(graft.dedup.Dedup.simHashPairs(docs, 10))
    t("s2 codes")(graft.similarity.Knn.srpCodes(Tables.embeddings(spark, dir)))
    t("s2 full")(graft.similarity.Knn.lshTopK(Tables.embeddings(spark, dir), 5))
    t("d5 neardup")(graft.similarity.Knn.cosineNearDupPairs(Tables.embeddings(spark, dir), 0.3))
    t("a07 coa")(graft.operators.Aggregates.coaClassify(spark, dir))
    t("j02 twophase")(graft.operators.Joins.j02TwoPhaseEnrich(spark, dir))
    spark.stop()
  }

  /** Candidate-volume report behind Dedup.chooseSimHashR: exact
    * Σ C(bucket,2) join-row counts for r=1 vs r=2 at both thresholds. */
  def profileD4Volumes(dir: String): Unit = {
    val spark = GraftSession()
    val docs = Tables.documents(spark, dir)
    val codes = graft.dedup.Dedup.simHash(docs).persist()
    val n = codes.count()
    for (k <- Seq(10, 3); r <- Seq(1, 2)) {
      val agg = graft.dedup.Dedup.simHashCandidatesRaw(codes, k, r)
      println(s"n=$n maxHamming=$k r=$r inputRows=${agg._2} joinRows=${agg._1}")
    }
    spark.stop()
  }

  /** Stage-by-stage timing of g1b_ppr at bench parallelism. */
  def profileG1b(dir: String): Unit = {
    val spark = GraftSession()
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    li.count(); ord.count() // warm
    val pw = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .agg(countDistinct("o_orderkey").as("w"))
    t("pw (pair weights)")(pw)
    val edges = pw.select(col("c").as("src"), col("s").as("dst"), col("w"))
      .unionByName(pw.select(col("s").as("src"), col("c").as("dst"), col("w")))
    t("edges")(edges)
    val t0 = System.nanoTime()
    val n = graft.operators.Graph.personalizedPageRank(edges,
      Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
        .select((col("c_custkey") * 2).as("id")), 5).count()
    println(f"${(System.nanoTime() - t0) / 1e9}%8.2fs  ppr 5 iters ($n rows)")
    t("g1b end-to-end")(graft.operators.Graph.g1bPersonalized(spark, dir))
    spark.stop()
  }

  /** Stage-by-stage timing of g2_triangles at bench parallelism. */
  def profileG2(dir: String): Unit = {
    val spark = GraftSession()
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.count() // warm
    val edgesPlan = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
    t("edges derivation")(edgesPlan)
    val edges = edgesPlan.localCheckpoint()
    val deg = edges.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
    t("deg")(deg)
    val key = (d: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column) =>
      d * lit(4294967296L) + id
    val orientedPlan = edges
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(
        when(key(col("du"), col("u")) < key(col("dv"), col("v")),
          struct(col("u").as("s"), col("v").as("t"),
            key(col("dv"), col("v")).as("tk")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"),
          key(col("du"), col("u")).as("tk"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.tk").as("tk"))
    t("oriented build")(orientedPlan)
    val oriented = orientedPlan.localCheckpoint()
    val w1 = oriented.select(col("s"), col("t").as("t1"), col("tk").as("k1"))
    val w2 = oriented.select(col("s"), col("t").as("t2"), col("tk").as("k2"))
    val wedges = w1.join(w2, Seq("s")).filter(col("k1") < col("k2"))
    t("wedges (generate only)")(wedges)
    val closed = wedges.join(
      oriented.select(col("s").as("t1"), col("t").as("t2")), Seq("t1", "t2"))
    t("closing join")(closed)
    t("per-part counts")(closed
      .select(explode(array(col("s"), col("t1"), col("t2"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_triangles")))
    t("g2 end-to-end (current impl)")(graft.operators.Graph.g2Triangles(spark, dir))
    spark.stop()
  }
}
