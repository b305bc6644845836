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
    t("d2 current (prefix+verify)")(graft.dedup.Dedup.ngramJaccardPairs(docs, 0.5))
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
}
