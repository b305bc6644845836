package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens and shingles handle short and jagged inputs") {
    val df = Seq("a b c d", "x y", "", "  padded   spaces  ").toDF("text")
    val sh = df.select(TextAnalysis.shingles(TextAnalysis.tokens(col("text"))).as("s"))
      .as[Seq[String]].collect()
    assert(sh(0) === Seq("a b c", "b c d"))
    assert(sh(1) === Seq.empty) // < 3 tokens → no shingles
    assert(sh(3) === Seq.empty) // trim collapses to 2 tokens → no shingles
  }

  test("quality score formula components") {
    val df = Seq((1L, "the the the the")).toDF("doc_id", "text")
    // reuse query machinery via a temp table is overkill; check components
    val t = TextAnalysis.tokens(col("text"))
    val r = df.select(
      size(t).as("n"),
      size(array_distinct(t)).as("nd"),
      size(filter(t, x => x.isInCollection(TextAnalysis.stopwords))).as("stop"))
      .as[(Int, Int, Int)].collect().head
    assert(r === ((4, 1, 4)))
  }

  test("fingerprint is normalization-invariant") {
    val fps = Seq("Hello World", "  hello world  ", "HELLO WORLD", "other")
      .toDF("text").select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) === fps(1) && fps(1) === fps(2) && fps(0) != fps(3))
  }
}
