package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001)

  def fixture = Seq(
    (1L, "a a a b"),          // top uni 3/4, bigrams: "a a"×2, "a b" → 2/3
    (2L, "x y"),              // all unique, one bigram
    (3L, "solo"),             // no bigrams at all
    (4L, "p q p q p")         // top uni 3/5, "p q"×2 + "q p"×2 → tie at 2/4
  ).toDF("doc_id", "text")

  test("repetition stats match hand computation, incl. the no-bigram doc") {
    val got = Repetition.repetitionStats(fixture)
      .select("doc_id", "n_tokens", "top_uni_cnt", "dup_uni_mass",
        "n_bigrams", "top_bi_cnt", "keep")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 4L, 3L, 3L, 3L, 2L, false),  // 3/4 > 0.2 → drop
      (2L, 2L, 1L, 0L, 1L, 1L, false),  // degenerate short doc: 1/2 > 0.2
      (3L, 1L, 1L, 0L, 0L, 0L, false),  // single token: top_uni_frac = 1
      (4L, 5L, 3L, 5L, 4L, 2L, false)))
  }

  test("repetition fractions are exact single divisions") {
    val r = Repetition.repetitionStats(fixture)
      .filter(col("doc_id") === 1L)
      .select("top_uni_frac", "dup_uni_frac", "top_bi_frac")
      .as[(Double, Double, Double)].head()
    assert(r === ((3.0 / 4.0, 3.0 / 4.0, 2.0 / 3.0)))
  }

  test("tfidf ranks rarer terms above common ones at equal tf") {
    val d = Seq(
      (1L, "apple banana"),
      (2L, "apple cherry"),
      (3L, "apple banana date")).toDF("doc_id", "text")
    // doc 3: apple df=3, banana df=2, date df=1 — all tf=1 → date first
    val top = Repetition.tfidfTopK(d, k = 3)
      .filter(col("doc_id") === 3L).orderBy("rk")
      .select("term").as[String].collect().toSeq
    assert(top === Seq("date", "banana", "apple"))
  }

  test("tfidf tie-break is (score desc, term asc) and k is respected") {
    val out = Repetition.tfidfTopK(docs, k = 5)
    val byDoc = out.groupBy("doc_id").count().as[(Long, Long)].collect()
    assert(byDoc.forall(_._2 <= 5))
    // rk is dense 1..m per doc
    val rks = out.filter(col("doc_id") === out.select(min("doc_id")).head().getLong(0))
      .orderBy("rk").select("rk").as[Int].collect().toSeq
    assert(rks === (1 to rks.length).toSeq)
  }

  test("vocab head: cumulative mass is monotone and consistent with counts") {
    val head = Repetition.vocabHead(docs, k = 20).orderBy("rank")
      .select("rank", "total_cnt", "cum_mass", "cum_frac")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(head.nonEmpty)
    // counts non-increasing in rank; cum_mass is the prefix sum
    assert(head.map(_._2) === head.map(_._2).sorted.reverse)
    assert(head.map(_._3) === head.map(_._2).scanLeft(0L)(_ + _).tail)
    assert(head.map(_._4) === head.map(_._4).sorted)
    assert(head.last._4 <= 1.0)
  }

  test("bm25 matches the closed form on a hand corpus") {
    import spark.implicits._
    // 2 docs: d1 = "a a b" (dl 3), d2 = "b c" (dl 2). Query terms: a, c.
    // N=2, T=5. term a: df=1, d1 tf=2 -> num=(4-2+1)*44*2*5=1320,
    // den=(2+1)*(20*2*5+6*5+18*3*2)=3*338=1014; d2 tf=0 -> 0.
    // term c: df=1, d2 tf=1 -> num=3*44*1*5=660,
    // den=3*(20*1*5+6*5+18*2*2)=3*202=606; d1 tf=0 -> 0.
    val docs2 = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Repetition.bm25(docs2, Seq("a", "c")).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) == 1320.0 / 1014.0 + 0.0)
    assert(out(2L) == 0.0 + 660.0 / 606.0)
  }

  test("bm25 saturation: doubling tf raises the score sublinearly") {
    import spark.implicits._
    val docs2 = Seq((1L, "x y y y"), (2L, "x x y y"), (3L, "y y y y"))
      .toDF("doc_id", "text")
    val s = Repetition.bm25(docs2, Seq("x")).orderBy("doc_id")
      .collect().map(r => r.getDouble(3))
    assert(s(1) > s(0) && s(0) > s(2), s"tf monotone: ${s.toSeq}")
    assert(s(1) < 2 * s(0), s"saturating, not linear: ${s.toSeq}")
  }

  test("t8/t9 are partition-invariant (shuffle keys, not layout)") {
    val a = Repetition.repetitionStats(docs).orderBy("doc_id").collect().toSeq
    val b = Repetition.repetitionStats(docs.repartition(17)).orderBy("doc_id")
      .collect().toSeq
    assert(a === b)
    val ta = Repetition.tfidfTopK(docs, 5).orderBy("doc_id", "rk").collect().toSeq
    val tb = Repetition.tfidfTopK(docs.repartition(17), 5).orderBy("doc_id", "rk")
      .collect().toSeq
    assert(ta === tb)
  }
}
