package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextAnalysis.tokens

/** Repetition / term-weight tier of the training-data pipeline: the
  * Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
  * Models", appendix A1.1 — public literature), per-document TF-IDF term
  * ranking, and corpus-level vocabulary (Zipf) statistics.
  *
  * Scale shape: every aggregation here shuffles on `(doc_id, term)` or
  * `term` — both combiner-friendly (map-side partial agg), never on the
  * raw corpus. The only global window (t10's cumulative mass) runs AFTER
  * the vocabulary is cut to top-k rows, so the single-partition stage sees
  * k rows, not the corpus.
  *
  * Cross-engine float parity: every double here is produced by a SINGLE
  * correctly-rounded IEEE division of exactly-representable integers
  * (`CAST(a AS DOUBLE) / b`), so Spark and DuckDB agree bit-for-bit — no
  * ln/exp, no multi-step float folds (see t9's integer tf·N numerator). */
object Repetition {

  /** Bigrams of a token array: zip of the array with its own 1-shift.
    * Materialize `toks` behind a projection boundary before calling (the
    * element_at-in-lambda trap, TextAnalysis.shingles doc). */
  private def bigrams(toks: org.apache.spark.sql.Column) = {
    val m = size(toks) - 1
    when(m > 0,
      zip_with(slice(toks, lit(1), greatest(m, lit(0))),
               slice(toks, lit(2), greatest(m, lit(0))),
               (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
  }

  /** t8: Gopher repetition metrics per document — top-unigram fraction,
    * top-bigram fraction, duplicate-token mass — plus the keep/drop verdict
    * a pretraining pipeline derives from them. Two exploded aggregations
    * (unigrams, bigrams), each one combiner-friendly shuffle; docs too
    * short for bigrams join back with zeroed stats. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val toksDf = docs.select(col("doc_id"), tokens(col("text")).as("__toks"))

    val uni = toksDf.select(col("doc_id"), explode(col("__toks")).as("tok"))
      .groupBy("doc_id", "tok").count()
      .groupBy("doc_id").agg(
        sum("count").cast("bigint").as("n_tokens"),
        max("count").cast("bigint").as("top_uni_cnt"),
        sum(when(col("count") > 1, col("count")).otherwise(lit(0L)))
          .cast("bigint").as("dup_uni_mass"))

    val bi = toksDf.select(col("doc_id"), explode(bigrams(col("__toks"))).as("bg"))
      .groupBy("doc_id", "bg").count()
      .groupBy("doc_id").agg(
        sum("count").cast("bigint").as("n_bigrams"),
        max("count").cast("bigint").as("top_bi_cnt"))

    uni.join(bi, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_bigrams", "top_bi_cnt"))
      .withColumn("top_uni_frac",
        col("top_uni_cnt").cast("double") / col("n_tokens"))
      .withColumn("dup_uni_frac",
        col("dup_uni_mass").cast("double") / col("n_tokens"))
      .withColumn("top_bi_frac",
        when(col("n_bigrams") > 0,
          col("top_bi_cnt").cast("double") / col("n_bigrams")).otherwise(lit(0.0)))
      // Gopher A1.1 thresholds: drop if the most frequent word is >20% of
      // the doc or the most frequent bigram >18% (scaled to this corpus's
      // short docs; the dataflow, not the constants, is the operator)
      .withColumn("keep",
        col("top_uni_frac") <= 0.2 && col("top_bi_frac") <= 0.18)
      .select(col("doc_id"), col("n_tokens"), col("top_uni_cnt"),
        col("top_uni_frac"), col("dup_uni_mass"), col("dup_uni_frac"),
        col("n_bigrams"), col("top_bi_cnt"), col("top_bi_frac"), col("keep"))
  }

  /** t9: top-k TF-IDF terms per document. The score keeps float parity by
    * construction: numerator `tf · N` is an exact BIGINT product, and the
    * one double op is the final division by `df` — rarer terms rank higher,
    * exactly the classic idf monotonicity, without ln() (whose last-ulp
    * behavior differs between libm and the JVM). Deterministic tie-break
    * `(score desc, term asc)`. */
  def tfidfTopK(docs: DataFrame, k: Int): DataFrame = {
    val toksDf = docs.select(col("doc_id"), tokens(col("text")).as("__toks"))
    val terms = toksDf.select(col("doc_id"), explode(col("__toks")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count() // one scalar; inlined as a literal, not a join
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df, "term") // term-keyed shuffle join; both sides vocab-bounded
      .withColumn("score", (col("tf") * lit(n)).cast("double") / col("df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("term"), col("tf").cast("bigint").as("tf"),
        col("df").cast("bigint").as("df"), col("score"))
  }

  /** t10: corpus vocabulary head — top-k terms by total occurrence count
    * with document frequency and cumulative share of corpus token mass
    * (the Zipf curve a tokenizer-vocabulary audit reads off). The global
    * ORDER BY + running sum happens on k rows only; the corpus-sized work
    * is one combiner-friendly `term` aggregation. */
  def vocabHead(docs: DataFrame, k: Int): DataFrame = {
    val terms = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val vocab = terms.groupBy("term").agg(
      count(lit(1)).cast("bigint").as("total_cnt"),
      countDistinct("doc_id").cast("bigint").as("df"))
    val totalMass = terms.count() // exact corpus token count, one scalar
    val head = vocab.orderBy(col("total_cnt").desc, col("term").asc).limit(k)
    val w = Window.orderBy(col("total_cnt").desc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    head
      .withColumn("rank", row_number().over(
        Window.orderBy(col("total_cnt").desc, col("term").asc)))
      .withColumn("cum_mass", sum("total_cnt").over(w).cast("bigint"))
      .withColumn("cum_frac", col("cum_mass").cast("double") / lit(totalMass))
      .select(col("rank"), col("term"), col("total_cnt"), col("df"),
        col("cum_mass"), col("cum_frac"))
  }

  /** t19: Okapi BM25 relevance (k1 = 1.2, b = 0.75) of every document
    * against a fixed multi-term query — engine-exact WITHOUT `ln` by the
    * same exact-rational discipline as [[tfidfTopK]]. With k1 = 6/5 and
    * b = 3/4 the whole per-term score collapses to a ratio of two exact
    * integer products (T = corpus token count, N = doc count):
    *
    *   score_t = (2N − 2df + 1) · 44 · tf · T
    *             ─────────────────────────────────────────
    *             (2df + 1) · (20·tf·T + 6·T + 18·dl·N)
    *
    * (idf is the raw Robertson ratio (N − df + ½)/(df + ½), doubled to
    * clear the halves). One IEEE division per term, summed left-to-right —
    * both engines execute the identical float op sequence, so the gate is
    * hash-exact. Products stay < 2⁶³ up to ~10⁹-token corpora; past that
    * the carrier moves to DECIMAL(38) with the same shape. Plan: one
    * map-side pass builds (dl, tf…) per doc; a 1-row global aggregate
    * broadcasts back; no shuffle touches corpus-sized data at all. */
  def bm25(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(lower(col("text"))).as("l"))
    val perDoc = toks.select(
      col("doc_id") +: size(col("l")).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("l"), x => x === lit(t))).cast("long").as(s"tf$i")
        }: _*)
    val agg = perDoc.agg(
      count(lit(1)).as("n"),
      sum("dl").as("tot") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
    val scored = perDoc.crossJoin(broadcast(agg))
    val score = terms.indices.map { i =>
      val num = (lit(2L) * col("n") - lit(2L) * col(s"df$i") + lit(1L)) *
        lit(44L) * col(s"tf$i") * col("tot")
      val den = (lit(2L) * col(s"df$i") + lit(1L)) *
        (lit(20L) * col(s"tf$i") * col("tot") + lit(6L) * col("tot") +
          lit(18L) * col("dl") * col("n"))
      num.cast("double") / den.cast("double")
    }.reduceLeft(_ + _)
    scored.select(
      col("doc_id") +: col("dl") +:
        terms.indices.map(i => col(s"tf$i")) :+ score.as("bm25"): _*)
  }

  def t19Bm25(spark: SparkSession, dir: String): DataFrame =
    bm25(Tables.documents(spark, dir), Seq("join", "window", "stream"))
      .orderBy("doc_id")

  def t8Repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionStats(Tables.documents(spark, dir)).orderBy("doc_id")

  def t9TfidfTop(spark: SparkSession, dir: String): DataFrame =
    tfidfTopK(Tables.documents(spark, dir), k = 5).orderBy("doc_id", "rk")

  def t10VocabHead(spark: SparkSession, dir: String): DataFrame =
    vocabHead(Tables.documents(spark, dir), k = 100).orderBy("rank")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t8_repetition" -> (t8Repetition _),
    "t9_tfidf_top" -> (t9TfidfTop _),
    "t10_vocab_head" -> (t10VocabHead _),
    "t19_bm25" -> (t19Bm25 _)
  )

  /** DuckDB twins. Tokenization matches tokens(): split trimmed text on
    * \s+ (empty text → one empty token, both engines). All double columns
    * are single IEEE divisions of exact integers — bit-equal across
    * engines. */
  def oracle: Map[String, String] = Map(
    // Same exact-rational BM25 chain, term scores summed left-to-right in
    // the same textual order — identical IEEE op sequence as the Spark side.
    "t19_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS l
        |  FROM documents),
        |per AS (
        |  SELECT doc_id, CAST(len(l) AS BIGINT) AS dl,
        |    CAST(len(list_filter(l, x -> x = 'join')) AS BIGINT) AS tf0,
        |    CAST(len(list_filter(l, x -> x = 'window')) AS BIGINT) AS tf1,
        |    CAST(len(list_filter(l, x -> x = 'stream')) AS BIGINT) AS tf2
        |  FROM toks),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tot,
        |    CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |    CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |    CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |  FROM per)
        |SELECT doc_id, dl, tf0, tf1, tf2,
        |  CAST((2*n - 2*df0 + 1) * 44 * tf0 * tot AS DOUBLE) /
        |    CAST((2*df0 + 1) * (20*tf0*tot + 6*tot + 18*dl*n) AS DOUBLE) +
        |  CAST((2*n - 2*df1 + 1) * 44 * tf1 * tot AS DOUBLE) /
        |    CAST((2*df1 + 1) * (20*tf1*tot + 6*tot + 18*dl*n) AS DOUBLE) +
        |  CAST((2*n - 2*df2 + 1) * 44 * tf2 * tot AS DOUBLE) /
        |    CAST((2*df2 + 1) * (20*tf2*tot + 6*tot + 18*dl*n) AS DOUBLE)
        |  AS bm25
        |FROM per CROSS JOIN agg ORDER BY doc_id""".stripMargin,
    "t8_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |uni AS (
        |  SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |uagg AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(MAX(c) AS BIGINT) AS top_uni_cnt,
        |    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_uni_mass
        |  FROM uni GROUP BY 1),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |    i -> l[i] || ' ' || l[i+1])) AS b
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
        |        FROM documents)),
        |bi AS (
        |  SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |bagg AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |    CAST(MAX(c) AS BIGINT) AS top_bi_cnt
        |  FROM bi GROUP BY 1)
        |SELECT u.doc_id, u.n_tokens, u.top_uni_cnt,
        |  CAST(u.top_uni_cnt AS DOUBLE) / u.n_tokens AS top_uni_frac,
        |  u.dup_uni_mass,
        |  CAST(u.dup_uni_mass AS DOUBLE) / u.n_tokens AS dup_uni_frac,
        |  COALESCE(b.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(b.top_bi_cnt, 0) AS top_bi_cnt,
        |  CASE WHEN COALESCE(b.n_bigrams, 0) > 0
        |       THEN CAST(b.top_bi_cnt AS DOUBLE) / b.n_bigrams
        |       ELSE 0.0 END AS top_bi_frac,
        |  (CAST(u.top_uni_cnt AS DOUBLE) / u.n_tokens <= 0.2 AND
        |   CASE WHEN COALESCE(b.n_bigrams, 0) > 0
        |        THEN CAST(b.top_bi_cnt AS DOUBLE) / b.n_bigrams
        |        ELSE 0.0 END <= 0.18) AS keep
        |FROM uagg u LEFT JOIN bagg b USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t9_tfidf_top" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    CAST(tf.tf * n.n AS DOUBLE) / df.df AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tf, df, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, term, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, score
        |FROM ranked WHERE rk <= 5 ORDER BY doc_id, rk""".stripMargin,
    "t10_vocab_head" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |vocab AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS total_cnt,
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM toks GROUP BY 1),
        |mass AS (SELECT COUNT(*) AS m FROM toks),
        |head AS (
        |  SELECT * FROM vocab ORDER BY total_cnt DESC, term ASC LIMIT 100)
        |SELECT ROW_NUMBER() OVER (ORDER BY total_cnt DESC, term ASC) AS rank,
        |  term, total_cnt, df,
        |  CAST(SUM(total_cnt) OVER (ORDER BY total_cnt DESC, term ASC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_mass,
        |  CAST(CAST(SUM(total_cnt) OVER (ORDER BY total_cnt DESC, term ASC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE) / mass.m AS cum_frac
        |FROM head CROSS JOIN mass
        |ORDER BY rank""".stripMargin
  )
}
