package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001)

  test("every doc has exactly one email, phone, and ip redacted") {
    val r = Scrub.redactPii(docs)
    assert(r.filter(col("n_emails") =!= 1L || col("n_phones") =!= 1L ||
      col("n_ips") =!= 1L).count() === 0L)
    // the redacted text carries every placeholder and no residual PII shape
    assert(r.filter(!col("redacted").contains("<EMAIL>") ||
      !col("redacted").contains("<PHONE>") ||
      !col("redacted").contains("<IP>")).count() === 0L)
    assert(r.filter(col("redacted").contains("@")).count() === 0L)
  }

  test("redaction is idempotent (placeholders match no pattern)") {
    val once = Scrub.redactPii(docs).select("doc_id", "redacted")
    val again = once
      .withColumn("r2",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("redacted"), Scrub.emailRe, "<EMAIL>"),
            Scrub.phoneRe, "<PHONE>"),
          Scrub.ipRe, "<IP>"))
    assert(again.filter(col("r2") =!= col("redacted")).count() === 0L)
  }

  test("url extraction yields two urls per doc minus blocklisted domains") {
    val urls = Scrub.extractUrls(docs)
    val n = docs.count()
    // each doc contributes site(doc_id%7).example.org + cdn(doc_id%3).example.net;
    // blocked: site0/site4 (2 of 7 residues) and cdn1 (1 of 3 residues)
    val expected = docs.select(
      (when(col("doc_id") % 7 === 0 || col("doc_id") % 7 === 4, 0).otherwise(1) +
        when(col("doc_id") % 3 === 1, 0).otherwise(1)).as("k"))
      .agg(sum("k")).head().getLong(0)
    assert(urls.count() === expected)
    assert(urls.filter(col("domain").isin(Scrub.blockedDomains: _*)).count() === 0L)
    // domain parse is exact on the synthetic shape
    assert(urls.filter(!col("url").startsWith("http")).count() === 0L)
  }

  test("t20 canonicalization collapses all five messy variants; real ports survive") {
    val out = Scrub.canonicalUrlDedup(docs).collect()
    // every canonical group collapses exactly the docs sharing doc_id % 100
    val n = docs.count()
    val groups = docs.select((col("doc_id") % 100).as("g")).groupBy("g").count()
      .as[(Long, Long)].collect().toMap
    assert(out.length === groups.size)
    out.foreach { r =>
      val canon = r.getString(0)
      // lowercase, portless, fragmentless, params sorted, no trailing slash
      assert(canon.matches("http://host\\d+\\.example\\.com/a/\\d+\\?b=2&x=1"), canon)
      val g = canon.replaceAll(".*/a/(\\d+)\\?.*", "$1").toLong
      assert(r.getLong(2) === groups(g), canon)        // n_variants
      assert(r.getLong(1) % 100 === g)                 // keeper in the group
    }
    // the expression directly on edge-case literals
    def canon(u: String): String =
      Seq(u).toDF("u").select(Scrub.canonicalizeUrl(col("u"))).head.getString(0)
    // :443 strips on https; a NON-default port survives; fragment drops;
    // params sort; trailing slash strips; host lowercases
    assert(canon("https://Host.Example.com:443/p/?z=1&a=2#f") ===
      "https://host.example.com/p?a=2&z=1")
    assert(canon("https://host.example.com:8443/p") ===
      "https://host.example.com:8443/p")
    // CROSS-scheme defaults are NOT default for that scheme and must
    // survive: https://h:80 ≠ https://h, http://h:443 ≠ http://h
    assert(canon("https://h.example.com:80/p") ===
      "https://h.example.com:80/p")
    assert(canon("http://h.example.com:443/p") ===
      "http://h.example.com:443/p")
    assert(canon("http://h.example.com:80/p") === "http://h.example.com/p")
    // root path is kept as "/" (never stripped to empty)
    assert(canon("http://h.example.com/") === "http://h.example.com/")
    assert(canon("http://h.example.com") === "http://h.example.com/")
    // IDEMPOTENCE: canonical output is a fixed point of the function —
    // required for the dedup key to be stable under re-processing
    for (u <- Seq("https://Host.Example.com:443/p/?z=1&a=2#f",
      "https://host.example.com:8443/p", "http://h.example.com",
      "HTTP://A.B.C:80/x/y/?q=2&p=1#frag"))
      assert(canon(canon(u)) === canon(u), u)
  }

  test("split assignment is total, deterministic, and train-dominant") {
    val s = CorpusOps.splitAssign(docs)
    assert(s.count() === docs.count())
    assert(s.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
    val trainN = s.filter(col("split") === "train").count()
    assert(trainN > docs.count() * 6 / 10, s"train split too small: $trainN")
    // pure projection of doc_id: invariant under repartition
    val a = s.orderBy("doc_id").collect().toSeq
    val b = CorpusOps.splitAssign(docs.repartition(11)).orderBy("doc_id").collect().toSeq
    assert(a === b)
    // growing the corpus never reassigns existing docs
    val subset = CorpusOps.splitAssign(docs.filter(col("doc_id") % 2 === 0))
      .orderBy("doc_id").collect().toSeq
    assert(subset === a.filter(_.getLong(0) % 2 == 0))
  }
}
