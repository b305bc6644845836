package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001)

  test("exact dedup keeps one canonical row per fingerprint") {
    val dups = Seq((1L, "hello world foo"), (2L, "hello world foo"),
      (3L, "  Hello World Foo "), (4L, "different text here")).toDF("doc_id", "text")
    val kept = Dedup.exactDedup(dups, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L)) // 2 and 3 normalize to doc 1's fingerprint
  }

  test("MinHash+LSH finds exactly the true near-dup pairs (vs exact Jaccard)") {
    val exact = Dedup.ngramJaccardPairs(docs, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLshPairs(docs, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    // verify step guarantees precision (lsh ⊆ exact); recall should be
    // total here: planted dups have jaccard ≈ 0.99 → all bands collide
    assert(lsh === exact)
  }

  test("prefix-filtered Jaccard join ≡ direct-count Jaccard join") {
    val direct = Dedup.ngramJaccardPairs(docs, 0.5)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    val filtered = Dedup.ngramJaccardPairsPrefix(docs, 0.5)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(direct.nonEmpty)
    assert(filtered === direct)
  }

  test("SimHash puts near-dup pairs at small Hamming distance") {
    val nearDups = Dedup.ngramJaccardPairs(docs, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // r=1 explicitly: maxHamming=60 means "all pairs", where wider combo
    // keys buy nothing and the cost measurement would be pure overhead
    val hams = Dedup.simHashPairsR(docs, Dedup.simHashBits, 1).toDF("a", "b", "h")
      .as[(Long, Long, Long)].collect().map { case (a, b, h) => (a, b) -> h }.toMap
    val dupHam = nearDups.toSeq.map(hams)
    val allHam = hams.values.toSeq
    assert(dupHam.max < allHam.sum.toDouble / allHam.size,
      "near-dups should sit well below mean Hamming distance")
    // sketch, not exact: most planted pairs land very low, tail tolerated
    assert(dupHam.count(_ <= 10).toDouble / dupHam.size >= 0.9,
      s"planted near-dups at hamming $dupHam")
  }

  test("pigeonhole-banded SimHash pairing ≡ all-pairs Hamming join, every r") {
    // reference result computed driver-side from the collected codes — the
    // banding must find EXACTLY the pairs an all-pairs scan would, for the
    // classic single-block pigeonhole (r=1), the pair-key generalization
    // (r=2), triples (r=3), AND the measured-cost default (r=0)
    val codes = Dedup.simHash(docs).as[(Long, Long)].collect()
    for (maxHamming <- Seq(3, 10)) {
      val want = (for {
        (ia, ha) <- codes; (ib, hb) <- codes if ia < ib
        h = java.lang.Long.bitCount(ha ^ hb) if h <= maxHamming
      } yield (ia, ib, h.toLong)).toSet
      for (r <- Seq(0, 1, 2, 3)) {
        val rows = Dedup.simHashPairsR(docs, maxHamming, r)
          .as[(Long, Long, Long)].collect()
        // the first-match emission rule must yield each pair EXACTLY once
        // (a set compare alone would hide duplicate emissions)
        assert(rows.length === rows.toSet.size,
          s"duplicate pair emission at maxHamming=$maxHamming r=$r")
        assert(rows.toSet === want, s"maxHamming=$maxHamming r=$r")
      }
    }
  }

  test("md5Hash60 is stable and non-negative") {
    val h = Seq("a", "b", "a").toDF("s").select(Dedup.md5Hash60(col("s")).as("h"))
      .as[Long].collect()
    assert(h(0) === h(2) && h(0) >= 0 && h(1) >= 0 && h(0) != h(1))
  }
}
