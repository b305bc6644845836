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

  test("d2 dispatch routes each corpus regime to its measured winner") {
    // Round-11 dispatch ask. Offline calibration (min-over-runs, sf0.1-
    // equivalent sizes, this box): decorrelated corpus r≈10.7 → naive
    // 3.75 s vs prefix 4.11 s; moderate boilerplate r≈141 → 4.96 vs
    // 4.24 s; heavy boilerplate r≈1251 → 89.4 vs 31.3 s. The threshold
    // (50) must therefore send THIS corpus (r≈2) to naive and a
    // boilerplate corpus to prefix — and both routes must return the
    // identical pair set (the Bayardo equivalence, re-checked here on the
    // regime where the prefix filter actually prunes hot shingles).
    val (choice, out) = Dedup.ngramJaccardChoose(docs, 0.5)
    assert(choice === "naive", "decorrelated test corpus must route naive")
    assert(out.select("a_id", "b_id").as[(Long, Long)].collect().toSet ===
      Dedup.ngramJaccardPairs(docs, 0.5)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet)
    // boilerplate regime: 200 docs sharing 10 hot sentences -> hot-shingle
    // df ~ 100, r = Σdf²/Σdf well past the threshold
    val boiler = (0 until 10).map(i => (0 until 8).map(j => s"b${i}_$j").mkString(" "))
    val bdocs = (0L until 200L).map { d =>
      val shared = boiler.zipWithIndex.collect { case (s, i) if (d + i) % 2 == 0 => s }
      val uniq = (0 until 12).map(k => s"u${d}_$k").mkString(" ")
      (d, (shared :+ uniq).mkString(" "))
    }.toDF("doc_id", "text")
    val (bChoice, bOut) = Dedup.ngramJaccardChoose(bdocs, 0.5)
    assert(bChoice === "prefix", "boilerplate corpus must route prefix")
    val bNaive = Dedup.ngramJaccardPairs(bdocs, 0.5)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(bNaive.nonEmpty)
    assert(bOut.select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet === bNaive)
  }

  test("d2 dispatch statistic sampled past the cap still routes both regimes") {
    // force sampling (f = 0.5 on the 200-doc boilerplate corpus / f = 0.25
    // at cap 50 on the decorrelated docs): the binomial-thinning corrected
    // estimate r ≈ (r̂ − (1−f))/f must land on the same side of the
    // threshold as the exact statistic — the regimes sit orders of
    // magnitude apart, which is exactly why sampling is safe
    val boiler = (0 until 10).map(i => (0 until 8).map(j => s"b${i}_$j").mkString(" "))
    val bdocs = (0L until 200L).map { d =>
      val shared = boiler.zipWithIndex.collect { case (s, i) if (d + i) % 2 == 0 => s }
      val uniq = (0 until 12).map(k => s"u${d}_$k").mkString(" ")
      (d, (shared :+ uniq).mkString(" "))
    }.toDF("doc_id", "text")
    val (bChoice, _) = Dedup.ngramJaccardChoose(bdocs, 0.5, sampleCap = 100L)
    assert(bChoice === "prefix", "sampled boilerplate stat must still route prefix")
    val (choice, out) = Dedup.ngramJaccardChoose(docs, 0.5, sampleCap = 50L)
    assert(choice === "naive", "sampled decorrelated stat must still route naive")
    // and the routed frame is still the exact naive result
    assert(out.select("a_id", "b_id").as[(Long, Long)].collect().toSet ===
      Dedup.ngramJaccardPairs(docs, 0.5)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet)
  }

  test("d2 dispatch on an empty corpus returns an empty pair frame, not NPE") {
    // zero shingle rows make the deciding-statistic sums NULL; the router
    // must treat that as r=0 (naive path) and return the same empty frame
    // the explicit variants do (ADVICE round-11 finding)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val (choice, out) = Dedup.ngramJaccardChoose(empty, 0.5)
    assert(choice === "naive")
    assert(out.count() === 0)
  }

  test("d11 containment finds subset pairs that Jaccard misses") {
    // B = boilerplate wrapper around A's full text: c(A,B) ≈ 1 while
    // j(A,B) is small — the excerpt/quote case containment exists for
    val aText = (1 to 10).map(i => s"core$i").mkString(" ")
    val bText = (1 to 60).map(i => s"wrap$i").mkString(" ") + " " + aText
    val docs = Seq((1L, aText), (2L, bText), (3L, "unrelated words entirely here"))
      .toDF("doc_id", "text")
    val c = Dedup.containmentPairs(docs, 0.9)
      .select("contained_id", "container_id").as[(Long, Long)].collect().toSet
    assert(c === Set((1L, 2L)), "A must be contained in B, never the reverse")
    val j = Dedup.ngramJaccardPairs(docs, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(!j.contains((1L, 2L)), "resemblance must miss the subset pair")
  }

  test("d11b prefix-filtered containment ≡ naive, including the tiny-in-huge case") {
    // the one-sided prefix rule's hard case: a 10-token doc contained in a
    // 60-token wrapper — B-side pruning would lose it; A-side prefix must
    // keep a shared rare shingle
    val aText = (1 to 10).map(i => s"core$i").mkString(" ")
    val bText = (1 to 60).map(i => s"wrap$i").mkString(" ") + " " + aText
    val wrap = Seq((1L, aText), (2L, bText), (3L, "unrelated words entirely here"))
      .toDF("doc_id", "text")
    for (corpus <- Seq(wrap, docs)) {
      val naive = Dedup.containmentPairs(corpus, 0.6)
        .select("contained_id", "container_id", "containment")
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.containmentPairsPrefix(corpus, 0.6)
        .select("contained_id", "container_id", "containment")
        .as[(Long, Long, Double)].collect().toSet
      assert(pref === naive)
    }
  }

  test("d11 dispatch routes both regimes and returns the naive result set") {
    // same statistic and threshold as d2c (the naive containment join
    // shuffles the identical Σdf² stream); decorrelated → naive, the
    // boilerplate corpus → prefix, identical directional pairs either way
    val (choice, out) = Dedup.containmentChoose(docs, 0.6)
    assert(choice === "naive")
    val boiler = (0 until 10).map(i => (0 until 8).map(j => s"b${i}_$j").mkString(" "))
    val bdocs = (0L until 200L).map { d =>
      val shared = boiler.zipWithIndex.collect { case (s, i) if (d + i) % 2 == 0 => s }
      val uniq = (0 until 12).map(k => s"u${d}_$k").mkString(" ")
      (d, (shared :+ uniq).mkString(" "))
    }.toDF("doc_id", "text")
    val (bChoice, bOut) = Dedup.containmentChoose(bdocs, 0.6)
    assert(bChoice === "prefix")
    assert(bOut.select("contained_id", "container_id").as[(Long, Long)].collect().toSet ===
      Dedup.containmentPairs(bdocs, 0.6)
        .select("contained_id", "container_id").as[(Long, Long)].collect().toSet)
    assert(out.select("contained_id", "container_id").as[(Long, Long)].collect().toSet ===
      Dedup.containmentPairs(docs, 0.6)
        .select("contained_id", "container_id").as[(Long, Long)].collect().toSet)
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
