package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf0001)

  test("stratified sample fills exact per-stratum quotas, deterministically") {
    val counts = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sample = CorpusOps.stratifiedSample(docs, "lang", 0.1)
      .select("lang", "doc_id").as[(String, Long)].collect()
    val perLang = sample.groupBy(_._1).view.mapValues(_.length).toMap
    counts.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) === math.ceil(0.1 * n).toInt,
        s"stratum $lang quota")
    }
    // hash-keyed, not rand(): the same call selects the same docs
    val again = CorpusOps.stratifiedSample(docs, "lang", 0.1)
      .select("lang", "doc_id").as[(String, Long)].collect()
    assert(sample.sorted.toSeq === again.sorted.toSeq)
  }

  test("hash-threshold sample is deterministic and near the target fraction") {
    val n = docs.count()
    val s1 = CorpusOps.hashSample(docs, 0.1).select("doc_id").as[Long].collect().toSet
    val s2 = CorpusOps.hashSample(docs.repartition(16), 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2, "hash sampling must not depend on partitioning")
    val frac = s1.size.toDouble / n
    assert(frac > 0.02 && frac < 0.25, s"binomial(n, 0.1) sample way off: $frac")
  }

  test("decontamination matches a driver-side shingle scan") {
    val sh = TextAnalysis.shingleRows(docs).as[(Long, String)].collect()
    val bench = sh.filter(_._1 % 100 == 0)
    val train = sh.filter(_._1 % 100 != 0)
    val benchByShingle = bench.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val want = train
      .flatMap { case (id, s) => benchByShingle.get(s).map(bs => (id, s, bs)) }
      .groupBy(_._1)
      .map { case (id, hits) =>
        id -> (hits.flatMap(_._3).distinct.length.toLong, hits.map(_._2).distinct.length.toLong)
      }
    val got = CorpusOps.decontaminate(docs)
      .as[(Long, Long, Long)].collect()
      .map { case (id, nb, ns) => id -> (nb, ns) }.toMap
    assert(got === want)
    assert(got.nonEmpty, "benchmark stratum should collide with some training docs")
  }

  test("sequence packing assigns budget-bucket of the running start offset") {
    val budget = 64 // small budget so sf0.001 yields many sequences
    val got = CorpusOps.packSequences(docs, budget)
      .select("lang", "doc_id", "n_tokens", "seq_id")
      .as[(String, Long, Long, Long)].collect()
    got.groupBy(_._1).foreach { case (_, rows) =>
      var start = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, seqId) =>
        assert(seqId === start / budget)
        start += n
      }
    }
    // seq ids are non-decreasing in doc order (docs longer than the budget
    // may skip buckets — that's correct: they span them)
    got.groupBy(_._1).foreach { case (lang, rows) =>
      val ids = rows.sortBy(_._2).map(_._4)
      assert(ids.zip(ids.drop(1)).forall { case (a, b) => a <= b },
        s"non-monotonic sequences in $lang")
    }
  }

  test("sharded packing equals independent global packing of each shard") {
    val budget = 64
    val shardSize = 16L
    val sharded = CorpusOps.packSequences(docs, budget, shardSize)
      .select("doc_id", "lang", "shard", "n_tokens", "seq_id")
      .as[(Long, String, Long, Long, Long)].collect().sorted.toSeq
    // offsets restart per shard by construction, so packing each shard's
    // docs through the GLOBAL code path must reproduce the sharded result
    val shards = docs.select((col("doc_id") / shardSize).cast("long")).distinct()
      .as[Long].collect()
    val want = shards.toSeq.flatMap { s =>
      CorpusOps.packSequences(
          docs.filter(col("doc_id") >= s * shardSize &&
            col("doc_id") < (s + 1) * shardSize), budget)
        .select("doc_id", "lang", "n_tokens", "seq_id")
        .as[(Long, String, Long, Long)].collect()
        .map { case (id, lang, n, seq) => (id, lang, s, n, seq) }
    }.sorted
    assert(sharded === want)
    // and the default is unchanged: shardSize = 0 has no shard column
    assert(!CorpusOps.packSequences(docs, budget).columns.contains("shard"))
  }

  test("chunk dedup drops corpus-duplicated chunks, keeps within-doc repeats") {
    val w = CorpusOps.chunkWords
    def words(p: String) = (1 to w).map(i => s"$p$i").mkString(" ")
    val (shared, u1, u2, u3) = (words("dup"), words("a"), words("b"), words("c"))
    val df = Seq(
      (0L, s"$shared $u1"), // chunk 0 duplicated with doc 1, chunk 1 unique
      (1L, s"$shared $u2"),
      (2L, s"$u3 $u3") // same chunk twice in ONE doc: corpus-unique → kept
    ).toDF("doc_id", "text")
    val out = CorpusOps.chunkDedupRewrite(df)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) === ((0L, 2L, 1L, u1)))
    assert(out(1) === ((1L, 2L, 1L, u2)))
    assert(out(2) === ((2L, 2L, 2L, s"$u3 $u3")))
    // rebuild preserves chunk order, not hash order
    val multi = Seq((9L, s"$u2 $u1 $u3")).toDF("doc_id", "text")
    val kept = CorpusOps.chunkDedupRewrite(multi).as[(Long, Long, Long, String)].head()
    assert(kept === ((9L, 3L, 3L, s"$u2 $u1 $u3")))
  }

  test("weighted systematic sample matches the single-threaded grid rule") {
    val k = 37 // not a divisor of anything — exercises uneven grid spans
    val rows = docs.select("doc_id", "n_chars").as[(Long, Long)]
      .collect().sortBy(_._1)
    val total = rows.map(_._2).sum
    var cum = 0L
    val want = rows.flatMap { case (id, w) =>
      val before = cum; cum += w
      if (cum * k / total > before * k / total) Some((id, w, cum)) else None
    }.toSeq
    val got = CorpusOps.weightedSystematic(spark, docs, k)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want)
    // grid rule caps the pick count at k and hits k when no doc outweighs a slot
    assert(got.size <= k)
    // distributed scan is partitioning-invariant: same picks from a reshuffle
    val reshuffled = CorpusOps.weightedSystematic(spark, docs.repartition(7), k)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(reshuffled === want)
  }
}
