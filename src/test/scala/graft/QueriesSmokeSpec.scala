package graft

/** Every declared query must execute at sf0.001 and (except candidate-pair
  * queries that legitimately return empty at tiny scale) produce rows; every
  * query with an oracle must declare matching column names — the driver's
  * compare hashes by sorted column name, so a mismatch is an automatic fail
  * even when values agree. */
class QueriesSmokeSpec extends SparkSpec {

  // pair-finding queries can legitimately find nothing in ~1k-row samples
  // (j04/j05 are NOT here: their bands are sized so even sf0.001 has pairs —
  // an empty result would mean a vacuous driver gate)
  val mayBeEmptyAtTinyScale =
    Set("d2_ngram_jaccard", "d3_minhash_lsh", "d4_simhash",
      "d5_embedding_neardup", "d7_dup_clusters")

  test("all queries run at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sf0001).count()
        if (n == 0 && !mayBeEmptyAtTinyScale(name)) Some(s"$name: 0 rows") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL exists only for declared queries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }
}
