package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Two-phase vendor enrichment: exact equality lookup first, then a fuzzy
  * substring-containment fallback for the misses, first-candidate-wins.
  *
  * Re-expresses the reference's per-row SQLite lookup loop
  * (main.py:94-101 → database.py:92-124) as three relational ops:
  *
  *   1. broadcast left outer equi-join (exact phase, database.py:92-97);
  *   2. broadcast theta-join `contains(lower(dimKey), lower(factKey))` on the
  *      exact-miss subset only (fuzzy phase, database.py:109-114 —
  *      `LOWER(vendor) LIKE LOWER('%' || txn || '%')`);
  *   3. deterministic first-match tie-break via `row_number` ordered by the
  *      dimension id (the reference's `fetchone()` returns SQLite scan order
  *      ≈ insertion id — we make that explicit, SURVEY.md §7.4).
  *
  * Scale: the dimension is user-curated and broadcast-size by contract, so
  * both phases are shuffle-free on the fact side. The theta join is a
  * BroadcastNestedLoopJoin over the *miss subset only* — the exact phase
  * prunes the expensive path, mirroring the reference's fast path. At 100 TB
  * the fuzzy slot upgrades to an LSH similarity join (graft.dedup.MinHash).
  */
object Enrichment {

  /** @param facts     fact table; must contain `factId` and `factKey`
    * @param dim       broadcast-size dimension
    * @param factId    unique row id of `facts` (tie-break partition key)
    * @param factKey   join key on the fact side (e.g. vendor string)
    * @param dimId     unique, orderable id of `dim` (tie-break order)
    * @param dimKey    join key on the dim side
    * @param payload   dim columns to copy onto matched facts
    * @return facts ++ payload ++ `match_type` in {exact, fuzzy, none}
    */
  def twoPhase(facts: DataFrame, dim: DataFrame, factId: String, factKey: String,
               dimId: String, dimKey: String, payload: Seq[String]): DataFrame = {
    val dimNames = (dimId +: dimKey +: payload).distinct
    // Fresh attribute ids per phase (toDF re-aliases) — the two joins must
    // not share dim lineage or Catalyst sees an ambiguous self-join.
    def dimFor(phase: String): (DataFrame, String => Column) = {
      val pre = s"__${phase}_"
      val d = broadcast(dim.select(dimNames.map(col): _*).toDF(dimNames.map(pre + _): _*))
      (d, (n: String) => col(pre + n))
    }

    val (d1, e) = dimFor("e")
    val exact = facts.join(d1, facts(factKey) === e(dimKey), "left")
    val hits = exact.filter(e(dimId).isNotNull)
      .select(facts.columns.map(col) ++ payload.map(p => e(p).as(p)) :+
        lit("exact").as("match_type"): _*)
    val misses = exact.filter(e(dimId).isNull).select(facts.columns.map(col): _*)

    val (d2, f) = dimFor("f")
    val fuzzy = misses.join(d2, contains(lower(f(dimKey)), lower(misses(factKey))), "left")
    val firstWins = Window.partitionBy(col(factId)).orderBy(f(dimId).asc_nulls_last)
    val fuzzyResolved = fuzzy
      .withColumn("__rn", row_number().over(firstWins))
      .filter(col("__rn") === 1)
      .select(facts.columns.map(col) ++ payload.map(p => f(p).as(p)) :+
        when(f(dimId).isNotNull, "fuzzy").otherwise("none").as("match_type"): _*)

    hits.unionByName(fuzzyResolved)
  }
}
