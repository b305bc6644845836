package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY build prompt: "salting for skew, AQE for
  * runtime re-plan").
  *
  * AQE's skew-join splitting handles most join skew automatically
  * (spark.sql.adaptive.skewJoin.* — on in GraftSession). What AQE cannot fix
  * is a *single hot grouping key* inside an aggregation: every row of the
  * hot key still lands on one reducer. Salting fixes that shape: aggregate
  * on (key, salt) first — spreading the hot key over `saltFactor` reducers —
  * then combine the partials. Associative aggregates only (sum/count/min/
  * max); the decimal-sum convention keeps the two-phase result bit-equal to
  * the direct one. */
object Skew {

  /** Two-phase salted aggregation: exact same result as
    * `df.groupBy(keys).agg(sum/count/min/max)`, but the first shuffle keys
    * on (keys, salt) so a hot key spreads over `saltFactor` partitions.
    * The salt is derived from a uniqueish column (deterministic, no rand()
    * — plans stay replayable). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltSource: String, saltFactor: Int,
                aggs: Map[String, Column => Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(col(saltSource)), lit(saltFactor)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head match { case (n, f) => f(col(n)).as(s"__p_$n") },
        aggs.tail.toSeq.map { case (n, f) => f(col(n)).as(s"__p_$n") }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head match { case (n, f) => recombine(n, f).as(n) },
        aggs.tail.toSeq.map { case (n, f) => recombine(n, f).as(n) }: _*)
  }

  /** sum-of-partial-sums / sum-of-partial-counts / min-of-mins / max-of-maxs.
    * count() partials must recombine with sum — callers pass `count` via
    * `c => count(c)` and we detect it structurally is not possible, so the
    * recombination is: sum for sums and counts, min for min, max for max,
    * chosen by re-applying the aggregate to the partial column — valid for
    * idempotent-merge aggregates (min/max) and handled specially for count. */
  private def recombine(n: String, f: Column => Column): Column = {
    val probe = f(lit(1)).toString
    if (probe.startsWith("count")) sum(col(s"__p_$n"))
    else if (probe.startsWith("min")) min(col(s"__p_$n"))
    else if (probe.startsWith("max")) max(col(s"__p_$n"))
    else sum(col(s"__p_$n"))
  }
}
