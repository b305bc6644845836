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

  /** The aggregates salting supports — a closed set, because recombination
    * must be the aggregate's own merge function. Arbitrary aggregates
    * (count_distinct, avg, min_by, ...) do NOT decompose this way and are
    * rejected by construction rather than silently recombined wrong. */
  sealed trait SaltedAggSpec { def name: String }
  case class SaltedSum(name: String, value: Column => Column = identity) extends SaltedAggSpec
  case class SaltedCount(name: String) extends SaltedAggSpec
  case class SaltedMin(name: String, value: Column => Column = identity) extends SaltedAggSpec
  case class SaltedMax(name: String, value: Column => Column = identity) extends SaltedAggSpec

  /** Two-phase salted aggregation: exact same result as
    * `df.groupBy(keys).agg(...)`, but the first shuffle keys on
    * (keys, salt) so a hot key spreads over `saltFactor` partitions. The
    * salt is derived from a uniqueish column (deterministic, no rand() —
    * plans stay replayable). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltSource: String, saltFactor: Int,
                aggs: Seq[(String, SaltedAggSpec)]): DataFrame = {
    require(aggs.nonEmpty)
    def partialOf(a: SaltedAggSpec): Column = a match {
      case SaltedSum(n, v) => sum(v(col(n)))
      case SaltedCount(n) => count(col(n))
      case SaltedMin(n, v) => min(v(col(n)))
      case SaltedMax(n, v) => max(v(col(n)))
    }
    def mergeOf(a: SaltedAggSpec, p: Column): Column = a match {
      case _: SaltedSum | _: SaltedCount => sum(p) // counts merge by summing
      case _: SaltedMin => min(p)
      case _: SaltedMax => max(p)
    }
    val salted = df.withColumn("__salt", pmod(hash(col(saltSource)), lit(saltFactor)))
    val partials = aggs.zipWithIndex.map { case ((_, a), i) => partialOf(a).as(s"__p_$i") }
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    val merged = aggs.zipWithIndex.map { case ((out, a), i) => mergeOf(a, col(s"__p_$i")).as(out) }
    partial.groupBy(keys.map(col): _*).agg(merged.head, merged.tail: _*)
  }
}
