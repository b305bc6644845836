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

  /** Driver query: the hot-key shape salting exists for — `l_returnflag`
    * has 3 values over the whole fact table, so a direct groupBy lands each
    * value on one reducer; the salted plan spreads each over 16. The oracle
    * is the PLAIN `GROUP BY` — identical output is the whole point (decimal
    * sums make the two-phase merge bit-equal, SkewBucketSpec proves it). */
  def skewSaltedAgg(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.operators.Aggregates.dec
    saltedAgg(graft.Tables.lineitem(spark, dir),
        keys = Seq("l_returnflag"), saltSource = "l_orderkey", saltFactor = 16,
        aggs = Seq(
          ("sum_qty", SaltedSum("l_quantity", dec)),
          ("n_rows", SaltedCount("l_orderkey")),
          ("max_price", SaltedMax("l_extendedprice", dec))))
      .select(col("l_returnflag"),
        col("sum_qty").cast("double").as("sum_qty"), col("n_rows"),
        col("max_price").cast("double").as("max_price"))
      .orderBy("l_returnflag")
  }

  /** Two-sided salted join: exact same rows as `fact.join(dim, key)` (inner
    * only — replication breaks outer semantics by construction), but the
    * fact side shuffles on (key, salt) so one hot key spreads over
    * `saltFactor` reducers, while the dim side is replicated `saltFactor`×
    * (explode over the salt range) so every (key, salt) bucket still finds
    * its dim row. This is the shape for a hot fact key against a dim too
    * large to broadcast: replication costs saltFactor·|dim| shuffle rows —
    * pay it only on skew AQE can't split (e.g. when the downstream op needs
    * this exact partitioning). Deterministic salt (hash of a uniqueish
    * column, never rand()) keeps the plan replayable. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: String, saltFactor: Int): DataFrame = {
    val f = fact.withColumn("__salt", pmod(hash(col(saltSource)), lit(saltFactor)))
    val d = dim.withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Driver query: orders⋈customer through the salted path; the oracle is
    * the PLAIN inner join — identical output is the point (SkewBucketSpec
    * also proves frame equality against the unsalted join). */
  def skewSaltedJoin(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"), col("o_orderstatus"))
    val cust = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    saltedJoin(orders, cust, "c_custkey", "o_orderkey", 8)
      .select("o_orderkey", "c_custkey", "o_orderstatus", "c_name", "c_nationkey")
      .orderBy("o_orderkey")
  }

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("skew_salted_agg" -> (skewSaltedAgg _),
      "skew_salted_join" -> (skewSaltedJoin _))

  def oracle: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(l_orderkey) AS n_rows,
        |  CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "skew_salted_join" ->
      """SELECT o_orderkey, o_custkey AS c_custkey, o_orderstatus, c_name, c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin)
}
