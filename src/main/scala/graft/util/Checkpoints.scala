package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Partitioning-preserving checkpoint for iterative-join loops
  * (PageRank/BFS in [[graft.operators.Graph]], min-label propagation in
  * [[graft.dedup.Clusters]]).
  *
  * Under AQE a plain `localCheckpoint()` records UnknownPartitioning in its
  * `LogicalRDD` — `AdaptiveSparkPlanExec` cannot expose the final plan's
  * partitioning at plan time — so every downstream join re-shuffles the
  * checkpointed frame. For a loop that joins the same corpus-scaled frame
  * once per round, that silently turns an O(E)-total shuffle contract into
  * O(E·rounds) (measured: each PageRank/BFS round re-exchanged the full
  * edge list before this existed; PlanSpec pins the absence). Building the
  * one checkpoint with AQE off keeps the claim: when the input is already
  * hash-partitioned on `key` the explicit repartition is elided as
  * redundant (EnsureRequirements) and the claim even carries the upstream
  * sort order; otherwise the plain shuffle's `hashpartitioning(key, n)` is
  * recorded. Consumers still run fully adaptive. */
object Checkpoints {

  /** Eagerly checkpoint `df` hash-partitioned on `key`, with the
    * partitioning claim preserved in the resulting plan.
    *
    * NOT concurrency-transparent: the AQE flip is session-global, so a query
    * COMPILED on the same session while this runs would plan with AQE off.
    * The `synchronized` below serializes concurrent `partitioned` calls
    * (so two of them cannot race the save/restore and strand AQE disabled)
    * at zero cost on the single-threaded Verify/Bench/test drivers, but it
    * cannot fence unrelated concurrent query submission — callers running a
    * multi-threaded driver should route those through `spark.newSession()`
    * (separate conf view, shared catalog/state). */
  def partitioned(df: DataFrame, key: String): DataFrame = {
    val spark = df.sparkSession
    spark.synchronized {
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try df.repartition(n, col(key)).localCheckpoint()
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
  }
}
