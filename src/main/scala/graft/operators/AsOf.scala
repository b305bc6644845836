package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for each left row, attach the most recent
  * right row with the same key and `right.ts <= left.ts`. The operator
  * behind point-in-time-correct feature attachment in training-data
  * pipelines (no label leakage from the future), which Spark SQL lacks as a
  * builtin.
  *
  * Built by composition (preference (a) of the custom-operator ladder): tag
  * and union both sides, then one per-key window pass where
  * `last(value, ignoreNulls)` carries the latest right payload forward into
  * each left row. Cost: ONE shuffle on the key + a per-key sort — no range
  * condition ever reaches a join, so there is no quadratic band-join blowup
  * and nothing for AQE to mis-estimate. Scales to arbitrarily many right
  * rows per key, unlike per-pair range joins.
  *
  * Right rows sort before left rows at equal timestamps, so an exactly
  * simultaneous right row matches (`>=` semantics, like DuckDB ASOF).
  */
object AsOf {

  /** @param keyCols  equi-join key columns (same names both sides)
    * @param leftTs   event-time column of `left`
    * @param rightTs  event-time column of `right`
    * @param payload  right columns to attach
    * @param prefix   prefix for attached columns (+ `<prefix>ts` = matched time)
    * @param tieBreak optional right column ordering simultaneous right rows
    *                 (last one wins); needed only if (key, ts) can repeat
    * @param forward  false (default): latest right with `ts <= left.ts`
    *                 (backward/point-in-time). true: EARLIEST right with
    *                 `ts >= left.ts` — the "next event after" lookup (e.g.
    *                 first click after a purchase); same single-shuffle
    *                 union+window plan, scanned in reverse time order
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               prefix: String = "asof_", tieBreak: Option[String] = None,
               forward: Boolean = false): DataFrame = {
    // the whole right row travels as ONE struct: per-column carry-forward
    // would let an older row's value bleed into a newer row's NULL payload
    val rStruct = struct(col(rightTs).as("ts") +: payload.map(p => col(p).as(p)): _*)
    val rPrep = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__tag"), rStruct.as("__r")) ++
        tieBreak.map(t => col(t).as("__tie")).toSeq: _*)
    val lOther = left.columns.filterNot(keyCols.contains).toSeq
    val lPrep = left.select(
      keyCols.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__tag")) ++
        lOther.filterNot(_ == leftTs).map(col): _*)

    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val ordering: Seq[Column] = Seq(tsOrder, col("__tag").asc) ++
      tieBreak.map(_ => col("__tie").asc_nulls_first).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, 0)

    lPrep.unionByName(rPrep, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(keyCols.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        lOther.filterNot(_ == leftTs).map(col) ++
        (col("__m.ts").as(prefix + "ts") +:
          payload.map(p => col(s"__m.$p").as(prefix + p))): _*)
  }
}
