package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Edge semantics of the funnel / SCD2 operators on hand-built fixtures —
  * the driver oracle proves engine parity; these pin the *intended*
  * ordering rules (strictly-after stage gating, change-point collapse). */
class FunnelScd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.zipWithIndex.map { case ((u, t, typ), i) =>
      (u, ts(t), i.toLong, typ)
    }.toDF("user_id", "ts", "event_id", "event_type")

  test("funnel: stages must occur strictly after the previous stage") {
    val events = ev(
      // user 1: click BEFORE first view — click stage must stay null
      (1L, "2024-01-01 10:00:00", "click"),
      (1L, "2024-01-01 11:00:00", "view"),
      (1L, "2024-01-01 12:00:00", "purchase"), // purchase without click: null
      // user 2: full ordered path; a later duplicate click is ignored
      (2L, "2024-01-01 09:00:00", "view"),
      (2L, "2024-01-01 09:30:00", "click"),
      (2L, "2024-01-01 09:45:00", "click"),
      (2L, "2024-01-01 10:00:00", "purchase"),
      // user 3: no view at all — everything null
      (3L, "2024-01-01 08:00:00", "purchase"))
    val out = Aggregates.funnel(events).orderBy("user_id")
      .select("user_id", "t_view", "t_click", "t_purchase", "converted")
      .collect()
    assert(out(0) === Row(1L, ts("2024-01-01 11:00:00"), null, null, false))
    assert(out(1) === Row(2L, ts("2024-01-01 09:00:00"),
      ts("2024-01-01 09:30:00"), ts("2024-01-01 10:00:00"), true))
    assert(out(2) === Row(3L, null, null, null, false))
  }

  test("scd2: consecutive same-status events collapse into one version") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "trial"),
      (1L, "2024-01-01 11:00:00", "trial"), // same status: no new version
      (1L, "2024-01-01 12:00:00", "paid"),
      (1L, "2024-01-01 13:00:00", "trial")) // back to trial: NEW version
    val out = Aggregates.scd2(events).orderBy("version")
      .select("event_type", "version", "valid_from", "valid_to").collect()
    assert(out.toSeq === Seq(
      Row("trial", 1, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      Row("paid", 2, ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00")),
      Row("trial", 3, ts("2024-01-01 13:00:00"), null)))
  }

  test("scd2 intervals tile each user's timeline without overlap") {
    val out = Aggregates.a11Scd2(spark, sf0001)
    // every version's valid_to equals the next version's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val bad = out
      .withColumn("next_from", lead("valid_from", 1).over(w))
      .filter(col("valid_to").isNotNull &&
        (col("next_from").isNull || col("valid_to") =!= col("next_from")))
      .count()
    assert(bad === 0)
  }
}
