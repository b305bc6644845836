package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: Long): Timestamp = new Timestamp(s * 1000)

  val left = Seq(
    (101L, 1L, ts(100)), // after right rows at 80, 90 → match 90
    (102L, 1L, ts(85)),  // between 80 and 90 → match 80
    (103L, 1L, ts(50)),  // before any right → null
    (104L, 2L, ts(100)), // key with no right rows → null
    (105L, 3L, ts(70))   // exactly simultaneous right → matches it (>=)
  ).toDF("event_id", "user_id", "ts")

  val right = Seq(
    (1L, ts(80), 901L),
    (1L, ts(90), 902L),
    (3L, ts(70), 903L),
    (4L, ts(10), 904L)
  ).toDF("user_id", "ts", "click_id")

  lazy val out = AsOf.joinAsOf(left, right, Seq("user_id"), "ts", "ts",
      Seq("click_id"), prefix = "last_")
    .collect().map(r => r.getAs[Long]("event_id") ->
      Option(r.getAs[java.lang.Long]("last_click_id")).map(_.toLong)).toMap

  test("attaches the latest right row at or before each left timestamp") {
    assert(out(101L) === Some(902L))
    assert(out(102L) === Some(901L))
    assert(out(105L) === Some(903L)) // inclusive at equality
  }

  test("left rows with no eligible right row get nulls, and are kept") {
    assert(out(103L) === None)
    assert(out(104L) === None)
    assert(out.size === 5)
  }

  test("NULL payload in the matched right row stays NULL (no bleed-forward)") {
    val r2 = Seq(
      (1L, ts(80), Some(901L)),
      (1L, ts(90), None)        // newer row with NULL payload
    ).toDF("user_id", "ts", "click_id")
    val got = AsOf.joinAsOf(
        Seq((201L, 1L, ts(100))).toDF("event_id", "user_id", "ts"),
        r2, Seq("user_id"), "ts", "ts", Seq("click_id"), prefix = "last_")
      .collect().head
    assert(got.getAs[java.sql.Timestamp]("last_ts") === ts(90))
    assert(got.getAs[Any]("last_click_id") === null) // DuckDB ASOF semantics
  }

  test("right rows never appear as output rows") {
    val n = AsOf.joinAsOf(left, right, Seq("user_id"), "ts", "ts", Seq("click_id")).count()
    assert(n === left.count())
  }

  test("forward mode attaches the earliest right row at or after each left ts") {
    val fwd = AsOf.joinAsOf(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id"), prefix = "next_", forward = true)
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("next_click_id")).map(_.toLong)).toMap
    assert(fwd(101L) === None)       // nothing after 100
    assert(fwd(102L) === Some(902L)) // next after 85 is 90
    assert(fwd(103L) === Some(901L)) // next after 50 is 80
    assert(fwd(104L) === None)
    assert(fwd(105L) === Some(903L)) // inclusive at equality
    assert(fwd.size === 5)
  }

  test("forward tie-break at simultaneous right rows picks the max payload") {
    val r2 = Seq((1L, ts(80), 901L), (1L, ts(80), 905L))
      .toDF("user_id", "ts", "click_id")
    val got = AsOf.joinAsOf(
        Seq((201L, 1L, ts(70))).toDF("event_id", "user_id", "ts"),
        r2, Seq("user_id"), "ts", "ts", Seq("click_id"), prefix = "next_",
        tieBreak = Some("click_id"), forward = true)
      .collect().head
    assert(got.getAs[Long]("next_click_id") === 905L)
  }

  test("forward is the time-mirror of backward (duality on negated clocks)") {
    // joinAsOf(forward) must equal joinAsOf(backward) run on negated
    // timestamps — pins that the two directions share one semantics and
    // differ only in scan order
    def neg(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(-unix_micros(ts))"))
    val fwd = AsOf.joinAsOf(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id"), prefix = "m_", forward = true)
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("m_click_id")).map(_.toLong)).toMap
    val mirrored = AsOf.joinAsOf(neg(left), neg(right), Seq("user_id"), "ts", "ts",
        Seq("click_id"), prefix = "m_", forward = false)
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("m_click_id")).map(_.toLong)).toMap
    assert(fwd === mirrored)
  }

  test("plan is one shuffle on the key — no range join, no cartesian") {
    val df = AsOf.joinAsOf(left, right, Seq("user_id"), "ts", "ts", Seq("click_id"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)   // union + window, not a join at all
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }
}
