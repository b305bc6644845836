package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming tier driven by MemoryStream (§2.9). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  def mkEvents(rows: (Long, String, Long, String, Double)*): Seq[StreamOps.UserEvent] =
    rows.map { case (id, t, uid, et, v) => StreamOps.UserEvent(id, ts(t), uid, et, v) }

  val batch1 = mkEvents(
    (1, "2024-01-01 10:00:00", 1, "click", 1.0),
    (2, "2024-01-01 10:02:00", 1, "view", 2.0),
    (3, "2024-01-01 10:30:00", 1, "click", 3.0),   // > 10 min gap → new session
    (4, "2024-01-01 10:03:00", 2, "signup", 4.0))

  /** Start the query first, then feed batches one micro-batch at a time so
    * the watermark actually advances between them. */
  def runBatches(stream: MemoryStream[StreamOps.UserEvent],
                 df: org.apache.spark.sql.DataFrame,
                 mode: String, name: String,
                 batches: Seq[Seq[StreamOps.UserEvent]]): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("RocksDB state store backend: the production state provider runs the stateful ops") {
    // local[32] tests default to the in-memory HDFSBackedStateStore; a
    // 1000-executor deployment runs RocksDB (bounded heap, spillable
    // state). The tumbling-agg + dedup chain and the session windows must
    // produce IDENTICAL results under the production provider — pinning
    // that no operator here depends on in-memory-provider semantics.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = batch1 ++ mkEvents((9, "2024-01-01 10:40:00", 2, "click", 5.0))
      val flush = mkEvents((99, "2024-01-01 13:00:00", 9, "view", 0.0))
      def run(name: String, mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Set[String] = {
        val stream = MemoryStream[StreamOps.UserEvent]
        runBatches(stream, mk(stream.toDF()), "append", name,
          Seq(evs ++ evs, flush)) // duplicated feed exercises dedup state
          .collect().map(_.mkString("|")).toSet
      }
      val rocksAgg = run("rocks_agg", StreamOps.dedupedTumblingCounts(_))
      val rocksSes = run("rocks_ses", StreamOps.dedupedSessionCounts(_))
      spark.conf.unset(key) // back to the default provider
      val memAgg = run("mem_agg", StreamOps.dedupedTumblingCounts(_))
      val memSes = run("mem_ses", StreamOps.dedupedSessionCounts(_))
      assert(rocksAgg === memAgg && rocksAgg.nonEmpty)
      assert(rocksSes === memSes && rocksSes.nonEmpty)
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("session_window agrees with the batch gap-clustering semantics") {
    val stream = MemoryStream[StreamOps.UserEvent]
    val out = runBatches(stream,
      StreamOps.sessionCounts(stream.toDF(), "10 minutes"), "append", "sessions",
      // second batch advances the watermark far enough to close all sessions
      Seq(batch1, mkEvents((99, "2024-01-01 12:00:00", 9, "click", 0.0))))
    val u1 = out.filter($"user_id" === 1).orderBy("session_start")
      .select("n_events").as[Long].collect().toSeq
    assert(u1 === Seq(2L, 1L)) // events 1+2 in one session, 3 alone
    val u2 = out.filter($"user_id" === 2).select("n_events").as[Long].collect().toSeq
    assert(u2 === Seq(1L))
  }

  test("session_window (batch mode) agrees with the A1 window formulation on real data") {
    // same 10-minute gap: the streaming-native operator and the lag+cumsum
    // batch formulation must carve identical sessions
    val events = graft.Tables.events(spark, sf0001)
    val native = StreamOps.sessionCounts(events.withColumnRenamed("x", "x"), "10 minutes")
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = graft.operators.Aggregates.a01Sessionize(spark, sf0001)
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(native === batch)
  }

  test("tumbling window with watermark drops late data") {
    val stream = MemoryStream[StreamOps.UserEvent]
    val out = runBatches(stream,
      StreamOps.tumblingCounts(stream.toDF(), "1 hour", "30 minutes"), "append", "tumbling",
      Seq(batch1,
        mkEvents((5, "2024-01-01 12:00:00", 3, "click", 1.0)),  // watermark → 11:30
        mkEvents((6, "2024-01-01 09:00:00", 3, "click", 1.0)))) // late → dropped
    val closed = out.filter($"window_start" === ts("2024-01-01 09:00:00")).count()
    assert(closed === 0, "late event must not resurrect a closed window")
    val tenOclock = out.filter($"window_start" === ts("2024-01-01 10:00:00"))
      .agg(sum("n")).as[Long].collect().head
    assert(tenOclock === 4)
  }

  test("dropDuplicatesWithinWatermark dedups replayed event ids") {
    val stream = MemoryStream[StreamOps.UserEvent]
    val out = runBatches(stream,
      StreamOps.dedupWithinWatermark(stream.toDF()), "append", "deduped",
      Seq(batch1, batch1)) // exact replay (at-least-once delivery)
    assert(out.count() === batch1.length)
  }

  test("out-of-order replay proof: any within-watermark order yields identical sinks") {
    // 12 events spanning 25 minutes — strictly inside the 30-minute
    // watermark delay, so NO permutation of arrival order can make any of
    // them late. The contract under test: event-time semantics mean the
    // sink depends only on the event SET, not the delivery order — the
    // at-least-once, out-of-order reality of any production bus.
    val evs = mkEvents(
      (1, "2024-01-01 10:00:00", 1, "click", 1.0),
      (2, "2024-01-01 10:02:00", 1, "view", 2.0),
      (3, "2024-01-01 10:04:00", 2, "click", 3.0),
      (4, "2024-01-01 10:07:00", 2, "click", 1.5),
      (5, "2024-01-01 10:09:00", 3, "view", 0.5),
      (6, "2024-01-01 10:11:00", 1, "click", 2.5),
      (7, "2024-01-01 10:13:00", 3, "signup", 1.0),
      (8, "2024-01-01 10:16:00", 2, "view", 4.0),
      (9, "2024-01-01 10:19:00", 1, "click", 0.25),
      (10, "2024-01-01 10:21:00", 3, "click", 1.0),
      (11, "2024-01-01 10:23:00", 2, "purchase", 9.0),
      (12, "2024-01-01 10:25:00", 1, "view", 3.0))
    val flush = mkEvents((99, "2024-01-01 13:00:00", 9, "view", 0.0))
    // deterministic shuffle (fixed seed) + a different micro-batch split,
    // and every event duplicated once (at-least-once redelivery)
    val shuffled = new scala.util.Random(7).shuffle(evs ++ evs)
    val reorderedBatches = shuffled.grouped(5).toSeq :+ flush
    val orderedBatches = Seq(evs ++ evs, flush)

    def sink(name: String, mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
             batches: Seq[Seq[StreamOps.UserEvent]]): Set[String] = {
      val stream = MemoryStream[StreamOps.UserEvent]
      runBatches(stream, mk(stream.toDF()), "append", name, batches)
        .collect().map(_.mkString("|")).toSet
    }
    // tumbling agg: same closed windows, same counts/sums — the duplicated
    // feed goes through dedup FIRST (chained stateful ops, one watermark),
    // as a production landing pipeline would: agg alone is not idempotent
    // under redelivery
    val aggOrdered = sink("rp_agg_o", StreamOps.dedupedTumblingCounts(_), orderedBatches)
    val aggShuffled = sink("rp_agg_s", StreamOps.dedupedTumblingCounts(_), reorderedBatches)
    assert(aggOrdered === aggShuffled && aggOrdered.nonEmpty)
    // landing dedup alone: replayed + reordered ⇒ exactly the unique set
    val dedupShuffled = sink("rp_dd_s", StreamOps.dedupWithinWatermark, reorderedBatches)
    assert(dedupShuffled.size === evs.length + flush.length)
    // session windows: gap clustering is event-time-only too
    val sesOrdered = sink("rp_ses_o", StreamOps.dedupedSessionCounts(_), orderedBatches)
    val sesShuffled = sink("rp_ses_s", StreamOps.dedupedSessionCounts(_), reorderedBatches)
    assert(sesOrdered === sesShuffled && sesOrdered.nonEmpty)
  }

  test("stream-stream interval join matches its own batch execution") {
    val data = mkEvents(
      (1, "2024-01-01 10:00:00", 1, "click", 1.0),
      (2, "2024-01-01 10:05:00", 1, "purchase", 9.0),  // joins click 1 (5 min)
      (3, "2024-01-01 10:20:00", 1, "purchase", 9.0),  // no click in window
      (4, "2024-01-01 10:18:00", 2, "click", 1.0),
      (5, "2024-01-01 10:19:00", 2, "click", 1.0),
      (6, "2024-01-01 10:25:00", 2, "purchase", 9.0))  // joins clicks 4 AND 5
    val stream = MemoryStream[StreamOps.UserEvent]
    val out = runBatches(stream,
      StreamOps.clickPurchaseJoin(stream.toDF()), "append", "ssjoin",
      // late tick advances both watermarks so all join state flushes
      Seq(data, mkEvents((99, "2024-01-01 12:00:00", 9, "view", 0.0))))
    val got = out.select("p_id", "c_id").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 1L), (6L, 4L), (6L, 5L)))
    // batch execution of the identical transform agrees
    val batch = StreamOps.clickPurchaseJoin(data.toDF())
      .select("p_id", "c_id").as[(Long, Long)].collect().toSet
    assert(batch === got)
  }

  test("stream-stream LEFT OUTER join: null rows emit on watermark expiry, final sink = batch") {
    val data = mkEvents(
      (1, "2024-01-01 10:00:00", 1, "click", 1.0),
      (2, "2024-01-01 10:05:00", 1, "purchase", 9.0),  // joins click 1
      (3, "2024-01-01 10:20:00", 1, "purchase", 9.0),  // NO click in window
      (4, "2024-01-01 10:18:00", 2, "click", 1.0),
      (5, "2024-01-01 10:19:00", 2, "click", 1.0),
      (6, "2024-01-01 10:25:00", 2, "purchase", 9.0))  // joins clicks 4 AND 5
    val stream = MemoryStream[StreamOps.UserEvent]
    val q = StreamOps.clickPurchaseLeftOuter(stream.toDF()).writeStream
      .format("memory").queryName("ssloj").outputMode("append").start()
    try {
      stream.addData(data); q.processAllAvailable()
      // the unmatched purchase's null row must NOT exist yet: the click
      // watermark has not passed the last instant a match could arrive —
      // this is the state-expiry semantics, observable only in the stream
      val early = spark.table("ssloj").select("p_id", "c_id")
        .as[(Long, Option[Long])].collect().toSet
      assert(!early.contains((3L, None)),
        s"null row emitted before watermark expiry: $early")
      // Late ticks must pass BOTH side filters: each side's watermark
      // advances only on rows its own EventTimeWatermark node observes
      // (a 'view' tick would be filtered out upstream and move nothing),
      // and eviction uses the GLOBAL watermark = min of the two. The
      // watermark also lags one batch (computed at batch end), so a
      // second tick batch triggers the actual expiry scan.
      stream.addData(mkEvents(
        (99, "2024-01-01 12:00:00", 9, "click", 0.0),
        (199, "2024-01-01 12:00:00", 8, "purchase", 0.0)))
      q.processAllAvailable()
      stream.addData(mkEvents(
        (100, "2024-01-01 12:40:00", 9, "click", 0.0),
        (200, "2024-01-01 12:40:00", 8, "purchase", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    // tick purchases (199/200) may or may not have expired by stream end —
    // assert on the data rows only
    val got = spark.table("ssloj").select("p_id", "c_id")
      .as[(Long, Option[Long])].collect().toSet.filter(_._1 <= 6L)
    assert(got === Set((2L, Some(1L)), (6L, Some(4L)), (6L, Some(5L)), (3L, None)))
    // batch execution of the identical transform agrees (nulls immediate)
    val batch = StreamOps.clickPurchaseLeftOuter(data.toDF())
      .select("p_id", "c_id").as[(Long, Option[Long])].collect().toSet
    assert(batch === got)
  }

  test("stream-stream FULL OUTER join: BOTH sides' null rows emit only on expiry, final sink = batch") {
    val data = mkEvents(
      (1, "2024-01-01 10:00:00", 1, "click", 1.0),
      (2, "2024-01-01 10:05:00", 1, "purchase", 9.0),  // joins click 1
      (3, "2024-01-01 10:20:00", 1, "purchase", 9.0),  // NO click in window
      (4, "2024-01-01 10:18:00", 2, "click", 1.0),
      (5, "2024-01-01 10:19:00", 2, "click", 1.0),
      (6, "2024-01-01 10:25:00", 2, "purchase", 9.0),  // joins clicks 4 AND 5
      (7, "2024-01-01 10:30:00", 3, "click", 1.0))     // NO purchase at all
    val stream = MemoryStream[StreamOps.UserEvent]
    val q = StreamOps.clickPurchaseFullOuter(stream.toDF()).writeStream
      .format("memory").queryName("ssfoj").outputMode("append").start()
    try {
      stream.addData(data); q.processAllAvailable()
      // NEITHER side's null row may exist yet: the purchase-side null (3)
      // waits on the click watermark, the click-side null (7) waits on the
      // purchase watermark — both-side state expiry is exactly what this
      // join mode adds over LEFT OUTER
      val early = spark.table("ssfoj").select("p_id", "c_id")
        .as[(Option[Long], Option[Long])].collect().toSet
      assert(!early.contains((Some(3L), None)),
        s"purchase-side null emitted before watermark expiry: $early")
      assert(!early.contains((None, Some(7L))),
        s"click-side null emitted before watermark expiry: $early")
      // late ticks on BOTH side filters (see the LEFT OUTER test for why),
      // twice — the watermark lags one batch
      stream.addData(mkEvents(
        (99, "2024-01-01 12:00:00", 9, "click", 0.0),
        (199, "2024-01-01 12:00:00", 8, "purchase", 0.0)))
      q.processAllAvailable()
      stream.addData(mkEvents(
        (100, "2024-01-01 12:40:00", 9, "click", 0.0),
        (200, "2024-01-01 12:40:00", 8, "purchase", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    // tick rows (ids ≥ 99) may or may not have expired by stream end —
    // assert on the data rows only
    val got = spark.table("ssfoj").select("p_id", "c_id")
      .as[(Option[Long], Option[Long])].collect().toSet
      .filter(r => r._1.exists(_ <= 7L) || r._2.exists(_ <= 7L))
    assert(got === Set(
      (Some(2L), Some(1L)), (Some(6L), Some(4L)), (Some(6L), Some(5L)),
      (Some(3L), None), (None, Some(7L))))
    // batch execution of the identical transform agrees (nulls immediate)
    val batch = StreamOps.clickPurchaseFullOuter(data.toDF())
      .select("p_id", "c_id").as[(Option[Long], Option[Long])].collect().toSet
    assert(batch === got)
  }

  test("stream-static dim join enriches each micro-batch, stateless") {
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("dim_key", "dim_segment")
    val stream = MemoryStream[StreamOps.UserEvent]
    val out = runBatches(stream,
      StreamOps.enrichWithDim(stream.toDF(), dim), "append", "dimjoin",
      // user 3 is outside the dim in BOTH batches → dropped; the second
      // batch proves the static side is re-joined per micro-batch
      Seq(batch1, mkEvents((7, "2024-01-01 11:00:00", 2, "click", 5.0),
        (8, "2024-01-01 11:01:00", 3, "click", 5.0))))
    val got = out.select("event_id", "dim_segment").as[(Long, String)]
      .collect().toSet
    assert(got === Set((1L, "gold"), (2L, "gold"), (3L, "gold"),
      (4L, "basic"), (7L, "basic")))
    // batch execution of the identical transform agrees
    val batch = StreamOps.enrichWithDim(
        (batch1 ++ mkEvents((7, "2024-01-01 11:00:00", 2, "click", 5.0),
          (8, "2024-01-01 11:01:00", 3, "click", 5.0))).toDF(), dim)
      .select("event_id", "dim_segment").as[(Long, String)].collect().toSet
    assert(batch === got)
  }

  test("file-stream source: the same transform runs over a parquet directory stream") {
    // prod shape: readStream over a landing directory; here the sf0.001
    // events parquet replayed as one micro-batch
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    graft.Tables.events(spark, sf0001).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.tumblingCounts(stream, "6 hours", "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("filestream").start()
    q.processAllAvailable()
    q.stop()
    // append mode only emits watermark-closed windows; every emitted row
    // must match the batch aggregation exactly
    val streamed = spark.table("filestream")
      .select("window_start", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.Tables.events(spark, sf0001)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("event_type"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, n) => assert(batch(k) === n, s"window $k") }
  }

  test("stateful burst debounce replayed over real data matches batch f07") {
    val evs = graft.Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .as[StreamOps.UserEvent].collect().toSeq
    val stream = MemoryStream[StreamOps.UserEvent]
    val out = runBatches(stream, StreamOps.burstDebounce(stream.toDS()).toDF(),
      "append", "debounce", evs.grouped(400).toSeq)
    val got = out.select("event_id").as[Long].collect().toSet
    val want = graft.operators.Aggregates.f07DedupBursts(spark, sf0001)
      .select("event_id").as[Long].collect().toSet
    assert(want.nonEmpty && got === want)
  }

  test("burst debounce suppresses chains across micro-batch boundaries") {
    // 1-4 chain at 3s gaps (keep only 1); 5 is 10s later (kept); user 2's
    // simultaneous pair keeps the lower event_id. The chain spans the batch
    // split after event 2, so suppression must flow through state.
    val evs = mkEvents(
      (1, "2024-01-01 10:00:00", 1, "click", 1.0),
      (2, "2024-01-01 10:00:03", 1, "click", 1.0),
      (3, "2024-01-01 10:00:06", 1, "click", 1.0),
      (4, "2024-01-01 10:00:09", 1, "click", 1.0),
      (5, "2024-01-01 10:00:19", 1, "click", 1.0),
      (6, "2024-01-01 10:00:00", 2, "view", 1.0),
      (7, "2024-01-01 10:00:00", 2, "view", 1.0),
      (8, "2024-01-01 10:00:04", 1, "view", 1.0)) // other type: own chain
    val stream = MemoryStream[StreamOps.UserEvent]
    val out = runBatches(stream, StreamOps.burstDebounce(stream.toDS()).toDF(),
      "append", "debounce_chain", Seq(evs.take(2), evs.drop(2)))
    assert(out.select("event_id").as[Long].collect().toSet === Set(1L, 5L, 6L, 8L))
  }

  test("capped sessions: gap OR cap closes, hand-checked") {
    // user 1: five events 1 min apart (one gap-session) with cap 2 →
    // sessions of 2/2/1, reasons cap/cap/gap; user 2: two events split by
    // an 11-min gap → two 1-event gap sessions
    val evs = mkEvents(
      (1, "2024-01-01 10:00:00", 1, "click", 1.0),
      (2, "2024-01-01 10:01:00", 1, "click", 2.0),
      (3, "2024-01-01 10:02:00", 1, "click", 4.0),
      (4, "2024-01-01 10:03:00", 1, "click", 8.0),
      (5, "2024-01-01 10:04:00", 1, "click", 16.0),
      (6, "2024-01-01 10:00:00", 2, "view", 1.5),
      (7, "2024-01-01 10:11:00", 2, "view", 2.5))
    val flush = mkEvents((99, "2024-01-01 13:00:00", 9, "view", 0.0))
    val stream = MemoryStream[StreamOps.UserEvent]
    val out = runBatches(stream,
      StreamOps.cappedSessions(stream.toDS()).toDF(), "append", "capped",
      Seq(evs, flush))
    val got = out.filter($"user_id" <= 2)
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events", "sum_value", "close_reason")
      .as[(Long, Long, Double, String)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 3.0, "cap"), (1L, 2L, 12.0, "cap"), (1L, 1L, 16.0, "gap"),
      (2L, 1L, 1.5, "gap"), (2L, 1L, 2.5, "gap")))
  }

  test("capped sessions TTL: the open session emits only after the watermark passes its gap expiry") {
    val stream = MemoryStream[StreamOps.UserEvent]
    val q = StreamOps.cappedSessions(stream.toDS()).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("capped_ttl").start()
    stream.addData(mkEvents((1, "2024-01-01 10:00:00", 1, "click", 1.0)))
    q.processAllAvailable()
    // advance the watermark to 10:05 (< 10:00 + 10 min): session still open
    stream.addData(mkEvents((2, "2024-01-01 10:35:00", 9, "view", 0.0)))
    q.processAllAvailable()
    assert(spark.table("capped_ttl").filter($"user_id" === 1).count() === 0,
      "session must NOT emit before its event-time TTL")
    // advance past 10:10: the timeout fires, the session flushes, state dies
    stream.addData(mkEvents((3, "2024-01-01 11:00:00", 9, "view", 0.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("capped_ttl").filter($"user_id" === 1)
      .select("n_events", "close_reason").as[(Long, String)].collect().toSeq
    assert(rows === Seq((1L, "gap")))
  }

  test("capped sessions replayed shuffled + duplicated over real data matches the batch twin") {
    // the full replay bar: EVERY event duplicated, the whole feed shuffled
    // with a fixed seed, arbitrary micro-batch splits — the event-time
    // buffering (fold only up to the watermark) must still reproduce the
    // batch twin exactly, including the decimal-carrier sums. The shuffle
    // disorders a MONTH of event time, so the watermark delay (= the
    // feed's disorder bound) is widened to cover it: the contract proved
    // is "any at-least-once feed within the watermark delay".
    val evs = graft.Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamOps.UserEvent].collect().toSeq
    val flush = mkEvents((999999, "2030-01-01 00:00:00", 999, "view", 0.0))
    val shuffled = new scala.util.Random(13).shuffle(evs ++ evs)
    val stream = MemoryStream[StreamOps.UserEvent]
    val out = runBatches(stream,
      StreamOps.cappedSessions(stream.toDS(), watermark = "60 days").toDF(),
      "append", "capped_replay",
      shuffled.grouped(700).toSeq :+ flush)
    val got = out.filter($"user_id" =!= 999)
      .select("user_id", "session_start", "session_end", "n_events",
        "sum_value", "close_reason")
      .collect().map(_.mkString("|")).toSet
    val want = graft.operators.SetOpsWindows.streamCappedSessions(spark, sf0001)
      .collect().map(_.mkString("|")).toSet
    assert(want.nonEmpty && got === want)
  }

  test("capped sessions run identically under the RocksDB state provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    val evs = batch1 ++ mkEvents((9, "2024-01-01 10:04:30", 1, "click", 7.0))
    val flush = mkEvents((99, "2024-01-01 13:00:00", 9, "view", 0.0))
    def run(name: String): Set[String] = {
      val stream = MemoryStream[StreamOps.UserEvent]
      runBatches(stream, StreamOps.cappedSessions(stream.toDS()).toDF(),
        "append", name, Seq(evs ++ evs, flush))
        .collect().map(_.mkString("|")).toSet
    }
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val rocks = run("capped_rocks")
      spark.conf.unset(key)
      val mem = run("capped_mem")
      assert(rocks === mem && rocks.nonEmpty)
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("foreachBatch upsert sink: last-wins merge, replay-convergent") {
    val target = java.nio.file.Files.createTempDirectory("upsink").toString + "/t"
    val stream = MemoryStream[StreamOps.UserEvent]
    val q = stream.toDF().writeStream
      .foreachBatch(StreamOps.upsertBatch(target, "event_id", Seq("ts")) _)
      .outputMode("append").start()
    stream.addData(batch1); q.processAllAvailable()
    // batch 2 updates event 1 and adds event 10
    val updates = mkEvents(
      (1, "2024-01-01 10:00:00", 1, "click", 99.0),
      (10, "2024-01-01 11:00:00", 5, "view", 5.0))
    stream.addData(updates); q.processAllAvailable()
    // replay of batch 2 (at-least-once delivery) must not change the state
    stream.addData(updates); q.processAllAvailable()
    q.stop()
    val state = spark.read.parquet(target)
      .select("event_id", "value").as[(Long, Double)].collect().toMap
    assert(state.keySet === Set(1L, 2L, 3L, 4L, 10L))
    assert(state(1L) === 99.0, "update must win over the original row")
    assert(state(10L) === 5.0)
    assert(state(2L) === 2.0)
  }

  test("checkpoint recovery: killed dedup->agg pipeline restarts into an identical upsert sink") {
    // The exactly-once claim ACROSS RESTARTS: run the stream_dedup_agg
    // pipeline (file source -> dropDuplicatesWithinWatermark -> tumbling
    // agg -> foreachBatch upsert) over a landing dir, stop the query
    // mid-stream, land more data INCLUDING A REPLAY of an already-seen
    // event id, restart from the same checkpoint, and require the final
    // sink to equal (a) an uninterrupted run over the same chunks and
    // (b) the hand-computed dedup'd aggregate. If restart lost the dedup
    // state store or the file-source log, the replayed id would inflate a
    // count or chunk1 would double-process.
    import java.nio.file.{Files => JF, Paths => JP}
    val base = JF.createTempDirectory("ckrec").toString
    val schema = Seq.empty[StreamOps.UserEvent].toDF().schema
    def land(src: String, n: Int, evs: Seq[StreamOps.UserEvent]): Unit = {
      val stage = s"$base/stage_${src.hashCode}_$n"
      evs.toDF().coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      JF.createDirectories(JP.get(src))
      JF.move(part.toPath, JP.get(s"$src/chunk$n.parquet"))
    }
    def startQ(src: String, cp: String, target: String) = {
      JF.createDirectories(JP.get(src)) // the source dir must pre-exist
      val stream = spark.readStream.schema(schema).parquet(src)
      StreamOps.dedupedTumblingCounts(stream)
        .withColumn("k", concat_ws("|",
          col("window_start").cast("string"), col("event_type")))
        .writeStream
        .foreachBatch(StreamOps.upsertBatch(target, "k", Seq("n")) _)
        .option("checkpointLocation", cp)
        .outputMode("append").start()
    }
    val chunk1 = mkEvents(
      (1, "2024-01-01 10:00:00", 1, "click", 1.0),
      (2, "2024-01-01 10:05:00", 1, "click", 2.0),
      (2, "2024-01-01 10:05:00", 1, "click", 2.0), // in-batch duplicate
      (3, "2024-01-01 10:10:00", 2, "click", 3.0))
    val chunk2 = mkEvents(
      (3, "2024-01-01 10:10:00", 2, "click", 3.0), // replay ACROSS the restart
      (5, "2024-01-01 11:05:00", 1, "click", 5.0),
      (6, "2024-01-01 11:10:00", 2, "view", 6.0),
      (7, "2024-01-01 11:40:00", 3, "view", 7.0)) // watermark 11:10 closes 10:00
    val chunk3 = mkEvents(
      (8, "2024-01-01 13:00:00", 1, "click", 8.0)) // watermark 12:30 closes 11:00
    def readSink(target: String): Set[(String, String, Long, Double)] =
      spark.read.parquet(target)
        .select(col("window_start").cast("string"), col("event_type"),
          col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
    // interrupted run: chunk1 -> STOP -> restart -> chunk2 -> chunk3
    val (srcA, cpA, tA) = (s"$base/srcA", s"$base/cpA", s"$base/tA")
    land(srcA, 1, chunk1)
    val q1 = startQ(srcA, cpA, tA)
    q1.processAllAvailable(); q1.stop() // the "kill"
    land(srcA, 2, chunk2)
    val q2 = startQ(srcA, cpA, tA) // resumes from the checkpoint
    q2.processAllAvailable()
    land(srcA, 3, chunk3)
    q2.processAllAvailable(); q2.stop()
    // uninterrupted twin over the same chunk schedule
    val (srcB, cpB, tB) = (s"$base/srcB", s"$base/cpB", s"$base/tB")
    val qb = startQ(srcB, cpB, tB)
    Seq(chunk1, chunk2, chunk3).zipWithIndex.foreach { case (c, i) =>
      land(srcB, i + 1, c); qb.processAllAvailable()
    }
    qb.stop()
    val recovered = readSink(tA)
    assert(recovered === readSink(tB), "restarted sink diverged from uninterrupted run")
    // and both equal the dedup'd closed-window aggregate
    assert(recovered === Set(
      ("2024-01-01 10:00:00", "click", 3L, 6.0),  // ids 1,2,3 — replays collapsed
      ("2024-01-01 11:00:00", "click", 1L, 5.0),  // id 5
      ("2024-01-01 11:00:00", "view", 2L, 13.0))) // ids 6,7; 13:00 window still open
  }

  test("flatMapGroupsWithState maintains running per-user totals across batches") {
    val stream = MemoryStream[StreamOps.UserEvent]
    val out = runBatches(stream,
      StreamOps.runningUserTotals(stream.toDS()).toDF(), "append", "running",
      Seq(batch1.filter(_.user_id == 1).take(2), batch1.filter(_.user_id == 1).drop(2)))
    val rows = out.filter($"user_id" === 1).orderBy("n_events")
      .select("n_events", "total_value").as[(Long, Double)].collect()
    assert(rows.last === ((3L, 6.0))) // final state: 3 events, 1+2+3
  }
}
