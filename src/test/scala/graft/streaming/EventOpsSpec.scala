package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class EventOpsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  test("sessionize splits on gaps > threshold") {
    // user 7: events at t=0,10,20 then 60min gap -> 2 sessions
    val df = Seq(
      (1L, us(0), 7L), (2L, us(10), 7L), (3L, us(20), 7L), (4L, us(80), 7L),
      (5L, us(5), 8L)).toDF("event_id", "ts_us", "user_id")
    val got = EventOps.sessionize(df, us(30)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(7L) == ((4L, 2L)))
    assert(got(8L) == ((1L, 1L)))
  }

  test("as-of last click before error") {
    val df = Seq(
      (1L, us(0), 7L, "click"), (2L, us(10), 7L, "view"),
      (3L, us(20), 7L, "error"), (4L, us(30), 7L, "click"),
      (5L, us(40), 7L, "error"), (6L, us(1), 9L, "error"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val got = EventOps.lastClickBeforeError(df).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got(3L) == Some(us(0)))  // click at t=0
    assert(got(5L) == Some(us(30))) // later click wins
    assert(got(6L) == None)         // user 9 never clicked
  }

  test("interval join counts clicks in [error - gap, error] per user") {
    val df = Seq(
      (1L, us(0), 7L, "click"), (2L, us(10), 7L, "click"),
      (3L, us(20), 7L, "error"),  // clicks at 0,10 within 30min -> 2 pairs
      (4L, us(60), 7L, "error"),  // nothing within [30, 60] -> no row share
      (5L, us(5), 9L, "view"))    // no clicks for user 9
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val got = EventOps.clickErrorPairs(df, us(30)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 2L))
  }

  test("bucketed interval join equals the direct range join") {
    val sfDir = "/root/testdata/sf0.001"
    val gap = 30L * 60 * 1000000L
    val ev = EventOps.events(spark, sfDir)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(toMap(EventOps.clickErrorPairsBucketed(ev, gap)) ==
      toMap(EventOps.clickErrorPairs(ev, gap)))
    // boundary case: click exactly gap before error, and exactly at it
    import spark.implicits._
    val edge = Seq(
      (1L, us(0), 7L, "click"), (2L, us(30), 7L, "error"),
      (3L, us(30), 7L, "click"), (4L, us(31), 9L, "click"),
      (5L, us(30), 9L, "error"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val got = toMap(EventOps.clickErrorPairsBucketed(edge, us(30)))
    assert(got == Map(7L -> 2L)) // both boundary clicks; user 9's later click no
  }

  test("stateful streaming sessionization matches the batch operator") {
    val sfDir = "/root/testdata/sf0.001"
    val batch = EventOps.sessionize(
      EventOps.events(spark, sfDir), 30L * 60 * 1000000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val stream = EventOps.streamingEvents(spark, sfDir)
      .selectExpr("user_id", "ts div 1000 AS ts_us", "event_id")
      .as[UserEvent]
    val q = EventOps.statefulSessionCounts(stream, 30L * 60 * 1000000L)
      .writeStream.outputMode("update")
      .format("memory").queryName("sess_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sess_stream")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
  }

  test("structured streaming hourly agg matches the batch result") {
    val sfDir = "/root/testdata/sf0.001"
    val batch = EventOps.hourly(EventOps.events(spark, sfDir))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val q = EventOps.streamingHourly(spark, sfDir)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly_stream")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(streamed == batch)
  }

  test("native session_window matches the lag-window sessionization") {
    val sfDir = "/root/testdata/sf0.001"
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val gapUs = 30L * 60 * 1000000L
    val ev = EventOps.events(spark, sfDir)
    assert(key(EventOps.sessionizeNative(ev, gapUs)) ==
      key(EventOps.sessionize(ev, gapUs)))
    // boundary: a gap of EXACTLY gapUs stays one session in both forms
    // (session_window merges end-inclusively, diff <= gap, same as the
    // lag form); gapUs+1 splits in both
    import org.apache.spark.sql.functions._
    def mk(ts: Long*) = ts.zipWithIndex
      .map { case (t, i) => (7L, i.toLong, t) }
      .toDF("user_id", "event_id", "ts_us")
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
    for ((gap2, want) <- Seq(gapUs -> 1L, (gapUs + 1) -> 2L)) {
      val d = mk(0L, gap2)
      assert(EventOps.sessionize(d, gapUs).head().getLong(2) == want)
      assert(EventOps.sessionizeNative(d, gapUs).head().getLong(2) == want)
    }
  }

  test("watermark finalizes windows and drops late events behind it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val agg = in.toDF().toDF("event_ts", "event_type")
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "HH").as("hour"),
        col("event_type"), col("n"))
    val sq = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      // batch 1: two 10:xx clicks + a 12:30 view -> watermark 11:30,
      // the 10:00 window is finalized and emitted
      in.addData(
        (ts("2026-01-01 10:05:00"), "click"),
        (ts("2026-01-01 10:10:00"), "click"),
        (ts("2026-01-01 12:30:00"), "view"))
      sq.processAllAvailable()
      // batch 2: a LATE 10:20 click — behind the watermark, its window
      // state is gone -> must be dropped, not re-emitted
      in.addData((ts("2026-01-01 10:20:00"), "click"))
      sq.processAllAvailable()
      // batch 3: advance the watermark to 13:00 to flush the 12:00 window
      in.addData((ts("2026-01-01 14:00:00"), "view"))
      sq.processAllAvailable()
    } finally sq.stop()
    val got = spark.table("wm_test").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // late click NOT counted: the finalized 10:00 window stays at 2
    assert(got == Map(("10", "click") -> 2L, ("12", "view") -> 1L))
  }

  test("stream-stream interval join under late arrival: strict subset of batch") {
    // Pins the r13 sf100 divergence SEMANTICS (6,720 of 168,000 pairs —
    // a strict subset) as a deterministic contract: an error arriving
    // behind the watermark is dropped by the stateful join, so a
    // bounded-trigger run over out-of-order input yields a SUBSET of the
    // batch interval join — never extra rows. A watermark-delay or
    // late-row-filter regression would flip this loudly.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val errors = MemoryStream[(Long, java.sql.Timestamp)]
    val joinCond = expr("""c_user = e_user
      AND click_ts >= err_ts - INTERVAL 1800 SECONDS
      AND click_ts <= err_ts""")
    val joined = clicks.toDF().toDF("c_user", "click_ts")
      .withWatermark("click_ts", "1 hour")
      .join(errors.toDF().toDF("e_user", "err_ts")
        .withWatermark("err_ts", "1 hour"), joinCond)
    val sq = joined.writeStream.format("memory").queryName("ij_late")
      .outputMode("append").start()
    val allClicks = Seq(
      (7L, ts("2026-01-01 10:00:00")), (7L, ts("2026-01-01 13:00:00")))
    // user 99 never clicks — its 13:00 error only advances the error
    // side's event-time max (the GLOBAL watermark is the MIN across all
    // watermarked inputs, so both sides must move for it to advance)
    val batch1Errors = Seq(
      (7L, ts("2026-01-01 10:10:00")), (99L, ts("2026-01-01 13:00:00")))
    val lateError = (7L, ts("2026-01-01 10:20:00"))
    try {
      // batch 1: click 10:00 + error 10:10 pair up; both sides reach
      // 13:00 -> global watermark 12:00
      clicks.addData(allClicks: _*)
      errors.addData(batch1Errors: _*)
      sq.processAllAvailable()
      // batch 2: error 10:20 would pair with the 10:00 click in batch
      // semantics, but arrives 100 min behind the watermark -> dropped
      errors.addData(lateError)
      sq.processAllAvailable()
    } finally sq.stop()
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("c_user", "click_ts", "err_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    val streamed = pairs(spark.table("ij_late"))
    val batch = pairs(
      allClicks.toDF("c_user", "click_ts").join(
        (batch1Errors :+ lateError).toDF("e_user", "err_ts"), joinCond))
    assert(streamed.subsetOf(batch), "late arrival must never ADD pairs")
    assert(streamed.size == 1 && batch.size == 2,
      s"late error must be dropped: streamed=$streamed batch=$batch")
  }

  test("dropDuplicatesWithinWatermark re-admits a key past the horizon") {
    // Pins the r13 finding that dedup-within-watermark's divergence is
    // CONTRACTUAL (horizon-bounded state re-admits keys after expiry,
    // in BOTH arrival orders), not an ordering artifact: a key's state
    // lives until the watermark passes eventTime + delay, after which
    // the same key is emitted AGAIN — unlike global dropDuplicates.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val sq = in.toDF().toDF("k", "event_ts")
      .withWatermark("event_ts", "1 hour")
      .dropDuplicatesWithinWatermark("k")
      .writeStream.format("memory").queryName("ddw_readmit")
      .outputMode("append").start()
    try {
      // batch 1: k=1 admitted at 10:00; its 10:30 duplicate is inside
      // the horizon -> dropped. Watermark after batch: 09:30.
      in.addData((1L, ts("2026-01-01 10:00:00")), (1L, ts("2026-01-01 10:30:00")))
      sq.processAllAvailable()
      // batch 2: k=2 at 14:00 advances the watermark to 13:00 — past
      // k=1's expiry (10:00 + 1 h), so its dedup state is evicted
      in.addData((2L, ts("2026-01-01 14:00:00")))
      sq.processAllAvailable()
      // batch 3: k=1 again at 14:30 — NOT late (>= watermark), state
      // gone -> re-admitted, emitted a second time
      in.addData((1L, ts("2026-01-01 14:30:00")))
      sq.processAllAvailable()
    } finally sq.stop()
    val emitted = spark.table("ddw_readmit").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    assert(emitted == Set(
      (1L, "2026-01-01 10:00:00.0"),
      (2L, "2026-01-01 14:00:00.0"),
      (1L, "2026-01-01 14:30:00.0")),
      s"horizon-bounded dedup contract changed: $emitted")
  }

  test("structured streaming sliding window matches the batch result") {
    val sfDir = "/root/testdata/sf0.001"
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val batch = key(EventOps.sliding(EventOps.events(spark, sfDir)))
    val streamed = key(EventOps.streamingSlidingResult(spark, sfDir))
    assert(streamed == batch)
    // every event lands in exactly two sliding windows
    val nEvents = EventOps.events(spark, sfDir).count()
    assert(batch.values.map(_._1).sum == 2 * nEvents)
  }

  test("rolling user features: trailing window, delta, EW score") {
    // user 7 values: 1.00, 3.00, 2.00 (cents 100, 300, 200)
    val df = Seq(
      (1L, us(0), 7L, 1.00), (2L, us(10), 7L, 3.00), (3L, us(20), 7L, 2.00))
      .toDF("event_id", "ts_us", "user_id", "value")
    val rows = EventOps.rollingUserFeatures(df)
      .orderBy("event_id").collect()
    // third event: n5=3, sum=600, min=100, max=300, mean=2.0
    val r3 = rows(2)
    assert(r3.getAs[Long]("n5") == 3L)
    assert(r3.getAs[Long]("sum5_cents") == 600L)
    assert(r3.getAs[Long]("min5_cents") == 100L)
    assert(r3.getAs[Long]("max5_cents") == 300L)
    assert(r3.getAs[Double]("mean5") == 2.0)
    assert(r3.getAs[Long]("delta_cents") == -100L)
    // EW: 200 + 300/2 + 100/4 = 375.0 (exact binary scaling)
    assert(r3.getAs[Double]("ew4_cents") == 375.0)
    // first event: no lag -> null delta, EW = own cents
    assert(rows(0).isNullAt(rows(0).fieldIndex("delta_cents")))
    assert(rows(0).getAs[Double]("ew4_cents") == 100.0)
  }

  test("streaming funnel state machine matches the batch funnel") {
    val sfDir = "/root/testdata/sf0.001"
    val batch = EventOps.funnel(
      EventOps.events(spark, sfDir), Seq("signup", "click", "purchase"))
      .head()
    val streamed = EventOps.streamingFunnelResult(
      spark, sfDir, "signup", "click", "purchase").head()
    assert(streamed.getAs[Long]("n_stage1") == batch.getAs[Long]("n_stage1"))
    assert(streamed.getAs[Long]("n_stage2") == batch.getAs[Long]("n_stage2"))
    assert(streamed.getAs[Long]("n_stage3") == batch.getAs[Long]("n_stage3"))
    assert(streamed.getAs[Double]("conversion") ==
      batch.getAs[Double]("conversion"))
  }

  test("funnel honors stage ordering, not mere presence") {
    val df = Seq(
      // user 1: signup -> click -> purchase (full conversion)
      (1L, us(0), 1L, "signup"), (2L, us(5), 1L, "click"),
      (3L, us(9), 1L, "purchase"),
      // user 2: purchase BEFORE click -> stops at stage 2
      (4L, us(0), 2L, "signup"), (5L, us(8), 2L, "click"),
      (6L, us(4), 2L, "purchase"),
      // user 3: never signed up -> not even stage 1
      (7L, us(1), 3L, "click"), (8L, us(2), 3L, "purchase"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val r = EventOps.funnel(df, Seq("signup", "click", "purchase")).head()
    assert(r.getAs[Long]("n_stage1") == 2L)
    assert(r.getAs[Long]("n_stage2") == 2L)
    assert(r.getAs[Long]("n_stage3") == 1L)
    assert(r.getAs[Double]("conversion") == 0.5)
  }
}
