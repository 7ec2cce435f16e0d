package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Structured Streaming semantics driven with MemoryStream: windowed
  * aggregation with watermark-based finalization, late-data drop,
  * stateful sessionization, and streaming dedup.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
  private def ev(id: Long, minute: Int, user: Long = 1L,
      typ: String = "click", value: Double = 1.0): Event =
    Event(id, ts(minute), user, typ, value)

  test("tumbling window with watermark finalizes and drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams
      .tumblingCounts(input.toDF(), window = "10 minutes",
        watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("tumbling").start()
    try {
      input.addData(ev(1, 0), ev(2, 3), ev(3, 9))
      q.processAllAvailable()
      // watermark still at 09:00+... nothing finalized yet in append mode
      input.addData(ev(4, 20)) // advances watermark to 10:15 → [10:00,10:10) closes
      q.processAllAvailable()
      val after = spark.table("tumbling").collect()
      assert(after.length === 1)
      val r = after.head
      assert(r.getAs[Timestamp]("window_start") === ts(0))
      assert(r.getAs[Long]("n") === 3)
      // late arrival for the closed window must be dropped
      input.addData(ev(5, 1))
      input.addData(ev(6, 40)) // push watermark further
      q.processAllAvailable()
      val finals = spark.table("tumbling").collect()
      assert(!finals.exists(r =>
        r.getAs[Timestamp]("window_start") === ts(0) && r.getAs[Long]("n") != 3))
      assert(finals.count(r => r.getAs[Timestamp]("window_start") === ts(0)) === 1)
    } finally q.stop()
  }

  test("sessionize closes a session after event-time inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // gap 10 min, watermark 5 min: user 7's session (10:00-10:05) closes
    // once the watermark passes 10:15
    val q = EventStreams
      .sessionize(input.toDS(), gapMs = 10 * 60 * 1000, watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      input.addData(ev(1, 0, user = 7, value = 2.0),
        ev(2, 5, user = 7, value = 3.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0) // session still open
      // event at 10:30 (user 8) → watermark 10:25 > 10:15 → user 7 closes
      input.addData(ev(3, 30, user = 8))
      q.processAllAvailable()
      input.addData(ev(4, 35, user = 8)) // one more batch to fire timeouts
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .filter(col("user_id") === 7).collect()
      assert(rows.length === 1)
      val s = rows.head
      assert(s.getAs[Int]("n_events") === 2)
      assert(s.getAs[Double]("total_value") === 5.0)
      assert(s.getAs[Timestamp]("first_ts") === ts(0))
      assert(s.getAs[Timestamp]("last_ts") === ts(5))
      assert(s.getAs[Boolean]("closed"))
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped").start()
    try {
      input.addData(ev(1, 0), ev(1, 0), ev(2, 1))
      q.processAllAvailable()
      input.addData(ev(1, 2), ev(3, 3)) // replay of id 1 must be dropped
      q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionize splits sessions separated by the gap WITHIN a batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams
      .sessionize(input.toDS(), gapMs = 10 * 60 * 1000,
        watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("split_sessions").start()
    try {
      // 10:00 and 10:30 in ONE batch: > 10-min gap → first session must
      // close immediately, not merge (the pre-fix behavior folded both
      // into one session because no timeout had fired yet)
      input.addData(ev(1, 0, user = 7, value = 2.0),
        ev(2, 30, user = 7, value = 3.0))
      q.processAllAvailable()
      val immediate = spark.table("split_sessions")
        .filter(col("user_id") === 7).collect()
      assert(immediate.length === 1)
      assert(immediate.head.getAs[Int]("n_events") === 1)
      assert(immediate.head.getAs[Double]("total_value") === 2.0)
      assert(immediate.head.getAs[Timestamp]("last_ts") === ts(0))
      // the 10:30 session closes via timeout once the watermark passes
      input.addData(ev(3, 50, user = 8))
      q.processAllAvailable()
      input.addData(ev(4, 55, user = 8))
      q.processAllAvailable()
      val all = spark.table("split_sessions")
        .filter(col("user_id") === 7).collect()
      assert(all.length === 2)
      assert(all.map(_.getAs[Int]("n_events")).sorted.toSeq === Seq(1, 1))
    } finally q.stop()
  }

  test("stream-stream join is multi-touch: one row per qualifying click") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val df = input.toDF()
    val q = EventStreams.clickAttribution(
      df.filter(col("event_type") === "click"),
      df.filter(col("event_type") === "purchase"),
      attributionWindow = "1 hour", watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("multitouch").start()
    try {
      input.addData(
        ev(1, 0, user = 1, typ = "click"),
        ev(2, 30, user = 1, typ = "click"),
        ev(3, 45, user = 1, typ = "purchase", value = 9.0))
      q.processAllAvailable()
      input.addData(ev(9, 59, user = 9, typ = "view"))
      q.processAllAvailable()
      val rows = spark.table("multitouch").collect()
      assert(rows.length === 2, "both clicks within the window must pair")
      assert(rows.map(_.getAs[Long]("click_id")).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("built-in session_window matches the custom sessionizer's grouping") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams
      .sessionWindowStats(input.toDF(), gap = "10 minutes",
        watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("swin").start()
    try {
      input.addData(
        ev(1, 0, user = 7, value = 2.0), ev(2, 5, user = 7, value = 3.0),
        ev(3, 40, user = 7, value = 1.0)) // separate session (gap > 10m)
      q.processAllAvailable()
      input.addData(ev(9, 59, user = 9)) // advance watermark to finalize
      q.processAllAvailable()
      input.addData(ev(10, 99, user = 9))
      q.processAllAvailable()
      val rows = spark.table("swin").filter(col("user_id") === 7)
        .orderBy("session_start").collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[Long]("n_events") === 2)
      assert(rows(0).getAs[Double]("total_value") === 5.0)
      assert(rows(1).getAs[Long]("n_events") === 1)
    } finally q.stop()
  }

  test("stream-stream join attributes purchases to clicks within window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val df = input.toDF()
    val q = EventStreams.clickAttribution(
      df.filter(col("event_type") === "click"),
      df.filter(col("event_type") === "purchase"),
      attributionWindow = "30 minutes", watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib").start()
    try {
      input.addData(
        ev(1, 0, user = 1, typ = "click"),
        ev(2, 10, user = 1, typ = "purchase", value = 9.0), // within 30m ✓
        ev(3, 45, user = 1, typ = "purchase", value = 5.0), // outside ✗
        ev(4, 10, user = 2, typ = "purchase", value = 3.0)) // no click ✗
      q.processAllAvailable()
      // advance watermark far enough to finalize
      input.addData(ev(9, 59, user = 9, typ = "view"))
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Long]("click_id") === 1L)
      assert(rows.head.getAs[Long]("purchase_id") === 2L)
      assert(rows.head.getAs[Double]("value") === 9.0)
    } finally q.stop()
  }

  test("checkpointed query restarts exactly-once into a file sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val input = MemoryStream[Event]
    def start() = EventStreams
      .tumblingCounts(input.toDF(), window = "10 minutes",
        watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    // phase 1: two events land in [10:00,10:10), then the query stops
    val q1 = start()
    try {
      input.addData(ev(1, 0), ev(2, 5))
      q1.processAllAvailable()
    } finally q1.stop()
    // phase 2: restart from the checkpoint; a later event advances the
    // watermark and finalizes the first window — it must appear exactly
    // once despite the restart
    val q2 = start()
    try {
      input.addData(ev(3, 30))
      q2.processAllAvailable()
      input.addData(ev(4, 50))
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
        .filter(col("window_start") === ts(0)).collect()
      assert(rows.length === 1, "finalized window must appear exactly once")
      assert(rows.head.getAs[Long]("n") === 2)
    } finally q2.stop()
  }

  test("windowed transforms also run in batch mode (same code path)") {
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStreams.tumblingCounts(batch, "24 hours", "1 hour")
    assert(got.agg(sum("n")).head.getLong(0) === batch.count())
  }

  test("sliding windows count every event window/slide times") {
    val dir = "/root/testdata/sf0.001"
    val n = Tables.events(spark, dir).count()
    // 6h window sliding 1h ⇒ each event belongs to exactly 6 windows
    val got = graft.operators.Reshape.qEventSliding(spark, dir)
    assert(got.agg(sum("n")).head.getLong(0) === 6 * n)
  }

  test("streaming funnel honors a LATE view that re-qualifies a click") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams
      .funnelStages(input.toDS(), windowMs = 10 * 60 * 1000L,
        watermark = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_late").start()
    try {
      // click first — no view seen yet, so nothing qualifies so far
      input.addData(ev(1, 8, typ = "click"))
      q.processAllAvailable()
      // the view arrives LATE but inside the watermark, at minute 2:
      // the funnel window becomes (10:02, 10:12], so the click at 10:08
      // must count — an eager evaluation that discarded it would miss
      input.addData(ev(2, 2, typ = "view"))
      q.processAllAvailable()
      // push the watermark far past the horizon to close the funnel
      input.addData(ev(3, 59, user = 2L, typ = "other"))
      q.processAllAvailable()
      input.addData(ev(4, 59, user = 2L, typ = "other"))
      q.processAllAvailable()
      val rows = spark.table("funnel_late").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(rows.toSeq === Seq((1L, 2)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("streaming funnel equals the batch funnel on the fixture corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val all = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect()
    // deterministic shuffle into 3 batches — the watermark (31 days)
    // exceeds the fixture span, so no reordering drops anything and the
    // prune-floor logic sees genuinely out-of-order arrivals
    val shuffled = all.sortBy(e => e.event_id * 2654435761L % 100003)
    val batches = shuffled.grouped((shuffled.length + 2) / 3).toSeq
    val input = MemoryStream[Event]
    val q = EventStreams
      .funnelStages(input.toDS(), windowMs = 24 * 3600 * 1000L,
        watermark = "31 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_fixture").start()
    try {
      batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      // two far-future punches: first advances the watermark past every
      // horizon, second lets the event-time timeouts fire
      val punch = Event(9999999L,
        Timestamp.valueOf("2031-01-01 00:00:00"), 999999L, "other", 0.0)
      input.addData(punch); q.processAllAvailable()
      input.addData(punch.copy(event_id = 9999998L)); q.processAllAvailable()
      val stages = spark.table("funnel_fixture").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(stages.map(_._1).distinct.length === stages.length,
        "one final row per user")
      val want = graft.operators.Reshape.qEventFunnel(spark, dir).head()
      assert(stages.count(_._2 >= 1).toLong === want.getLong(0))
      assert(stages.count(_._2 >= 2).toLong === want.getLong(1))
      assert(stages.count(_._2 >= 3).toLong === want.getLong(2))
    } finally q.stop()
  }

  test("streaming rate gate flags spikes against frozen stats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // frozen artifact: clicks historically run mu=2 per window, sd=1
    val stats = Seq(("click", 2.0, 1.0)).toDF("event_type", "mu", "sd")
    val q = EventStreams
      .rateAnomalyGate(input.toDF(), stats,
        window = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("rate_gate").start()
    try {
      // window [10:00,10:10): 4 clicks → z = 2 → spike;
      // window [10:10,10:20): 2 clicks → z = 0 → quiet
      input.addData(ev(1, 0), ev(2, 2), ev(3, 5), ev(4, 9),
        ev(5, 11), ev(6, 14))
      q.processAllAvailable()
      input.addData(ev(7, 40)) // advance watermark: both windows close
      q.processAllAvailable()
      val rows = spark.table("rate_gate").collect()
        .map(r => r.getAs[Timestamp]("window_start") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("z"),
            r.getAs[Boolean]("spike")))).toMap
      assert(rows(ts(0)) === ((4L, 2.0, true)))
      assert(rows(ts(10)) === ((2L, 0.0, false)))
    } finally q.stop()
  }

  test("batch-mode rate gate with self-built stats equals the control chart") {
    val dir = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, dir)
    val gate = EventStreams
      .rateAnomalyGate(evs, graft.operators.Reshape.rateStats(evs),
        window = "1 day", watermark = "0 seconds")
      .select(col("event_type"), col("window_start").cast("date").as("day"),
        col("n"), col("z"), col("spike"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val chart = graft.operators.Reshape.qRateAnomaly(spark, dir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(gate === chart)
  }

  test("scd2 sink versions a dimension from a CDC stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = java.nio.file.Files
      .createTempDirectory("graft-scd2").toString + "/dim"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scd2c").toString
    def at(day: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    val input = MemoryStream[Event]
    val q = EventStreams.scd2Sink(input.toDF(), table, ckpt,
      "user_id", Seq("event_type", "value"), "ts").start()
    try {
      // day 1: two fresh keys open
      input.addData(
        Event(1L, at(1), 1L, "click", 1.0),
        Event(2L, at(1), 2L, "view", 2.0))
      q.processAllAvailable()
      val t1 = spark.read.parquet(table)
      assert(t1.count() === 2 && t1.filter(col("is_current")).count() === 2)
      // day 2: key 1 changes (close+open), key 2 resends unchanged (no-op)
      input.addData(
        Event(3L, at(2), 1L, "click", 5.0),
        Event(4L, at(2), 2L, "view", 2.0))
      q.processAllAvailable()
      val t2 = spark.read.parquet(table).cache()
      assert(t2.filter(col("user_id") === 1L).count() === 2)
      val closed = t2.filter(col("user_id") === 1L && !col("is_current"))
        .collect().head
      assert(closed.getAs[java.sql.Date]("valid_to").toString
        === "2024-01-02")
      assert(t2.filter(col("user_id") === 1L && col("is_current"))
        .collect().head.getAs[Double]("value") === 5.0)
      assert(t2.filter(col("user_id") === 2L).count() === 1,
        "unchanged resend must not version")
      t2.unpersist()
      // day 3: a brand-new key joins; history stays intact
      input.addData(Event(5L, at(3), 3L, "view", 9.0))
      q.processAllAvailable()
      val t3 = spark.read.parquet(table)
      assert(t3.filter(col("is_current")).count() === 3)
      assert(t3.count() === 4)
    } finally q.stop()
  }
}
