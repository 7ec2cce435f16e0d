package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` table shape (SURVEY.md §2.10:
  * the reference is batch-only; this is the north-star extension the
  * `events` fixture exists for).
  *
  * All transforms take a DataFrame so they run identically over
  * `readStream` sources and batch frames (the batch view of q_event_daily
  * is the same aggregation) — tests drive them with MemoryStream.
  *
  * Scale notes: windowed aggregations shuffle on (window, key) with
  * partial aggregation; the watermark bounds state size — without it a
  * 100 TB stream's window state grows unboundedly. Session state in
  * `sessionize` is per-user and evicted by timeout, so state is O(active
  * users), not O(events).
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type with a watermark for
    * late-data eviction.
    */
  def tumblingCounts(
      events: DataFrame,
      window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming rate-anomaly gate — the live half of the batch control
    * chart (`Reshape.rateAnomaly`): windowed per-type counts scored
    * against a FROZEN per-type (mu, sd) stats artifact built offline by
    * [[graft.operators.Reshape.rateStats]]. Same frozen-model shape as
    * the DSIR/decontamination ingest gates: the artifact is types-sized,
    * broadcasts to every task, and the stream side is one watermarked
    * windowed count — state bounded by watermark lag, nothing stateful
    * added by the scoring join. z and the σ flag use the exact batch
    * formula, so stream flags ≡ batch flags on replayed data
    * (StreamingSpec pins it).
    */
  def rateAnomalyGate(
      events: DataFrame, stats: DataFrame,
      window: String = "1 day",
      watermark: String = "2 hours",
      sigma: Double = graft.operators.Reshape.RateAnomalySigma): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"))
      .join(broadcast(stats), "event_type")
      .withColumn("z",
        when(col("sd") > 0,
          round((col("n") - col("mu")) / col("sd"), 4))
          .otherwise(lit(0.0)))
      .withColumn("spike", abs(col("z")) >= sigma)
      .select("window_start", "event_type", "n", "z", "spike")

  /** Sliding-window event rate (1h window sliding 15m). */
  def slidingRate(
      events: DataFrame,
      window: String = "1 hour",
      slide: String = "15 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionSummary(
      user_id: Long, n_events: Int, total_value: Double,
      first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp,
      closed: Boolean)

  /** Public: the state encoder's generated code instantiates it. */
  final case class SessionState(
      n: Int, total: Double, first: Long, last: Long)

  /** Custom sessionization with flatMapGroupsWithState: a user session
    * closes after `gapMs` of EVENT-TIME inactivity (watermark-driven),
    * emitting one summary row. Event-time timeouts keep the operator
    * deterministic and replay-safe — processing-time timeouts would tie
    * session boundaries to wall clock and also make micro-batch draining
    * non-quiescent. (KeyValueGroupedDataset state API — the semantics
    * Spark's built-in session_window can't express when per-session
    * custom state/emission rules are needed.)
    *
    * @param watermark lateness bound applied to `ts` (also controls how
    *                  long closed-session state lingers before timeout)
    */
  def sessionize(
      events: Dataset[Event], gapMs: Long,
      watermark: String = "10 minutes"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          def summary(s: SessionState): SessionSummary = SessionSummary(
            user, s.n, s.total,
            new java.sql.Timestamp(s.first), new java.sql.Timestamp(s.last),
            closed = true)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(summary(s))
          } else {
            // events arriving BEFORE the timeout fires can still be past
            // the gap (several sessions inside one batch, or a batch
            // landing while the watermark trails last+gap) — split on the
            // gap while folding, don't just accumulate
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[SessionSummary]
            var cur = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (cur == null) {
                cur = SessionState(1, e.value, t, t)
              } else if (t - cur.last > gapMs) {
                closed += summary(cur)
                cur = SessionState(1, e.value, t, t)
              } else {
                cur = SessionState(cur.n + 1, cur.total + e.value,
                  math.min(cur.first, t), math.max(cur.last, t))
              }
            }
            state.update(cur)
            // close when the watermark passes last-activity + gap; the
            // timeout timestamp must not trail the current watermark
            state.setTimeoutTimestamp(
              math.max(cur.last + gapMs, state.getCurrentWatermarkMs() + 1))
            closed.result().iterator
          }
      }
  }

  /** Declarative session windows via the built-in session_window
    * generator — the right tool when per-session logic is plain
    * aggregation (use [[sessionize]] only when custom state/emission
    * rules are needed, per SURVEY §2.11's built-ins-first policy).
    */
  def sessionWindowStats(
      events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Stream-stream interval join: MULTI-TOUCH attribution — a purchase
    * is paired with EVERY click by the same user within
    * `attributionWindow` before it (a user with two qualifying clicks
    * yields two rows for one purchase; don't sum `value` across rows
    * without dividing by touch count). For last-touch semantics use the
    * batch as-of form (Reshape.qAsofPrevClick). Both sides carry
    * watermarks and the join condition bounds event time on both ends —
    * that pair is what lets Spark evict join state instead of buffering
    * the streams forever (the 100 TB failure mode of unbounded stream
    * joins).
    */
  def clickAttribution(
      clicks: DataFrame, purchases: DataFrame,
      attributionWindow: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <=
          col("click_ts") + expr(s"INTERVAL $attributionWindow"))
      .select("click_id", "purchase_id", "user_id", "click_ts",
        "purchase_ts", "value")
  }

  /** Final funnel stage reached by a user: 1 = viewed, 2 = clicked
    * within the window after the first view, 3 = purchased within the
    * window after that first qualifying click.
    */
  final case class FunnelStage(user_id: Long, stage: Int)

  /** Public: the state encoder's generated code instantiates it.
    * `views` keeps only the running MIN view time (min is monotone under
    * late data, so one long is exact); clicks/purchases must buffer
    * candidates because a LATE earlier view can shift the window left
    * and admit a click that an eager evaluation would have discarded.
    */
  final case class FunnelState(
      minView: Long, clicks: List[Long], purchases: List[Long])

  /** Streaming funnel (the stateful twin of Reshape.qEventFunnel): per
    * user, emit the final stage reached once the watermark closes the
    * user's horizon (one row per user per horizon; a user re-appearing
    * after close starts a fresh funnel — by then the old candidates
    * could never qualify anyway, since anything still arriving has
    * event time past the closed window).
    *
    * Candidate pruning must respect LATE VIEWS: the final first-view
    * time t1* can be lower than the current minView (a late view), but
    * never lower than the WATERMARK (older rows are dropped), so
    * t1* ≥ min(minView, wm). A click qualifies iff t1* < c ≤
    * t1*+window, hence keep c ∈ (min(minView, wm), minView+window] —
    * the upper bound because c ≤ t1*+window ≤ minView+window; dropping
    * anything below the floor is safe because no admissible t1* sits
    * under it. Purchases analogously on a 2·window span. State per
    * user is therefore bounded by activity inside watermark-lag +
    * 2·window, never the whole stream (same watermark-bounds-state
    * argument as [[sessionize]]).
    */
  def funnelStages(
      events: Dataset[Event], windowMs: Long,
      watermark: String = "10 minutes"): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelStage](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event],
         state: GroupState[FunnelState]) =>
          def prune(s: FunnelState, wm: Long): FunnelState = {
            val floor = math.min(s.minView, wm)
            val (clickHi, purHi) =
              if (s.minView == Long.MaxValue)
                (Long.MaxValue, Long.MaxValue) // t1* unknown: keep > wm
              else (s.minView + windowMs, s.minView + 2 * windowMs)
            FunnelState(
              s.minView,
              s.clicks.filter(c => c > floor && c <= clickHi),
              s.purchases.filter(p => p > floor && p <= purHi))
          }
          def finalStage(s: FunnelState): Int =
            if (s.minView == Long.MaxValue) 0
            else {
              val t1 = s.minView
              val t2 = s.clicks
                .filter(c => c > t1 && c <= t1 + windowMs)
                .sorted.headOption
              val t3 = t2.flatMap(t => s.purchases
                .filter(p => p > t && p <= t + windowMs)
                .sorted.headOption)
              if (t3.isDefined) 3 else if (t2.isDefined) 2 else 1
            }
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            val st = finalStage(s)
            if (st > 0) Iterator.single(FunnelStage(user, st))
            else Iterator.empty
          } else {
            var s = state.getOption
              .getOrElse(FunnelState(Long.MaxValue, Nil, Nil))
            var maxSeen = Long.MinValue
            rows.foreach { e =>
              val t = e.ts.getTime
              maxSeen = math.max(maxSeen, t)
              e.event_type match {
                case "view" => s = s.copy(minView = math.min(s.minView, t))
                case "click" => s = s.copy(clicks = t :: s.clicks)
                case "purchase" =>
                  s = s.copy(purchases = t :: s.purchases)
                case _ => ()
              }
            }
            s = prune(s, state.getCurrentWatermarkMs())
            state.update(s)
            // the user's funnel can still change until the watermark
            // passes their last possible transition; park the timeout
            // just past the horizon (and never behind the watermark).
            // With no view yet the horizon must cover the BUFFERED
            // candidates too, not just this batch's maxSeen — a batch
            // of older-but-admissible events would otherwise drag the
            // timeout below a buffered click and discard it before a
            // late view could re-qualify it
            val horizon =
              if (s.minView == Long.MaxValue)
                (maxSeen :: s.clicks ::: s.purchases).max
              else s.minView + 2 * windowMs
            state.setTimeoutTimestamp(math.max(
              horizon + 1, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming dedup on event_id within the watermark horizon —
    * exactly-once semantics over an at-least-once source.
    *
    * `dropDuplicatesWithinWatermark`, not `dropDuplicates("event_id")`:
    * with the event-time column absent from the key subset, plain
    * dropDuplicates keeps every seen key in state FOREVER (output stays
    * correct; state grows unboundedly on a long-running stream). The
    * WithinWatermark variant evicts a key once the watermark passes its
    * event time — bounded state, and identical output whenever
    * duplicates arrive within the horizon (the at-least-once-source
    * contract).
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming SCD2 dimension maintenance: each micro-batch of update
    * rows merges into the persisted history via
    * [[graft.operators.Reshape.scd2Merge]] inside `foreachBatch` — the
    * CDC-consumer shape (change feed in, versioned dimension out). The
    * merge itself is the batch operator, so the streaming form can't
    * drift from the oracled `q_scd2` semantics; `effectiveOf` stamps
    * each batch's validity boundary from the BATCH's data (max event
    * time), keeping the result a pure function of the input stream —
    * replayable, no wall-clock.
    *
    * The fixture-scale sink is read-merge-overwrite on parquet, staged
    * through a sibling directory + atomic swap so a crash mid-write
    * can't destroy the table (parquet overwrite deletes before it
    * writes). At warehouse scale the overwrite becomes a transactional
    * MERGE INTO on a table format with row-level commits (Delta/
    * Iceberg — not in this container); the plan shape inside the merge
    * — one key-keyed full-outer join per batch, batch side broadcast —
    * is unchanged. Checkpointed exactly-once: on restart the last
    * un-committed batch replays and the merge's idempotence (spec-
    * pinned re-merge no-op in RelationalSpec) makes the replay safe.
    */
  def scd2Sink(
      updates: DataFrame, tablePath: String, checkpoint: String,
      keyCol: String, attrCols: Seq[String], tsCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val effective = to_date(
            lit(batch.agg(max(to_date(col(tsCol)))).first().getDate(0)))
          val base =
            if (new java.io.File(tablePath).exists())
              spark.read.parquet(tablePath)
                .drop("is_current")
            else batch.select(col(keyCol) +: attrCols.map(col): _*)
              .limit(0)
              .withColumn("valid_from", to_date(lit(null)))
              .withColumn("valid_to", to_date(lit(null)))
          val merged = graft.operators.Reshape.scd2Merge(
            base, batch.select(col(keyCol) +: attrCols.map(col): _*),
            keyCol, attrCols, effective)
          val staged = tablePath + ".staging"
          merged.write.mode("overwrite").parquet(staged)
          val live = java.nio.file.Paths.get(tablePath)
          val old = java.nio.file.Paths.get(tablePath + ".old")
          if (java.nio.file.Files.exists(live)) {
            java.nio.file.Files.move(live, old)
            moveDir(java.nio.file.Paths.get(staged), live)
            deleteDir(old)
          } else moveDir(java.nio.file.Paths.get(staged), live)
          ()
        }
      }
  }

  private def moveDir(from: java.nio.file.Path, to: java.nio.file.Path)
      : Unit = { java.nio.file.Files.move(from, to); () }

  private def deleteDir(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
  }
}
