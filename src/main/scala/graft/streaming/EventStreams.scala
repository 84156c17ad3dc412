package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` shape — the streaming
  * twin of the batch tier (extension; the reference is batch-only,
  * SURVEY.md §2.5 "streaming"). All transforms take/return streaming
  * DataFrames; sinks/triggers are the caller's concern.
  *
  * Watermarks bound state: every stateful op here declares one, so state
  * eviction works at scale instead of growing without bound. Tested with
  * MemoryStream (deterministic) rather than a DuckDB oracle — streaming
  * state semantics have no SQL equivalent (SURVEY.md §7.5).
  */
object EventStreams {

  /** Tumbling-window counts per event type: the canonical
    * watermark + window aggregation. Late events beyond `watermark` are
    * dropped; in append mode a window emits once it is below the watermark.
    */
  def tumblingCounts(
      events: DataFrame,
      windowLen: String = "10 minutes",
      watermark: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Session windows built in: gap-based sessions per user via
    * `session_window` — the streaming equivalent of
    * [[graft.operators.Sessions.sessionize]].
    */
  def sessionWindows(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming dedup — the streaming arm of the dedup story (the batch
    * tier's [[graft.operators.Dedup.exact]]): at-least-once sources
    * (Kafka replays, retried producers) re-deliver events, and
    * `dropDuplicatesWithinWatermark` keeps one row per `event_id` while
    * letting the watermark EVICT seen-key state — a plain
    * `dropDuplicates` in streaming keeps every key forever, which is the
    * unbounded-state failure at scale.
    */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join: views joined to the same user's purchases
    * within `within` — the streaming twin of the batch `q_funnel` query.
    * Both sides carry watermarks and the join condition bounds event time
    * in BOTH directions, so Spark can compute how long to retain each
    * side's state; an unbounded condition would again grow state forever.
    */
  def viewPurchaseJoin(
      events: DataFrame,
      within: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    views.join(purchases,
        col("v_user") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr(s"interval $within"))
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"))
  }

  /** Stream-stream LEFT OUTER join — the shape [[viewPurchaseJoin]] can't
    * test: a view with no purchase inside `within` must still be emitted
    * (null-extended), and append mode only releases such a row once the
    * watermark proves no match can arrive. Two structural points, both
    * load-bearing:
    *  - each side's filter ADMITS the flush-sentinel type alongside its
    *    own event type. Writing the watermark "before" the filter is not
    *    enough: a predicate that doesn't reference the event-time column
    *    is pushed BELOW the EventTimeWatermark node by the optimizer, so
    *    a sentinel-excluding filter would starve both sides' watermarks
    *    and unmatched state would never be released (measured: the last
    *    2 h of unmatched views never emitted). Sentinels carry negative
    *    ids, so the caller drops their (rare) self-join rows after the
    *    drain;
    *  - the watermark attribute survives the per-side renames (alias
    *    keeps the event-time metadata), so both join inputs stay
    *    watermarked as the outer join requires.
    */
  def viewPurchaseJoinOuter(
      events: DataFrame,
      within: String = "1 hour",
      watermark: String = "1 hour",
      flushType: String = "__flush"): DataFrame = {
    val wm = events.withWatermark("ts", watermark)
    val views = wm
      .filter(col("event_type") === "view" || col("event_type") === flushType)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
    val purchases = wm
      .filter(col("event_type") === "purchase" || col("event_type") === flushType)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    views.join(purchases,
        col("v_user") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr(s"interval $within"),
        "left_outer")
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState — the escape
    * hatch for session semantics `session_window` can't express (e.g.
    * emitting only on session close, carrying custom accumulators). State
    * per user is O(1); an event-time timeout (watermark-driven — a
    * processing-time timeout would schedule empty micro-batches forever)
    * closes idle sessions.
    */
  def statefulSessions(
      events: Dataset[Event],
      gapMs: Long,
      watermarkDelay: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // |t - last| handles a cross-batch late (but within
                // watermark) event: it must extend the session backwards,
                // not drag `last` earlier and corrupt later gap checks.
                case Some(s) if math.abs(t - s.last) <= gapMs =>
                  cur = Some(s.copy(
                    start = math.min(s.start, t), last = math.max(s.last, t),
                    n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Output row of [[RunningTotalsProcessor]]: the per-user totals as of
    * the end of each micro-batch. Sums carried in integer cents so the
    * batch-split addition order cannot drift a double.
    */
  final case class UserTotals(user_id: Long, n_events: Long, sum_cents: Long)

  /** Arbitrary stateful processing via the Spark 4 `transformWithState`
    * API (the successor to flatMapGroupsWithState: explicit typed state
    * variables on a handle, TTL support, timers — and it requires the
    * RocksDB state store provider, which is what a 100 TB deployment runs
    * anyway for state larger than the heap). Keeps one ValueState of
    * (count, cents) per user and emits the running totals once per
    * micro-batch the user appears in — the incremental-view shape.
    */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), UserTotals] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)](
        "totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotals] = {
      var (n, s) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, cents) => n += 1; s += cents }
      totals.update((n, s))
      Iterator.single(UserTotals(key, n, s))
    }
  }

  /** Running per-user totals over a stream of (user_id, cents) pairs. */
  def runningTotals(pairs: Dataset[(Long, Long)]): Dataset[UserTotals] = {
    import pairs.sparkSession.implicits._
    pairs
      .groupByKey(_._1)
      .transformWithState(
        new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** [[RunningTotalsProcessor]] plus warm-start: per-key state is seeded
    * from a batch-computed (count, cents) aggregate before the first
    * micro-batch — the migration pattern for moving a standing batch
    * rollup onto a stream without reprocessing history.
    */
  class BootstrappedTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, (Long, Long), UserTotals, (Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)](
        "totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInitialState(
        key: Long,
        initial: (Long, Long, Long),
        timerValues: org.apache.spark.sql.streaming.TimerValues): Unit =
      totals.update((initial._2, initial._3))

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotals] = {
      var (n, s) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, cents) => n += 1; s += cents }
      totals.update((n, s))
      Iterator.single(UserTotals(key, n, s))
    }
  }

  /** Running totals warm-started from `initial` rows of
    * (user_id, n_events, sum_cents).
    */
  def bootstrappedTotals(
      pairs: Dataset[(Long, Long)],
      initial: Dataset[(Long, Long, Long)]): Dataset[UserTotals] = {
    import pairs.sparkSession.implicits._
    pairs
      .groupByKey(_._1)
      .transformWithState(
        new BootstrappedTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        initial.groupByKey(_._1))
  }

  final case class IdleSummary(user_id: Long, n_events: Long)

  /** Event-time TIMERS through transformWithState: per-key event counts
    * that emit ONLY when the key has been idle past `gapMs` (watermark
    * crosses the timer) — the notify-on-quiet shape (abandoned cart, dead
    * device). Each batch re-arms the key's single timer at
    * last-seen + gap; expiry emits the summary and clears state.
    */
  class IdleCloseProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, java.sql.Timestamp), IdleSummary] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long](
        "count", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[IdleSummary] = {
      var n = if (count.exists()) count.get() else 0L
      var last = Long.MinValue
      rows.foreach { case (_, ts) => n += 1; last = math.max(last, ts.getTime) }
      count.update(n)
      // one armed timer per key: re-arm on every batch the key appears in.
      // Materialize before deleting — mutating the state-store-backed
      // iterator mid-iteration is not guaranteed safe; it only happened to
      // work while at most one timer was ever armed per key.
      getHandle.listTimers().map(_.asInstanceOf[Long]).toSeq
        .foreach(getHandle.deleteTimer)
      getHandle.registerTimer(last + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[IdleSummary] = {
      val n = if (count.exists()) count.get() else 0L
      count.clear()
      Iterator.single(IdleSummary(key, n))
    }
  }

  /** Idle-close summaries over (user_id, ts) rows; `events` must already
    * carry a watermark on the ts column.
    */
  def idleSummaries(
      events: Dataset[(Long, java.sql.Timestamp)],
      gapMs: Long): Dataset[IdleSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(
        new IdleCloseProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }
}
