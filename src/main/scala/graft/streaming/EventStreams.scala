package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Mutable per-user session state for EventStreams.sessionize. Top-level
  * (not nested/private) so the state encoder's generated code can reach
  * its accessors.
  */
final case class SessionState(start_ms: Long, last_ms: Long,
    n_events: Long, total_value: Double)

/** Structured Streaming slice over the `events` schema (SURVEY.md §2.11 —
  * extension, not reference parity: the reference is batch-only).
  *
  * Transformations are factored so the SAME function runs on a batch
  * DataFrame and a streaming one — EventStreamsSpec asserts batch ≡
  * stream-on-finite-input, and StreamQueries exposes the batch form to
  * the DuckDB oracle.
  *
  * Scale notes: tumbling windows + watermark bound state; the rollup uses
  * update-mode aggregation keyed by user_id (state ∝ #users, not
  * #events). Inputs with raw ns-long timestamps convert via integer
  * division (see Tables.events).
  */
object EventStreams {

  /** ns-long → TimestampType, exact (integer µs, no double rounding). */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time", timestamp_micros(expr("ts_ns div 1000")))

  /** Tumbling 1-hour window per event_type; works on static or streaming
    * input. With a streaming input, pair with `withWatermark` (see
    * hourlyCounts) so state is dropped past the lateness bound.
    */
  def hourlyAggregation(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming form: 30-minute watermark bounds state for late data. */
  def hourlyCounts(stream: DataFrame): DataFrame =
    hourlyAggregation(stream.withWatermark("event_time", "30 minutes"))

  /** Windowed leaderboard, streaming phase: per-hour per-user event
    * counts under a watermark — in append mode each (window, user) row
    * emits exactly once, when the watermark closes its window. Ranking
    * INSIDE the streaming aggregate would pin a global per-window sort
    * in open state, so top-k is the standard two-phase shape: counts
    * under watermark here, then [[topKPerWindow]] as the finisher — a
    * foreachBatch step over closed windows in production, a plain batch
    * query on a finite replay (StreamQueries `stream_topk`, oracle-
    * checked; the stream ≡ batch equivalence is EventStreamsSpec's job).
    */
  def hourlyUserCounts(stream: DataFrame,
      watermark: String = "30 minutes"): DataFrame =
    stream.withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("user_id"),
        col("n_events"))

  /** Leaderboard finisher: rank per closed window by (count desc,
    * user asc — deterministic tie-break) and keep k. The rank window is
    * PARTITIONED by hour, so Catalyst plans a map-side WindowGroupLimit
    * before the per-hour shuffle — never a global sort.
    */
  def topKPerWindow(counts: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("hour_start"))
          .orderBy(col("n_events").desc, col("user_id").asc)))
      .where(col("rank") <= k)
  }

  /** Hopping (sliding) window per event_type: size 1 h, slide 30 min —
    * every event lands in exactly size/slide windows. Static or
    * streaming input; the streaming form ([[hoppingCounts]]) bounds
    * state with a watermark exactly like the tumbling aggregate (state
    * ∝ open windows × event types, scaled by the size/slide overlap
    * factor — the price of overlap is state, not shuffle count).
    */
  def hoppingAggregation(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("event_time"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(expr("unix_micros(window.start) div 1000000").as("win_epoch"),
        col("event_type"), col("n_events"))

  /** Streaming form of [[hoppingAggregation]] under a 30-min watermark. */
  def hoppingCounts(stream: DataFrame): DataFrame =
    hoppingAggregation(stream.withWatermark("event_time", "30 minutes"))

  /** Native session windows per user (gap 30 min): consecutive events
    * closer than the gap merge into one session. Static or streaming
    * input; on streams, Spark's session_window state merges windows
    * incrementally and the watermark closes sessions — the built-in
    * counterpart of the custom [[sessionize]]
    * (flatMapGroupsWithState), kept alongside it because the custom
    * form also emits OPEN sessions, which session_window cannot.
    */
  def sessionWindowAggregation(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("event_time"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(expr("unix_micros(session_window.start) div 1000000").as("sess_epoch"),
        col("user_id"), col("n_events"))

  /** Streaming form of [[sessionWindowAggregation]]; the watermark both
    * bounds state and decides when a session is final.
    */
  def sessionWindowCounts(stream: DataFrame): DataFrame =
    sessionWindowAggregation(stream.withWatermark("event_time", "30 minutes"))

  /** Streaming exact dedup: keep each key's first occurrence, with state
    * BOUNDED by the watermark horizon (dropDuplicatesWithinWatermark
    * expires keys older than the watermark) — the only shape under which
    * streaming dedup survives an unbounded 100 TB stream; plain
    * dropDuplicates on a stream accumulates state forever. Batch
    * equivalent (deterministic form): min(struct(time, id)) per key —
    * see StreamQueries `stream_dedup`.
    */
  def dedupByKey(stream: DataFrame, keyCols: Seq[String],
      timeCol: String = "event_time", watermark: String = "1 hour"): DataFrame =
    stream.withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: each left row joins right rows with
    * the same `keyCol` whose `timeCol` lies in [left, left + window].
    * The right side's key and time columns come back suffixed `_r` (key
    * dropped); other right columns must not collide with the left's.
    *
    * Works on batch frames as-is. On streams, BOTH inputs must carry a
    * watermark (see [[intervalJoinStreaming]]): the join's time-range
    * bound is what lets Spark expire a buffered left row once the right
    * watermark passes `left.time + window` — state stays proportional to
    * watermark + window span, never to the stream. Without the upper
    * bound the state store grows forever.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, window: String): DataFrame = {
    val rr = right.toDF(right.columns.map(c =>
      if (c == keyCol || c == timeCol) s"${c}_r" else c): _*)
    // only the key/time columns are suffixed — any other shared name
    // would make the col(...) references below ambiguous (or silently
    // shadow a pre-existing `<name>_r` on the right); fail loudly instead
    val clash = rr.columns.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"intervalJoin: right columns ${clash.mkString(", ")} collide with " +
        "the left side — rename them before joining")
    left.join(rr,
      col(keyCol) === col(s"${keyCol}_r") &&
        col(s"${timeCol}_r") >= col(timeCol) &&
        col(s"${timeCol}_r") <= col(timeCol) + expr(s"INTERVAL $window"))
      .drop(s"${keyCol}_r")
  }

  /** Streaming form: watermark both inputs, then the interval join. */
  def intervalJoinStreaming(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String = "event_time", window: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    intervalJoin(left.withWatermark(timeCol, watermark),
      right.withWatermark(timeCol, watermark), keyCol, timeCol, window)

  /** Stream-STATIC dimension enrichment: join a streaming fact against
    * a bounded dimension table. Spark broadcasts (or locally rescans)
    * the static side per micro-batch, so there is NO join state to
    * watermark and no stream-stream buffering — the cheapest possible
    * enrichment shape, and the right one whenever the dimension is
    * batch-maintained (e.g. an [[ScdStream]]-kept current snapshot).
    * `how = "left"` (default) keeps facts with no dimension row (nulls)
    * — an inner join would silently drop them, the classic
    * late-dimension bug. Batch ≡ stream is EventStreamsSpec-pinned.
    */
  def enrichWithDimension(stream: DataFrame, dim: DataFrame,
      keyCol: String, how: String = "left"): DataFrame = {
    val clash = dim.columns.toSet.intersect(stream.columns.toSet) - keyCol
    require(clash.isEmpty,
      s"enrichWithDimension: dimension columns ${clash.mkString(", ")} " +
        "collide with the stream — rename them before joining")
    stream.join(org.apache.spark.sql.functions.broadcast(dim),
      Seq(keyCol), how)
  }

  /** Per-user running rollup (update-mode aggregation). */
  def userRollup(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"),
        max(col("event_time")).as("last_seen"))

  /** Per-user funnel state: first-touch timestamp of each stage
    * (view → click → purchase), maintained as an update-mode aggregation
    * — state is 3 longs per user, independent of event volume, so an
    * unbounded stream carries bounded funnel state. The SAME expression
    * runs on a batch frame; StreamQueries `funnel_conversion` is the
    * batch rollup of this frame.
    */
  def funnelState(events: DataFrame): DataFrame = {
    def firstUs(t: String) =
      min(when(col("event_type") === t, unix_micros(col("event_time"))))
    events.groupBy(col("user_id"))
      .agg(firstUs("view").as("first_view_us"),
        firstUs("click").as("first_click_us"),
        firstUs("purchase").as("first_purchase_us"))
  }

  /** Input row for sessionization (event_time in epoch millis — keeps
    * the state encoder primitive-only).
    */
  final case class SessionEvent(user_id: Long, event_ms: Long, value: Double)

  /** A closed session: gap-based, per user. */
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, total_value: Double)

  /** Gap-based sessionization with custom state
    * (KeyValueGroupedDataset.flatMapGroupsWithState): events for a user
    * belong to one session while gaps stay under `gapMs`; a longer gap
    * closes the session and emits it. State per key is one small case
    * class — bounded by #active users, not #events. The same function
    * body serves batch (sorted groups) and streaming (timeout-driven)
    * runs; the spec feeds both a batch Dataset and a MemoryStream.
    *
    * Memory bound: the per-invocation sort buffers ONE key's events from
    * ONE micro-batch (not the whole stream) — at scale the trigger
    * interval is what bounds it, so pathological hot keys are managed by
    * trigger sizing, not by this operator. A batch-mode run over a
    * hot-key history beyond executor memory should pre-split by time
    * range and stitch sessions at the seams.
    */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, rows, state) =>
          val sorted = rows.toSeq.sortBy(_.event_ms)
          val closed = scala.collection.mutable.ListBuffer.empty[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.event_ms - s.last_ms <= gapMs =>
                cur = Some(SessionState(s.start_ms, e.event_ms,
                  s.n_events + 1, s.total_value + e.value))
              case Some(s) =>
                closed += Session(userId, s.start_ms, s.last_ms, s.n_events, s.total_value)
                cur = Some(SessionState(e.event_ms, e.event_ms, 1L, e.value))
              case None =>
                cur = Some(SessionState(e.event_ms, e.event_ms, 1L, e.value))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** Gap-based sessionization of a FINITE input as pure dataflow: break
    * where the gap from the previous event exceeds `gapUs`, session id =
    * running break count (lag + cumulative sum over a user-partitioned
    * window), one aggregate per session. Same numbers as
    * [[sessionize]] ∪ [[openSessions]] on the same input (spec-pinned) —
    * and SQL-expressible, so the driver oracle-checks the sessionization
    * math through StreamQueries `stream_sessionize`.
    */
  def sessionizeBatch(events: DataFrame, gapUs: Long,
      userCol: String = "user_id", tsCol: String = "ts_us",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__brk",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsCol)).as("start_us"), max(col(tsCol)).as("end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("total_value"))
  }

  /** Flush still-open sessions (batch epilogue / final trigger). */
  def openSessions(events: Dataset[SessionEvent], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).mapGroups { (userId, rows) =>
      val sorted = rows.toSeq.sortBy(_.event_ms)
      var s: SessionState = null
      sorted.foreach { e =>
        s = if (s == null || e.event_ms - s.last_ms > gapMs)
          SessionState(e.event_ms, e.event_ms, 1L, e.value)
        else SessionState(s.start_ms, e.event_ms, s.n_events + 1, s.total_value + e.value)
      }
      Session(userId, s.start_ms, s.last_ms, s.n_events, s.total_value)
    }
  }
}
