package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Per-user running rollup (update-mode aggregation). */
  def userRollup(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"),
        max(col("event_time")).as("last_seen"))
}
