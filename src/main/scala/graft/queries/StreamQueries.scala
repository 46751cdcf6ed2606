package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-time queries over the `events` table. SURVEY.md §2.11: the
  * reference has no streaming at all; these are the engine's extension
  * slice. Each query here is the *batch-equivalent* of the Structured
  * Streaming pipelines in graft.streaming.EventStreams (same expressions,
  * same results on a finite input — that equivalence is asserted in
  * EventStreamsSpec), so the driver can oracle-check it in DuckDB.
  *
  * `ts` arrives as raw nanosecond longs (see Tables.events); time bucketing
  * is pure integer arithmetic — cheapest possible form at 100 TB, no
  * timezone or calendar logic in the hot path.
  */
object StreamQueries {

  private val NanosPerHour = 3600L * 1000L * 1000L * 1000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour window: count + sum/avg per (window, event_type).
    "stream_hourly_agg" -> ((s, dir) => {
      Tables.events(s, dir)
        // integer `div`, not `/`: at ~1.7e18 ns a double mantissa is 128 ns
        // coarse — enough to flip a bucket boundary.
        .withColumn("hour_epoch", expr(s"(ts_ns div $NanosPerHour) * 3600"))
        .groupBy(col("hour_epoch"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("sum_value"),
          round(avg(col("value")), 4).as("avg_value"))
    }),

    // Sessionization-lite: per-user event counts and value totals with
    // first/last event times — the stateful-aggregation shape
    // (mapGroupsWithState) expressed as a batch groupBy.
    "stream_user_rollup" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("total_value"),
          // µs, not ns: DuckDB truncates parquet TIMESTAMP(NANOS) to µs,
          // so the comparable granularity is microseconds.
          expr("min(ts_ns) div 1000").as("first_ts_us"),
          expr("max(ts_ns) div 1000").as("last_ts_us"),
          countDistinct(col("event_type")).as("n_types"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "stream_hourly_agg" ->
      """SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS hour_epoch,
              event_type,
              CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 4) AS sum_value,
              round(avg(value), 4) AS avg_value
         FROM events GROUP BY 1, 2""",
    "stream_user_rollup" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 4) AS total_value,
              CAST(epoch_us(min(ts)) AS BIGINT) AS first_ts_us,
              CAST(epoch_us(max(ts)) AS BIGINT) AS last_ts_us,
              CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
         FROM events GROUP BY user_id"""
  )
}
