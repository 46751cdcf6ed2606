package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  // u1 completes the ordered funnel; u2 clicks BEFORE viewing (ordered
  // click must not count); u3 views only
  private def events = Seq(
    (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
    (2L, "click", 5L), (2L, "view", 15L),
    (3L, "view", 7L)
  ).toDF("user_id", "event_type", "ts_us")

  private def rep(dir: String) = FunnelStream.report(spark, dir).head()

  test("maintained report equals one-shot; ordered-stage semantics hold") {
    val d = java.nio.file.Files.createTempDirectory("fn1").toString + "/s"
    FunnelStream.applyBatch(events, d, 0)
    val r = rep(d)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L)
  }

  test("out-of-order batches converge (min-merge is order-free)") {
    val d = java.nio.file.Files.createTempDirectory("fn2").toString + "/s"
    // later events land FIRST; the view that makes u1's funnel valid
    // arrives in the last batch and must repair the whole chain
    FunnelStream.applyBatch(events.where(col("ts_us") >= 20), d, 0)
    FunnelStream.applyBatch(
      events.where(col("ts_us") >= 10 && col("ts_us") < 20), d, 1)
    FunnelStream.applyBatch(events.where(col("ts_us") < 10), d, 2)
    val r = rep(d)
    assert(r.getLong(0) == 3L && r.getLong(2) == 1L && r.getLong(3) == 1L)
  }

  test("crash-retried batch is absorbed; duplicate events collapse by min") {
    val d = java.nio.file.Files.createTempDirectory("fn3").toString + "/s"
    FunnelStream.applyBatch(events, d, 0)
    val once = rep(d)
    FunnelStream.applyBatch(events, d, 0) // same id: idempotent overwrite
    assert(rep(d) == once)
    // a re-DELIVERED event in a later batch (at-least-once source) is
    // harmless: min of equal timestamps
    FunnelStream.applyBatch(
      Seq((1L, "view", 10L)).toDF("user_id", "event_type", "ts_us"), d, 1)
    assert(rep(d) == once)
  }
}
