package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

case class WinEv(event_time: Timestamp, event_type: String, value: Double, user_id: Long)

/** Hopping and native-session windows: stream ≡ batch on a finite
  * input, plus the semantics that distinguish them from tumbling
  * windows (overlap membership; gap-merge boundaries).
  */
class WindowShapesSpec extends SparkSpec {

  private def evs = Seq(
    WinEv(Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0, 1L),
    WinEv(Timestamp.valueOf("2024-01-01 10:25:00"), "click", 2.0, 1L),
    WinEv(Timestamp.valueOf("2024-01-01 11:25:00"), "buy", 4.0, 1L),
    // user 2: events exactly 30 min apart — Spark's boundary is
    // INCLUSIVE (next.start <= prev.end), so they MERGE
    WinEv(Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1.0, 2L),
    WinEv(Timestamp.valueOf("2024-01-01 10:30:00"), "click", 1.0, 2L),
    // user 3: 30:01 gap splits
    WinEv(Timestamp.valueOf("2024-01-01 12:00:00"), "click", 1.0, 3L),
    WinEv(Timestamp.valueOf("2024-01-01 12:30:01"), "click", 1.0, 3L))

  test("hopping window: every event lands in exactly two 1h/30m windows; stream ≡ batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = EventStreams.hoppingAggregation(evs.toDF())
      .orderBy("win_epoch", "event_type").collect().toSeq
    // total window-memberships = 2 × events
    assert(batch.map(_.getAs[Long]("n_events")).sum == 2L * evs.size)
    // 10:05 click is in the 09:30 and 10:00 windows
    val starts = batch.filter(_.getAs[String]("event_type") == "click")
      .map(_.getAs[Long]("win_epoch")).toSet
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    assert(starts.contains(t0) && starts.contains(t0 - 1800))

    val mem = MemoryStream[WinEv]
    mem.addData(evs: _*)
    val q = EventStreams.hoppingCounts(mem.toDF())
      .writeStream.format("memory").queryName("hopping").outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hopping")
        .orderBy("win_epoch", "event_type").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("session window: sub-gap merges, exact gap merges (inclusive), over-gap splits; stream ≡ batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = EventStreams.sessionWindowAggregation(evs.toDF())
      .orderBy("user_id", "sess_epoch").collect().toSeq
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_epoch"),
        r.getAs[Long]("n_events")))
    def ep(s: String) = Timestamp.valueOf(s).getTime / 1000
    assert(batch === Seq(
      (1L, ep("2024-01-01 10:05:00"), 2L), // 20-min gap: merged
      (1L, ep("2024-01-01 11:25:00"), 1L),
      (2L, ep("2024-01-01 10:00:00"), 2L), // exactly 30 min: merged (inclusive)
      (3L, ep("2024-01-01 12:00:00"), 1L), // 30:01 gap: split
      (3L, ep("2024-01-01 12:30:01"), 1L)))

    val mem = MemoryStream[WinEv]
    mem.addData(evs: _*)
    val q = EventStreams.sessionWindowCounts(mem.toDF())
      .writeStream.format("memory").queryName("sesswin").outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sesswin")
        .orderBy("user_id", "sess_epoch").collect().toSeq
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_epoch"),
          r.getAs[Long]("n_events")))
      assert(streamed === batch)
    } finally q.stop()
  }
}
