package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import EventStreams.{Session, SessionEvent}

class SessionizeSpec extends SparkSpec {

  // user 1: two sessions separated by a 10-min gap; user 2: one session
  private val evs = Seq(
    SessionEvent(1L, 0L, 1.0),
    SessionEvent(1L, 60_000L, 2.0),
    SessionEvent(1L, 700_000L, 4.0),   // > 5-min gap → new session
    SessionEvent(2L, 100_000L, 8.0))
  private val gap = 300_000L

  test("stateful sessionization closes sessions on gap (streaming run)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = EventStreams.sessionize(mem.toDS(), gap)
      .writeStream.format("memory").queryName("sessions").outputMode("append")
      .start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      // only user 1's FIRST session is closed; the rest are open state
      val closed = spark.table("sessions").as[Session].collect()
      assert(closed.toSeq == Seq(Session(1L, 0L, 60_000L, 2L, 3.0)))

      // a later batch far in the future closes user 1's second session
      mem.addData(SessionEvent(1L, 2_000_000L, 0.5))
      q.processAllAvailable()
      val after = spark.table("sessions").as[Session].collect().toSet
      assert(after.contains(Session(1L, 700_000L, 700_000L, 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence, state watermark-bounded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val events = mem.toDS().toDF("event_id", "key", "t_ms")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
    val q = EventStreams.dedupByKey(events, Seq("key"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("deduped").outputMode("append")
      .start()
    try {
      mem.addData((1L, "a", 1000L), (2L, "a", 2000L), (3L, "b", 1500L))
      q.processAllAvailable()
      mem.addData((4L, "a", 3000L)) // still a dup within the watermark
      q.processAllAvailable()
      val out = spark.table("deduped")
        .select("event_id", "key").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(out.toSet == Set((1L, "a"), (3L, "b")), out.mkString(","))
    } finally q.stop()
  }

  test("sessionizeBatch ≡ streaming closed ∪ open sessions on the same input") {
    import spark.implicits._
    val df = evs.toDF().withColumn("ts_us",
      org.apache.spark.sql.functions.col("event_ms") * 1000L)
    val batch = EventStreams.sessionizeBatch(df, gapUs = gap * 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(2) / 1000L, r.getLong(3) / 1000L,
        r.getLong(4), r.getDouble(5))).toSet
    // all sessions the stateful operator would ever emit (closed + open)
    val expected = Set(
      (1L, 0L, 60_000L, 2L, 3.0),
      (1L, 700_000L, 700_000L, 1L, 4.0),
      (2L, 100_000L, 100_000L, 1L, 8.0))
    assert(batch == expected, batch.toString)
  }

  test("batch epilogue flushes open sessions with the same math") {
    import spark.implicits._
    val open = EventStreams.openSessions(evs.toDS(), gap).collect().toSet
    assert(open.contains(Session(2L, 100_000L, 100_000L, 1L, 8.0)))
    // user 1's LAST session per batch semantics
    assert(open.contains(Session(1L, 700_000L, 700_000L, 1L, 4.0)))
  }
}
