package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

case class Ev(event_time: Timestamp, event_type: String, value: Double, user_id: Long)

/** The streaming transforms must produce the same result as their batch
  * form on a finite input — that equivalence is what lets StreamQueries
  * expose the batch form to the DuckDB oracle.
  */
class EventStreamsSpec extends SparkSpec {

  private def evs = Seq(
    Ev(Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0, 1L),
    Ev(Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0, 2L),
    Ev(Timestamp.valueOf("2024-01-01 11:05:00"), "click", 4.0, 1L),
    Ev(Timestamp.valueOf("2024-01-01 10:30:00"), "buy", 8.0, 3L))

  test("hourly aggregation: stream ≡ batch on finite input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = EventStreams.hourlyAggregation(evs.toDF())
      .orderBy("hour_start", "event_type").collect().toSeq

    val mem = MemoryStream[Ev]
    mem.addData(evs: _*)
    val q = EventStreams.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly")
        .orderBy("hour_start", "event_type").collect().toSeq
      assert(streamed == batch)
      // sanity: the 10:00 window aggregated click events across users
      val h10click = batch.find(r => r.getAs[Timestamp]("hour_start").toString
        .startsWith("2024-01-01 10") && r.getAs[String]("event_type") == "click").get
      assert(h10click.getAs[Long]("n_events") == 2)
      assert(h10click.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("windowed top-k: watermarked stream counts + finisher ≡ batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // several users per hour with a tie (users 2 and 3 both at 2 events
    // in hour 10) — the deterministic tie-break must pick user 2 first
    val topEvs = Seq(
      Ev(Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0, 1L),
      Ev(Timestamp.valueOf("2024-01-01 10:10:00"), "click", 1.0, 1L),
      Ev(Timestamp.valueOf("2024-01-01 10:15:00"), "click", 1.0, 1L),
      Ev(Timestamp.valueOf("2024-01-01 10:20:00"), "click", 1.0, 2L),
      Ev(Timestamp.valueOf("2024-01-01 10:25:00"), "click", 1.0, 2L),
      Ev(Timestamp.valueOf("2024-01-01 10:30:00"), "click", 1.0, 3L),
      Ev(Timestamp.valueOf("2024-01-01 10:35:00"), "click", 1.0, 3L),
      Ev(Timestamp.valueOf("2024-01-01 10:40:00"), "click", 1.0, 4L),
      Ev(Timestamp.valueOf("2024-01-01 11:05:00"), "click", 1.0, 4L),
      // watermark pusher: closes the 10:00 and 11:00 windows
      Ev(Timestamp.valueOf("2024-01-01 13:00:00"), "click", 1.0, 9L))

    val batch = EventStreams.topKPerWindow(
        EventStreams.hourlyUserCounts(topEvs.toDF()
          .withWatermark("event_time", "30 minutes")), k = 2)
      .orderBy("hour_start", "rank").collect().toSeq

    val mem = MemoryStream[Ev]
    val q = EventStreams.hourlyUserCounts(mem.toDF())
      .writeStream.format("memory").queryName("topk_counts")
      .outputMode("append").start()
    try {
      mem.addData(topEvs: _*)
      q.processAllAvailable()
      val streamed = EventStreams.topKPerWindow(
          spark.table("topk_counts"), k = 2)
        .orderBy("hour_start", "rank").collect().toSeq
      // append mode withheld the still-open 13:00 window; compare the
      // closed ones — the leaderboards must agree row-for-row
      val closedBatch = batch.filterNot(
        _.getAs[Timestamp]("hour_start").toString.startsWith("2024-01-01 13"))
      assert(streamed == closedBatch)
      // hour 10 leaderboard: user 1 (3 events) then the tie-break user 2
      val h10 = streamed.filter(
        _.getAs[Timestamp]("hour_start").toString.startsWith("2024-01-01 10"))
      assert(h10.map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events"), r.getAs[Int]("rank"))) ==
        Seq((1L, 3L, 1), (2L, 2L, 2)))
    } finally q.stop()
  }

  test("funnel state: stream ≡ batch, incremental events refine first-touch mins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val funnelEvs = Seq(
      Ev(Timestamp.valueOf("2024-01-01 10:00:00"), "view", 1.0, 1L),
      Ev(Timestamp.valueOf("2024-01-01 10:10:00"), "click", 1.0, 1L),
      Ev(Timestamp.valueOf("2024-01-01 10:20:00"), "purchase", 9.0, 1L),
      Ev(Timestamp.valueOf("2024-01-01 10:05:00"), "view", 1.0, 2L))
    val batch = EventStreams.funnelState(funnelEvs.toDF())
      .orderBy("user_id").collect().toSeq

    val mem = MemoryStream[Ev]
    val q = EventStreams.funnelState(mem.toDF())
      .writeStream.format("memory").queryName("funnel").outputMode("complete")
      .start()
    try {
      // feed in two increments: user 1's purchase and an EARLIER view
      // arrive after the first trigger — the per-user mins must refine
      mem.addData(funnelEvs.take(2): _*)
      q.processAllAvailable()
      mem.addData(funnelEvs.drop(2): _*)
      mem.addData(Ev(Timestamp.valueOf("2024-01-01 09:50:00"), "view", 1.0, 1L))
      q.processAllAvailable()
      val streamed = spark.table("funnel").orderBy("user_id").collect().toSeq
      val batchAll = EventStreams.funnelState(funnelEvs.toDF()
          .unionByName(Seq(Ev(Timestamp.valueOf("2024-01-01 09:50:00"), "view", 1.0, 1L)).toDF()))
        .orderBy("user_id").collect().toSeq
      assert(streamed == batchAll)
      // user 1 completed the funnel; user 2 only viewed
      val u1 = streamed.head
      assert(u1.getAs[Long]("first_view_us") < u1.getAs[Long]("first_click_us"))
      assert(u1.getAs[Long]("first_click_us") < u1.getAs[Long]("first_purchase_us"))
      assert(streamed(1).isNullAt(2) && streamed(1).isNullAt(3))
    } finally q.stop()
    // and the original 4-event batch answer is itself stable
    assert(batch.size == 2)
  }

  test("withEventTime converts ns longs exactly") {
    import spark.implicits._
    val df = Seq(1704103500000000123L).toDF("ts_ns") // 2024-01-01 10:05:00.000000123
    val t = EventStreams.withEventTime(df).select(col("event_time").cast("string"))
      .head().getString(0)
    assert(t == "2024-01-01 10:05:00") // truncated to µs, no double rounding
  }

  test("interval join: stream ≡ batch on finite input, window bound enforced") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      Ev(Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1.0, 1L),
      Ev(Timestamp.valueOf("2024-01-01 12:00:00"), "click", 2.0, 1L),
      Ev(Timestamp.valueOf("2024-01-01 10:30:00"), "click", 3.0, 2L))
    val purchases = Seq(
      Ev(Timestamp.valueOf("2024-01-01 10:40:00"), "purchase", 10.0, 1L), // ← click@10:00
      Ev(Timestamp.valueOf("2024-01-01 13:30:00"), "purchase", 20.0, 1L), // > click@12 + 1h
      Ev(Timestamp.valueOf("2024-01-01 09:00:00"), "purchase", 40.0, 1L), // before any click
      Ev(Timestamp.valueOf("2024-01-01 10:31:00"), "purchase", 30.0, 2L)) // ← click@10:30
    def left(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("event_time"), col("value").as("click_value"))
    def right(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("event_time"), col("value").as("p_value"))
    val batch = EventStreams
      .intervalJoin(left(clicks.toDF()), right(purchases.toDF()),
        "user_id", "event_time", "1 hour")
      .select("user_id", "click_value", "p_value")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(batch == Set((1L, 1.0, 10.0), (2L, 3.0, 30.0)))

    val lMem = MemoryStream[Ev]; val rMem = MemoryStream[Ev]
    lMem.addData(clicks: _*); rMem.addData(purchases: _*)
    val q = EventStreams
      .intervalJoinStreaming(left(lMem.toDF()), right(rMem.toDF()),
        "user_id", "event_time", "1 hour", "1 hour")
      .select("user_id", "click_value", "p_value")
      .writeStream.format("memory").queryName("ijoin").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ijoin")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("user rollup state is keyed per user") {
    import spark.implicits._
    val r = EventStreams.userRollup(evs.toDF()).collect()
      .map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("n_events")).toMap
    assert(r == Map(1L -> 2, 2L -> 1, 3L -> 1))
  }

  test("stream-static enrichment: stream ≡ batch, left join keeps orphan facts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val facts = Seq((10L, 1L), (11L, 2L), (12L, 99L)) // 99: no dim row
    val batch = EventStreams.enrichWithDimension(
        facts.toDF("event_id", "user_id"), dim, "user_id")
      .select("event_id", "tier")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(batch == Set((10L, "gold"), (11L, "silver"), (12L, null)))

    val mem = MemoryStream[(Long, Long)]
    mem.addData(facts: _*)
    val q = EventStreams.enrichWithDimension(
        mem.toDF().toDF("event_id", "user_id"), dim, "user_id")
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enrich").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1))).toSet
      assert(streamed == batch)
    } finally q.stop()

    // colliding non-key columns fail loudly, not silently shadow
    intercept[IllegalArgumentException] {
      EventStreams.enrichWithDimension(facts.toDF("event_id", "user_id"),
        dim.withColumnRenamed("tier", "event_id"), "user_id")
    }
  }
}
