package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** File-source streaming: the MemoryStream specs prove transform
  * semantics, but a production stream reads FILES — a different source
  * path (directory listing, schema declaration, per-trigger file
  * batching). This drives readStream over a parquet directory that
  * grows between triggers and asserts the result equals the batch run.
  */
class FileStreamSpec extends SparkSpec {

  test("stateless text prep (clean + PII redact + tokens) ≡ batch under readStream") {
    import spark.implicits._
    import graft.functions.TextOps
    val dir = java.nio.file.Files.createTempDirectory("graft_textstream").toString
    val docs = Seq(
      (1L, "Contact me at a.user@example.com  NOW"),
      (2L, "<b>server</b> 10.0.0.1 is   down"),
      (3L, "plain text with no pii at all"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/batch0")
    def prep(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      TextOps.redactPii(TextOps.cleanText(col("text"))).as("body"),
      size(TextOps.tokens(TextOps.cleanText(col("text")))).cast("long").as("n_tokens"))
    val schema = docs.toDF("doc_id", "text").schema
    // the whole text surface is stateless column math, so it runs
    // unchanged under Structured Streaming — a corpus-prep pipeline can
    // process documents as they land, no batch/stream fork
    val q = prep(spark.readStream.schema(schema).parquet(s"$dir/batch*"))
      .writeStream.format("memory").queryName("text_prep").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("text_prep").orderBy("doc_id").collect().toSeq
      val batch = prep(docs.toDF("doc_id", "text")).orderBy("doc_id").collect().toSeq
      assert(streamed == batch)
      assert(streamed.head.getAs[String]("body") == "contact me at <EMAIL> now")
      assert(streamed(1).getAs[String]("body") == "server <IP> is down")
    } finally q.stop()
  }

  test("jsonl directory streams with growing input; corrupt lines stay out of typed rows") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonlstream").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def writeShard(name: String, lines: Seq[String]): Unit = {
      val w = new java.io.PrintWriter(s"$dir/$name")
      lines.foreach(w.println); w.close()
    }
    writeShard("shard0.json", Seq(
      """{"doc_id": 1, "text": "first document"}""",
      """{"doc_id": 2, "text": "second document"}"""))
    val q = spark.readStream.schema(schema)
      .option("mode", "PERMISSIVE").json(dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .writeStream.format("memory").queryName("jsonl_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("jsonl_stream").count() == 2)
      // a later shard lands — including a corrupt line, which must
      // surface as an all-null typed row (PERMISSIVE), not kill the query
      writeShard("shard1.json", Seq(
        """{"doc_id": 3, "text": "third document"}""",
        """{"doc_id": 4, "text": BROKEN"""))
      q.processAllAvailable()
      val rows = spark.table("jsonl_stream").orderBy("doc_id").collect()
      assert(rows.length == 4)
      assert(rows.count(_.isNullAt(0)) == 1) // the corrupt line
      assert(rows.filter(!_.isNullAt(0)).map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("checkpointed stream restarts exactly-once: no loss, no duplicates") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val schema = Seq((1L, "a")).toDF("id", "v").schema
    def start() = spark.readStream.schema(schema).parquet(s"$in/batch*")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$in/batch0")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // files arriving while the query is DOWN must be picked up on
    // restart; files already committed to the checkpoint must not be
    // re-emitted — the exactly-once file-sink contract a production
    // ingest pipeline restarts depend on
    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$in/batch1")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "a", 2L -> "b", 3L -> "c"), got)
  }

  test("CmsStream.maintain under a file-source readStream equals the one-shot sketch, across triggers and a restart") {
    import spark.implicits._
    import graft.operators.Sketches
    val base = java.nio.file.Files.createTempDirectory("cms_fs").toString
    val (in, state, ckpt) = (s"$base/in", s"$base/state", s"$base/ckpt")
    val all = (1L to 600L).map(i => s"t${i % 37}")
    all.take(200).toDF("t").write.parquet(s"$in/batch0")
    val schema = all.take(1).toDF("t").schema
    def start() = CmsStream.maintain(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$in/batch*"),
      "t", width = 256, depth = 4, state, ckpt)
    val q1 = start()
    try {
      q1.processAllAvailable()
      all.slice(200, 400).toDF("t").write.parquet(s"$in/batch1")
      q1.processAllAvailable()
    } finally q1.stop()
    // a file landing while the query is down folds exactly once on restart
    all.drop(400).toDF("t").write.parquet(s"$in/batch2")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val maintained = CmsStream.counters(spark, state)
      .orderBy("d", "bucket").collect().toSeq
    val oneShot = Sketches.cmsFit(all.toDF("t"), "t", width = 256, depth = 4)
      .orderBy("d", "bucket").collect().toSeq
    assert(maintained == oneShot)
  }

  test("ChunkStoreStream.maintain under a file-source readStream equals the one-shot dedup report") {
    import spark.implicits._
    import graft.operators.CdcChunking
    val base = java.nio.file.Files.createTempDirectory("cdc_fs").toString
    val (in, store, ckpt) = (s"$base/in", s"$base/store", s"$base/ckpt")
    // overlapping text so cross-batch duplicate chunks exist
    val docs = (1L to 60L).map(i =>
      (i, s"alpha beta gamma delta shared tail ${i % 5} epsilon zeta eta theta"))
    docs.take(30).toDF("doc_id", "text").write.parquet(s"$in/batch0")
    val schema = docs.take(1).toDF("doc_id", "text").schema
    val q = ChunkStoreStream.maintain(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$in/batch*"),
      "text", "doc_id", store, ckpt)
    try {
      q.processAllAvailable()
      docs.drop(30).toDF("doc_id", "text").write.parquet(s"$in/batch1")
      q.processAllAvailable()
    } finally q.stop()
    val maintained = ChunkStoreStream.report(spark, store).head()
    val oneShot = CdcChunking.dedupReport(
      CdcChunking.chunks(docs.toDF("doc_id", "text"), "text", "doc_id",
        w = 4, divisor = 8)).head()
    assert(maintained == oneShot)
  }

  /** The parameterized trigger-slice + restart harness behind every
    * `*_maintained` proof (r17 verdict item 3): slice 0 is on disk
    * before the query starts, slice 1 lands mid-run (picked up
    * incrementally under `maxFilesPerTrigger = 1`), slice 2 lands
    * while the query is DOWN and must fold exactly once on restart
    * (same checkpoint). Slices write single-file so order-sensitive
    * folds (markov, scd2) see their time slicing intact; `mk` builds
    * the operator's maintain() query and closes over its own state +
    * checkpoint dirs.
    */
  private def runSlicedFileStream(tag: String,
      slices: Seq[org.apache.spark.sql.DataFrame])(
      mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    require(slices.size == 3, "three slices: pre-start, mid-run, while-down")
    val in = java.nio.file.Files.createTempDirectory(tag).toString + "/in"
    val schema = slices.head.schema
    slices(0).coalesce(1).write.parquet(s"$in/batch0")
    def start() = mk(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/batch*"))
    val q1 = start()
    try {
      q1.processAllAvailable()
      slices(1).coalesce(1).write.parquet(s"$in/batch1")
      q1.processAllAvailable()
    } finally q1.stop()
    slices(2).coalesce(1).write.parquet(s"$in/batch2")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("BtStream under a file-source readStream equals the one-shot MM ratings") {
    import spark.implicits._
    val matches = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("a", "b"), ("b", "a"), ("a", "c"), ("c", "b"), ("b", "c"))
      .toDF("winner", "loser")
    val base = tmp("bt_fs")
    val slices = Seq(matches.limit(3),
      matches.offset(3).limit(3), matches.offset(6))
    runSlicedFileStream("bt_fs_in", slices)(
      BtStream.maintain(_, "winner", "loser", s"$base/state", s"$base/ckpt"))
    val maintained = BtStream.ratings(spark, s"$base/state", iters = 3)
      .orderBy("player").collect().toSeq
    val oneShot = graft.operators.Preference
      .bradleyTerry(matches, "winner", "loser", iters = 3)
      .orderBy("player").collect().toSeq
    assert(maintained == oneShot)
  }

  test("KmvStream under a file-source readStream equals the one-shot sketch fold") {
    import spark.implicits._
    val rows = ((1L to 300L).map(("x", _)) ++ (150L to 450L).map(("y", _)))
      .toDF("g", "v")
    val base = tmp("kmv_fs")
    runSlicedFileStream("kmv_fs_in", Seq(
      rows.where(col("v") < 200), rows.where(col("v") >= 200 && col("v") < 350),
      rows.where(col("v") >= 350)))(
      KmvStream.maintain(_, "g", "v", 64, s"$base/state", s"$base/ckpt"))
    KmvStream.applyBatch(rows, "g", "v", 64, s"$base/one", 0)
    def est(d: String) = KmvStream.estimates(spark, d, "g", 64)
      .orderBy("g").collect().toSeq
    assert(est(s"$base/state") == est(s"$base/one"))
  }

  test("MarkovStream under a file-source readStream equals the one-shot transitions") {
    import spark.implicits._
    val events = (for (u <- 1L to 5L; i <- 0L until 6L) yield
      (u, Seq("view", "click", "buy")((i % 3).toInt), u * 1000L + i * 10L,
        u * 100L + i)).toDF("user_id", "event_type", "ts_us", "event_id")
    val base = tmp("mkv_fs")
    // time-sliced batches: the append-log replay contract
    runSlicedFileStream("mkv_fs_in", Seq(
      events.where(col("event_id") % 100 < 2),
      events.where(col("event_id") % 100 >= 2 && col("event_id") % 100 < 4),
      events.where(col("event_id") % 100 >= 4)))(
      MarkovStream.maintain(_, s"$base/counts", s"$base/last", s"$base/ckpt"))
    MarkovStream.applyBatch(events, s"$base/oc", s"$base/ol", 0)
    def tr(d: String) = MarkovStream.transitions(spark, d)
      .orderBy("src", "dst").collect().toSeq
    assert(tr(s"$base/counts") == tr(s"$base/oc"))
  }

  test("SprtStream under a file-source readStream equals the one-shot curve") {
    import spark.implicits._
    val arrivals = (for (arm <- Seq("A", "B"); h <- 1L to 6L) yield
      (arm, h, h % 2)).toDF("arm", "hour", "conv")
    val base = tmp("sprt_fs")
    runSlicedFileStream("sprt_fs_in", Seq(
      arrivals.where(col("hour") <= 2),
      arrivals.where(col("hour") > 2 && col("hour") <= 4),
      arrivals.where(col("hour") > 4)))(
      SprtStream.maintain(_, s"$base/counts", s"$base/ckpt"))
    SprtStream.applyBatch(arrivals, s"$base/one", 0)
    def cv(d: String) = SprtStream
      .curve(spark, d, p0 = 0.4, p1 = 0.5, bound = 2.94443898)
      .orderBy("arm", "hour").collect().toSeq
    assert(cv(s"$base/counts") == cv(s"$base/one"))
  }

  test("QuantileStream under a file-source readStream equals the one-shot sketch read") {
    import spark.implicits._
    import graft.operators.QuantileSketch
    val rows = (1L to 400L).map(i => (s"t${i % 3}", i, i * 1.5))
      .toDF("g", "id", "v")
    val base = tmp("qsk_fs")
    runSlicedFileStream("qsk_fs_in", Seq(
      rows.where(col("id") % 3 === 0), rows.where(col("id") % 3 === 1),
      rows.where(col("id") % 3 === 2)))(
      QuantileStream.maintain(_, "g", "v", "id", 64, s"$base/state",
        s"$base/ckpt"))
    val maintained = QuantileStream
      .quantiles(spark, s"$base/state", "g", Seq(500000L, 900000L))
      .orderBy("g", "q_ppm").collect().toSeq
    val oneShot = QuantileSketch.quantiles(
      QuantileSketch.sketch(rows, Seq("g"), "v", "id", 64),
      Seq("g"), Seq(500000L, 900000L))
      .orderBy("g", "q_ppm").collect().toSeq
    assert(maintained == oneShot)
  }

  test("JoinStream under a tagged file-source readStream equals the direct join") {
    import spark.implicits._
    val a = (1L to 40L).map(k => (k % 10, k)).toDF("k", "va")
    val b = (1L to 30L).map(k => (k % 10, k * 100L)).toDF("k", "vb")
    val tagged = a.select(lit("a").as("side"), col("k"), col("va"),
        lit(null).cast("long").as("vb"))
      .unionByName(b.select(lit("b").as("side"), col("k"),
        lit(null).cast("long").as("va"), col("vb")))
    val base = tmp("join_fs")
    val dirs = (s"$base/view", s"$base/a", s"$base/b")
    runSlicedFileStream("join_fs_in", Seq(
      tagged.where(col("k") < 4), tagged.where(col("k") >= 4 && col("k") < 7),
      tagged.where(col("k") >= 7)))(
      JoinStream.maintain(_, "side", Seq("k", "va"), Seq("k", "vb"),
        Seq("k"), dirs, s"$base/ckpt"))
    val maintained = JoinStream.view(spark, dirs._1)
      .orderBy("k", "va", "vb").collect().toSeq
    val direct = a.join(b, Seq("k"))
      .orderBy("k", "va", "vb").collect().toSeq
    assert(maintained == direct)
  }

  test("FunnelStream under a file-source readStream equals the one-shot report") {
    import spark.implicits._
    val events = (for (u <- 1L to 8L; (t, off) <- Seq(("view", 0L),
      ("click", 5L), ("purchase", 9L)) if off < u + 3) yield
      (u, t, u * 100L + off)).toDF("user_id", "event_type", "ts_us")
    val base = tmp("fun_fs")
    runSlicedFileStream("fun_fs_in", Seq(
      events.where(col("user_id") <= 3),
      events.where(col("user_id") > 3 && col("user_id") <= 6),
      events.where(col("user_id") > 6)))(
      FunnelStream.maintain(_, s"$base/state", s"$base/ckpt"))
    FunnelStream.applyBatch(events, s"$base/one", 0)
    def rep(d: String) = FunnelStream.report(spark, d).collect().toSeq
    assert(rep(s"$base/state") == rep(s"$base/one"))
  }

  test("WinnowStream under a file-source readStream equals the one-shot index") {
    import spark.implicits._
    val docs = (1L to 30L).map(i =>
      (i, s"the quick brown fox ${i % 4} jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val base = tmp("win_fs")
    runSlicedFileStream("win_fs_in", Seq(
      docs.where(col("doc_id") <= 10),
      docs.where(col("doc_id") > 10 && col("doc_id") <= 20),
      docs.where(col("doc_id") > 20)))(
      WinnowStream.maintain(_, "text", "doc_id", s"$base/ix", s"$base/ckpt"))
    WinnowStream.applyBatch(docs, "text", "doc_id", s"$base/one", 0)
    def ix(d: String) = WinnowStream.index(spark, d)
      .orderBy("doc", "fp").collect().toSeq
    assert(ix(s"$base/ix") == ix(s"$base/one"))
  }

  test("ScdStream under a file-source readStream equals the one-shot history build") {
    import spark.implicits._
    val changes = (for (u <- 1L to 6L; i <- 0L until 4L) yield
      (u, 1000L + i * 100L, u * 10L + i, s"s${(u + i) % 3}"))
      .toDF("user_id", "ts_us", "event_id", "state")
    val base = tmp("scd_fs")
    // ts-sliced batches: SCD2 changes arrive in time order
    runSlicedFileStream("scd_fs_in", Seq(
      changes.where(col("ts_us") <= 1100L),
      changes.where(col("ts_us") === 1200L),
      changes.where(col("ts_us") === 1300L)))(
      ScdStream.maintain(_, s"$base/hist", s"$base/ckpt",
        "user_id", "ts_us", "event_id", "state"))
    ScdStream.applyBatch(changes, s"$base/one", 0,
      "user_id", "ts_us", "event_id", "state")
    def hist(d: String) = graft.operators.DurableIters.latest(spark, d).get._2
      .orderBy("user_id", "valid_from").collect().toSeq
    assert(hist(s"$base/hist") == hist(s"$base/one"))
  }

  test("Bm25Stream under a file-source readStream scores like the one-shot corpus pass") {
    import spark.implicits._
    import graft.operators.Retrieval
    val docs = Seq(
      (1L, "apple banana apple cherry"), (2L, "apple cherry durian"),
      (3L, "durian elderberry fig grape"), (4L, "banana banana fig apple"),
      (5L, "cherry fig grape apple"), (6L, "elderberry grape banana"))
      .toDF("doc_id", "text")
    val queries = Seq((10L, "apple fig"), (11L, "durian"))
      .toDF("query_id", "qtext")
    val base = tmp("bm25_fs")
    runSlicedFileStream("bm25_fs_in", Seq(
      docs.where(col("doc_id") <= 2),
      docs.where(col("doc_id") > 2 && col("doc_id") <= 4),
      docs.where(col("doc_id") > 4)))(
      Bm25Stream.maintain(_, "text", "doc_id", s"$base/ix", s"$base/ckpt"))
    val maintained = Bm25Stream.topK(spark, s"$base/ix", queries, k = 3)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = Retrieval.bm25TopK(docs, queries, k = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(maintained == oneShot)
  }

  test("parquet file stream ≡ batch for the hourly aggregation, across triggers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_filestream").toString
    val first = Seq(
      Ev(Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0, 1L),
      Ev(Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0, 2L))
    val second = Seq(
      Ev(Timestamp.valueOf("2024-01-01 11:05:00"), "click", 4.0, 1L),
      Ev(Timestamp.valueOf("2024-01-01 10:30:00"), "buy", 8.0, 3L))
    first.toDF().write.parquet(s"$dir/batch0")

    // file sources need an explicit schema (no inference on streams)
    val schema = first.toDF().schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // force multi-trigger incremental reads
      .parquet(s"$dir/batch*")
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // grow the directory AFTER the stream started — the second trigger
      // must pick the new files up incrementally
      second.toDF().write.parquet(s"$dir/batch1")
      q.processAllAvailable()
      val streamed = spark.table("file_hourly")
        .orderBy("hour_start", "event_type").collect().toSeq
      val batch = EventStreams.hourlyAggregation((first ++ second).toDF())
        .orderBy("hour_start", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.map(_.getAs[Long]("n_events")).sum == 4L)
    } finally q.stop()
  }
}
