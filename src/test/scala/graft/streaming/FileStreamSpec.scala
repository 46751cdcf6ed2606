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
