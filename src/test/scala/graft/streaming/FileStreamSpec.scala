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
