package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvStreamSpec extends SparkSpec {
  import spark.implicits._

  private def est(dir: String) =
    KmvStream.estimates(spark, dir, "g", k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("maintained sketch ≡ one-shot whatever the batch packing") {
    val rows = (1L to 500L).map(("x", _)) ++ (200L to 700L).map(("y", _))
    val df = rows.toDF("g", "v")
    val d1 = java.nio.file.Files.createTempDirectory("kmv1").toString + "/s"
    KmvStream.applyBatch(df, "g", "v", 64, d1, 0)
    val one = est(d1)
    val d2 = java.nio.file.Files.createTempDirectory("kmv2").toString + "/s"
    KmvStream.applyBatch(df.where(col("v") < 300), "g", "v", 64, d2, 0)
    KmvStream.applyBatch(df.where(col("v") >= 300 && col("v") < 550),
      "g", "v", 64, d2, 1)
    KmvStream.applyBatch(df.where(col("v") >= 550), "g", "v", 64, d2, 2)
    assert(est(d2) == one)
    // overlapping values across batches dedup (a sketch sees the SET):
    val d3 = java.nio.file.Files.createTempDirectory("kmv3").toString + "/s"
    KmvStream.applyBatch(df, "g", "v", 64, d3, 0)
    KmvStream.applyBatch(df.where(col("v") < 400), "g", "v", 64, d3, 1)
    assert(est(d3) == one)
  }

  test("crash-retried batch is absorbed (exactly-once)") {
    val df = (1L to 300L).map(("x", _)).toDF("g", "v")
    val d = java.nio.file.Files.createTempDirectory("kmv4").toString + "/s"
    KmvStream.applyBatch(df.where(col("v") <= 150), "g", "v", 64, d, 0)
    KmvStream.applyBatch(df.where(col("v") > 150), "g", "v", 64, d, 1)
    val once = est(d)
    KmvStream.applyBatch(df.where(col("v") > 150), "g", "v", 64, d, 1)
    assert(est(d) == once)
  }
}
