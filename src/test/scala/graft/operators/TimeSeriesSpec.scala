package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val obs = Seq(
    // key 1: observed at 0, 4 (gap 1..3), 5
    (1L, 0L, 10.0), (1L, 4L, 18.0), (1L, 5L, 17.0),
    // key 2: single point — no gaps
    (2L, 7L, 1.5)
  ).toDF("k", "t", "v")

  test("fills every slot in span; observed values pass through") {
    val out = TimeSeries.gapFillLinear(obs, "k", "t", "v")
      .orderBy("k", "t")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 10.0, false),
      (1L, 1L, 12.0, true),
      (1L, 2L, 14.0, true),
      (1L, 3L, 16.0, true),
      (1L, 4L, 18.0, false),
      (1L, 5L, 17.0, false),
      (2L, 7L, 1.5, false)))
  }

  test("integral mode interpolates with truncating integer division") {
    val fx = Seq((1L, 0L, 10L), (1L, 3L, 20L)).toDF("k", "t", "v")
    val out = TimeSeries.gapFillLinear(fx, "k", "t", "v", integral = true)
      .orderBy("t").as[(Long, Long, Long, Boolean)].collect().toSeq
    // (20-10)*1/3 = 3 (trunc), *2/3 = 6 (trunc)
    assert(out === Seq((1L, 0L, 10L, false), (1L, 1L, 13L, true),
      (1L, 2L, 16L, true), (1L, 3L, 20L, false)))
  }

  test("descending series interpolates symmetrically") {
    val fx = Seq((9L, 10L, 30.0), (9L, 14L, 22.0)).toDF("k", "t", "v")
    val filled = TimeSeries.gapFillLinear(fx, "k", "t", "v")
      .where(col("interpolated")).as[(Long, Long, Double, Boolean)]
      .collect().map(r => (r._2, r._3)).toMap
    assert(filled === Map(11L -> 28.0, 12L -> 26.0, 13L -> 24.0))
  }

  test("output covers exactly the [min, max] grid per key") {
    val out = TimeSeries.gapFillLinear(obs, "k", "t", "v")
    val spans = out.groupBy(col("k"))
      .agg(min(col("t")).as("lo"), max(col("t")).as("hi"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans === Set((1L, 0L, 5L, 6L), (2L, 7L, 7L, 1L)))
  }
}
