package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {

  test("sketch: at most k rows per group, exact sample when group < k") {
    import spark.implicits._
    val df = (1L to 100L).map(i => ("a", i, i.toDouble))
      .++((1L to 5L).map(i => ("b", 1000L + i, i.toDouble)))
      .toDF("g", "id", "v")
    val sk = QuantileSketch.sketch(df, Seq("g"), "v", "id", k = 10)
    val counts = sk.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") == 10L && counts("b") == 5L)
    // the small group's sample IS the group → exact quantiles
    val q = QuantileSketch.quantiles(sk.where(col("g") === "b"), Seq("g"),
      Seq(500000L)).head()
    assert(q.getLong(2) == 5L && q.getDouble(3) == 3.0) // ceil(0.5·5) = 3rd of 1..5
  }

  test("merge law: merged per-part sketches ≡ the whole-data sketch") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => ("g", i, (i * 37 % 1000).toDouble))
      .toDF("g", "id", "v")
    val whole = QuantileSketch.sketch(df, Seq("g"), "v", "id", k = 64)
    // three arbitrary disjoint parts, sketched independently, merged
    val parts = Seq(
      df.where(col("id") % 3 === 0), df.where(col("id") % 3 === 1),
      df.where(col("id") % 3 === 2))
      .map(p => QuantileSketch.sketch(p, Seq("g"), "v", "id", k = 64))
      .reduce(_ unionAll _)
    val merged = QuantileSketch.merge(parts, Seq("g"), k = 64)
    val a = whole.orderBy("h").collect().map(_.toSeq).toSeq
    val b = merged.orderBy("h").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("quantile estimates land within the sample-rank error band") {
    import spark.implicits._
    // uniform 0..9999: true p50 = ~5000; k = 256 → rank se ~ 1/√256 ≈
    // 6.25% — assert within 4 se (25 points of percentile)
    val df = (0L until 10000L).map(i => ("g", i, ((i * 7919) % 10000).toDouble))
      .toDF("g", "id", "v")
    val sk = QuantileSketch.sketch(df, Seq("g"), "v", "id", k = 256)
    val ests = QuantileSketch.quantiles(sk, Seq("g"),
      Seq(500000L, 900000L)).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(math.abs(ests(500000L) - 5000.0) < 2500.0)
    assert(math.abs(ests(900000L) - 9000.0) < 2500.0)
    assert(ests(900000L) > ests(500000L)) // monotone reads
  }

  test("stream fold: batches ≡ one-shot; replayed batch is a no-op") {
    import spark.implicits._
    val df = (1L to 300L).map(i => ("g", i, (i * 13 % 271).toDouble))
      .toDF("g", "id", "v")
    val dir = java.nio.file.Files.createTempDirectory("qs-spec").toString
    graft.streaming.QuantileStream.applyBatch(
      df.where(col("id") <= 100), "g", "v", "id", 32, dir, 0)
    graft.streaming.QuantileStream.applyBatch(
      df.where(col("id") > 100 && col("id") <= 200), "g", "v", "id", 32, dir, 1)
    // batch 1 REPLAYS (sink retry) before batch 2 arrives
    graft.streaming.QuantileStream.applyBatch(
      df.where(col("id") > 100 && col("id") <= 200), "g", "v", "id", 32, dir, 1)
    graft.streaming.QuantileStream.applyBatch(
      df.where(col("id") > 200), "g", "v", "id", 32, dir, 2)
    val folded = graft.streaming.QuantileStream.quantiles(
      spark, dir, "g", Seq(500000L)).head()
    val oneShot = QuantileSketch.quantiles(
      QuantileSketch.sketch(df, Seq("g"), "v", "id", 32),
      Seq("g"), Seq(500000L)).head()
    assert(folded == oneShot)
  }

  test("determinism: same sketch and estimates on any partitioning") {
    import spark.implicits._
    val df = (1L to 500L).map(i => ("g", i, (i % 97).toDouble)).toDF("g", "id", "v")
    val a = QuantileSketch.quantiles(
      QuantileSketch.sketch(df, Seq("g"), "v", "id", k = 32),
      Seq("g"), Seq(250000L, 750000L)).collect().map(_.toSeq).toSet
    val b = QuantileSketch.quantiles(
      QuantileSketch.sketch(df.repartition(7, col("v")), Seq("g"), "v", "id", k = 32),
      Seq("g"), Seq(250000L, 750000L)).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
