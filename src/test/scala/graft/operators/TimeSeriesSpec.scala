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

  private def ewmaOf(vals: Seq[Long], terms: Int = 4): Seq[Double] = {
    val df = vals.zipWithIndex.map { case (v, t) => ("k", t.toLong, v) }
      .toDF("k", "t", "v")
    TimeSeries.ewmaPow2Bounded(df, Seq("k"), "t", "v", terms)
      .orderBy(col("t"))
      .select(col("ewma_num").cast("double") / col("ewma_den"))
      .as[Double].collect().toSeq
  }

  test("ewma: first row is the observation itself; constant series stays put") {
    assert(ewmaOf(Seq(42L)).head == 42.0)
    assert(ewmaOf(Seq(7L, 7L, 7L, 7L, 7L, 7L)).forall(_ == 7.0))
  }

  test("ewma matches the hand-computed α=1/2 adjusted weights") {
    // terms=4 → weights 8,4,2,1 over lags 0..3
    val got = ewmaOf(Seq(10L, 20L, 30L, 40L, 50L))
    val exp = Seq(
      10.0,                                     // 8·10/8
      (8 * 20 + 4 * 10) / 12.0,                 // two terms present
      (8 * 30 + 4 * 20 + 2 * 10) / 14.0,
      (8 * 40 + 4 * 30 + 2 * 20 + 1 * 10) / 15.0,
      (8 * 50 + 4 * 40 + 2 * 30 + 1 * 20) / 15.0) // window slid past 10
    assert(got == exp)
  }

  test("ewma partitions by key: series do not bleed into each other") {
    val df = Seq(("a", 0L, 100L), ("b", 0L, 0L), ("a", 1L, 100L), ("b", 1L, 0L))
      .toDF("k", "t", "v")
    val out = TimeSeries.ewmaPow2Bounded(df, Seq("k"), "t", "v", 4)
      .select(col("k"), col("ewma_num").cast("double") / col("ewma_den"))
      .as[(String, Double)].collect().toSet
    assert(out == Set(("a", 100.0), ("b", 0.0)))
  }

  test("supervisedLags: features are the prior values in order; short histories drop") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L), ("a", 4L, 40L),
      ("b", 1L, 7L), ("b", 2L, 8L)).toDF("g", "t", "y")
    val rows = TimeSeries.supervisedLags(df, Seq("g"), "t", "y", lags = 2)
      .select("g", "t", "y", "lag_1", "lag_2")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // 'a' yields rows at t=3,4 (full 2-lag history); 'b' has none
    assert(rows.toSeq == Seq(("a", 3L, 30L, 20L, 10L), ("a", 4L, 40L, 30L, 20L)))
    // requireFull=false keeps every row, nulls marking missing history
    val all = TimeSeries.supervisedLags(df, Seq("g"), "t", "y", 2,
      requireFull = false)
    assert(all.count() == 6)
    assert(all.where(col("lag_2").isNull).count() == 4)
  }

  test("olsTrend: exact line recovers slope with r2 = 1; constant y gives null r2") {
    val line = (0L until 50L).map(x => ("k", x, 3 * x + 5)).toDF("g", "x", "y")
    val fit = TimeSeries.olsTrend(line, Seq("g"), "x", "y").head()
    assert(fit.getAs[Long]("n") == 50L)
    assert(fit.getAs[Double]("slope") == 3.0)
    assert(fit.getAs[Double]("r2") == 1.0)
    val flat = (0L until 10L).map(x => ("k", x, 7L)).toDF("g", "x", "y")
    val f = TimeSeries.olsTrend(flat, Seq("g"), "x", "y").head()
    assert(f.getAs[Double]("slope") == 0.0)
    assert(f.isNullAt(f.fieldIndex("r2"))) // Syy = 0: quality undefined
    // constant x: slope undefined
    val vert = Seq(("k", 1L, 1L), ("k", 1L, 5L)).toDF("g", "x", "y")
    val v = TimeSeries.olsTrend(vert, Seq("g"), "x", "y").head()
    assert(v.isNullAt(v.fieldIndex("slope")))
  }

  test("olsTrend: noisy line keeps slope near truth, 0 < r2 < 1, per-group isolation") {
    val rows = (for { g <- Seq("up", "down"); x <- 0L until 40L } yield {
      val noise = math.floorMod(x * 2654435761L, 7L) - 3 // deterministic ±3
      (g, x, (if (g == "up") 10 * x else -10 * x) + noise)
    }).toDF("g", "x", "y")
    val fits = TimeSeries.olsTrend(rows, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(math.abs(fits("up")._1 - 10.0) < 0.1)
    assert(math.abs(fits("down")._1 + 10.0) < 0.1)
    assert(fits("up")._2 > 0.99 && fits("up")._2 < 1.0)
  }

  test("ewma rejects out-of-range terms") {
    intercept[IllegalArgumentException] {
      TimeSeries.ewmaPow2Bounded(obs, Seq("k"), "t", "v", terms = 63)
    }
  }

  test("cusum ≡ the textbook recursion on random deviations, per key") {
    val rnd = new scala.util.Random(5)
    val data = for (g <- Seq("a", "b"); t <- 1 to 60)
      yield (g, t.toLong, (rnd.nextInt(21) - 10).toLong) // deviations -10..10
    val (k, h) = (2L, 15L)
    // direct recursion ground truth
    val expect = data.groupBy(_._1).flatMap { case (g, rows) =>
      var (su, sd) = (0L, 0L)
      rows.sortBy(_._2).map { case (_, t, x) =>
        su = math.max(0L, su + x - k)
        sd = math.max(0L, sd - x - k)
        (g, t) -> ((su, sd))
      }
    }
    val got = TimeSeries.cusum(data.toDF("g", "t", "x").repartition(7),
        Seq("g"), "t", "x", driftK = k, threshold = h)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("cusum_up"), r.getAs[Long]("cusum_down")))).toMap
    assert(got == expect.toMap)
  }

  test("cusum flags a level shift upward, stays quiet in control") {
    // in-control ±1 noise for 30 steps, then a +5 shift
    val data = (1 to 50).map(t =>
      ("s", t.toLong, if (t <= 30) (if (t % 2 == 0) 1L else -1L) else 5L))
    val got = TimeSeries.cusum(data.toDF("g", "t", "x"), Seq("g"), "t", "x",
        driftK = 2L, threshold = 10L)
      .collect().map(r => r.getLong(1) -> r.getAs[Int]("flag_up")).toMap
    assert((1 to 30).forall(t => got(t.toLong) == 0), "false alarm in control")
    assert(got(50L) == 1, "shift never flagged")
    // first alarm lands shortly after the shift: (5-2)=3/step, h=10 → t=34
    assert(got(34L) == 1 && got(33L) == 0)
  }

  test("seasonalIndex: hand values, per-key isolation, zero-total null") {
    // key a: slot 0 mean 10, slot 1 mean 30 → overall 20 → indexes 0.5, 1.5
    val data = Seq(
      ("a", 0L, 10L), ("a", 0L, 10L), ("a", 1L, 30L), ("a", 1L, 30L),
      ("b", 0L, 5L), ("b", 1L, 5L),     // flat: index 1.0 both slots
      ("z", 0L, 0L), ("z", 1L, 0L))     // zero total: null index
    val got = TimeSeries.seasonalIndex(data.toDF("k", "slot", "v"),
        Seq("k"), "slot", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
    assert(got(("a", 0L)) == ((2L, 0.5)) && got(("a", 1L)) == ((2L, 1.5)))
    assert(got(("b", 0L)) == ((1L, 1.0)) && got(("b", 1L)) == ((1L, 1.0)))
    assert(got(("z", 0L)) == ((1L, null)) && got(("z", 1L)) == ((1L, null)))
  }

  test("rollingCorr ≡ per-frame Pearson computed by hand, per key") {
    val rnd = new scala.util.Random(3)
    val data = for (g <- Seq("a", "b"); t <- 1 to 30)
      yield (g, t.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong)
    val window = 5
    def pearson(xs: Seq[Long], ys: Seq[Long]): Option[Double] = {
      val n = xs.size.toDouble
      if (xs.size < 2) return None
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxy = xs.zip(ys).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val sxx = xs.map(a => a.toDouble * a.toDouble).sum
      val syy = ys.map(a => a.toDouble * a.toDouble).sum
      val (cxx, cyy, cxy) = (n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy)
      if (cxx > 0 && cyy > 0) Some(cxy / math.sqrt(cxx * cyy)) else None
    }
    val expect = data.groupBy(_._1).flatMap { case (g, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.indices.map { i =>
        val frame = sorted.slice(math.max(0, i - window + 1), i + 1)
        (g, sorted(i)._2) -> pearson(frame.map(_._3), frame.map(_._4))
      }
    }
    val got = TimeSeries.rollingCorr(data.toDF("g", "t", "x", "y").repartition(5),
        Seq("g"), "t", "x", "y", window)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(r.fieldIndex("rolling_corr"))) None
         else Some(r.getAs[Double]("rolling_corr")))).toMap
    expect.foreach { case (k, e) =>
      (got(k), e) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"$k: $a vs $b")
        case (a, b) => assert(a == b, s"$k: $a vs $b")
      }
    }
  }

  test("backtestSeasonalNaive: seasonal series scores far below naive (MASE << 1)") {
    // period-4 sawtooth: seasonal-lag forecast is EXACT, naive is not
    val data = for (g <- Seq("x"); t <- 1 to 40)
      yield (g, t.toLong, Seq(0L, 10L, 20L, 10L)(t % 4))
    val r = TimeSeries.backtestSeasonalNaive(data.toDF("g", "t", "v"),
      Seq("g"), "t", "v", season = 4).collect().head
    assert(r.getAs[Long]("n_scored") == 36) // 40 - season
    assert(r.getAs[Double]("mae_seasonal") == 0.0)
    assert(r.getAs[Double]("mae_naive") == 10.0)
    assert(r.getAs[Double]("mase") == 0.0)
    // anti-seasonal (alternating) series: season=4 ≡ lag-4 also exact…
    // use a drifting line instead: seasonal error 4×, naive 1× → MASE 4
    val line = (1 to 40).map(t => ("y", t.toLong, 10L * t))
    val r2 = TimeSeries.backtestSeasonalNaive(line.toDF("g", "t", "v"),
      Seq("g"), "t", "v", season = 4).collect().head
    assert(r2.getAs[Double]("mase") == 4.0)
  }

  test("rollingTrend: exact lines recover their slope in every full frame") {
    import spark.implicits._
    // two keys with different exact lines — per-key isolation included
    val rows = (1 to 30).map(t => ("a", t.toLong, 3L * t + 7)) ++
      (1 to 30).map(t => ("b", t.toLong, -5L * t + 100))
    val out = TimeSeries.rollingTrend(rows.toDF("g", "t", "v"),
      Seq("g"), "t", "v", window = 6)
    val slopes = out.where(col("rolling_n") >= 2)
      .select(col("g"), col("rolling_slope")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).distinct.toSeq).toMap
    assert(slopes("a") == Seq(3.0), slopes("a"))
    assert(slopes("b") == Seq(-5.0), slopes("b"))
    // the n = 1 head row has no trend
    assert(out.where(col("rolling_n") === 1 &&
      col("rolling_slope").isNotNull).isEmpty)
  }
}
