package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlier handling for numeric feature columns — the clamping /
  * robust-scaling pass a training-data pipeline runs between ingest and
  * normalization (the reference's pipeline normalizes raw columns
  * directly, data.py:107-125; real corpus features need the tails tamed
  * first or min-max collapses the useful range onto a few outliers).
  *
  * Everything here is the two-job shape the engine uses for all fitted
  * transforms (see [[graft.car.Normalize]]): ONE aggregate pass computes
  * the per-group statistics (exact `percentile` — a sort-based aggregate
  * whose group state is bounded by group size; swap in
  * `approx_percentile` for groups that don't fit, the A14→A18 trade
  * documented in AggregateQueries), then the stats re-enter the plan as
  * a broadcast-joined stats table and the clamp itself is a pure
  * codegen'd projection. No driver loop, no per-column pass, no second
  * scan per statistic.
  */
object Outliers {

  /** Winsorize `valueCol` within each group: values below the group's
    * `lo` quantile clamp up to it, values above `hi` clamp down. Returns
    * the input columns plus `<valueCol>_w`. The stats side is
    * aggregate-sized (one row per group) — broadcast by construction;
    * with millions of groups drop the hint and the join degrades
    * gracefully to a shuffle on the group key.
    *
    * The fitted percentiles snap to `statScale` decimals before they
    * re-enter the plan — the same quantile-interpolation ulp discipline
    * as [[robustZScore]]: a clamp boundary an ulp apart across engines
    * flips a value that lands exactly on it, and the consumer's 4-dp
    * rounding then diverges. 6 dp is exact on ≤2-dp inputs.
    */
  def winsorize(df: DataFrame, valueCol: String, groupCols: Seq[String],
      lo: Double = 0.05, hi: Double = 0.95, statScale: Int = 6): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val gcols = groupCols.map(col)
    val stats = df.groupBy(gcols: _*).agg(
      round(expr(s"percentile($valueCol, $lo)"), statScale).as("__w_lo"),
      round(expr(s"percentile($valueCol, $hi)"), statScale).as("__w_hi"))
    df.join(broadcast(stats), groupCols)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__w_lo")), col("__w_hi")))
      .drop("__w_lo", "__w_hi")
  }

  /** [[winsorize]] for MANY columns in ONE aggregate pass: all 2k
    * percentiles come from a single groupBy (one shuffle of the input,
    * total), one broadcast stats join feeds every clamp, and each
    * `<col>_w` is a pure codegen'd projection. Calling the single-column
    * form per feature costs k full scans + k shuffles for identical
    * output — the difference between a feature-prep step that reads a
    * 100 TB table once and one that reads it per feature.
    */
  def winsorizeAll(df: DataFrame, valueCols: Seq[String],
      groupCols: Seq[String], lo: Double = 0.05, hi: Double = 0.95,
      statScale: Int = 6): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    require(valueCols.nonEmpty, "need at least one value column")
    val gcols = groupCols.map(col)
    val aggs = valueCols.flatMap(c => Seq(
      round(expr(s"percentile($c, $lo)"), statScale).as(s"__w_lo_$c"),
      round(expr(s"percentile($c, $hi)"), statScale).as(s"__w_hi_$c")))
    val stats = df.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
    valueCols.foldLeft(df.join(broadcast(stats), groupCols)) { (acc, c) =>
      acc.withColumn(s"${c}_w",
        least(greatest(col(c), col(s"__w_lo_$c")), col(s"__w_hi_$c")))
    }.drop(valueCols.flatMap(c => Seq(s"__w_lo_$c", s"__w_hi_$c")): _*)
  }

  /** Robust z-score: (x − median) / MAD within each group, the
    * outlier-insensitive alternative to [[graft.car.Normalize]]'s
    * mean/stddev z-score (one wild row moves a mean arbitrarily far; the
    * median moves by at most one rank). Two aggregate passes by
    * necessity — MAD is a quantile OF deviations from a quantile — each
    * the same broadcast-stats shape as [[winsorize]]. Groups whose MAD
    * is 0 (over half the values identical) fall back to scale 1 so the
    * column yields 0, not ±inf — the same constant-column rule
    * Normalize.fit applies.
    *
    * The fitted statistics are snapped to `statScale` decimal places
    * before they re-enter the plan. Quantile INTERPOLATION is the one
    * step whose floating-point expression differs across engines (and
    * could differ across Spark versions): `lower + (higher−lower)·frac`
    * vs `lower·(1−frac) + higher·frac` land an ulp apart, and the
    * division then amplifies that ulp past the consumer's rounding
    * boundary. The true interpolated value of ≤2-dp inputs has ≤4
    * decimal places, so a 6-dp snap is exact on the real statistic while
    * collapsing the expression-order noise — making the transform a pure
    * function of the data (stable across retries, engine swaps, and the
    * DuckDB oracle), same motive as [[graft.car.Splits.hashSplit]].
    */
  def robustZScore(df: DataFrame, valueCol: String, groupCols: Seq[String],
      out: String = "rz", statScale: Int = 6): DataFrame = {
    val gcols = groupCols.map(col)
    val med = df.groupBy(gcols: _*)
      .agg(round(expr(s"percentile($valueCol, 0.5)"), statScale).as("__med"))
    val dev = df.join(broadcast(med), groupCols)
      .withColumn("__adev", abs(col(valueCol) - col("__med")))
    val mad = dev.groupBy(gcols: _*)
      .agg(round(expr("percentile(__adev, 0.5)"), statScale).as("__mad"))
    dev.drop("__adev")
      .join(broadcast(mad), groupCols)
      .withColumn(out, (col(valueCol) - col("__med")) /
        when(col("__mad") === 0.0, lit(1.0)).otherwise(col("__mad")))
      .drop("__med", "__mad")
  }

  /** [[robustZScore]] for MANY columns in the SAME two aggregate
    * passes: one groupBy computes every column's median, one computes
    * every MAD-of-deviations, two broadcast joins feed all the
    * codegen'd `<col>_rz` projections. Per-column calls cost 2k scans +
    * 2k shuffles for identical output; MAD being a quantile OF
    * deviations from a quantile makes two passes the floor — this form
    * reaches it for any column count. Statistics snap to `statScale`
    * decimals for the same engine-portability reason as the
    * single-column form.
    */
  def robustZScoreAll(df: DataFrame, valueCols: Seq[String],
      groupCols: Seq[String], statScale: Int = 6): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    val gcols = groupCols.map(col)
    val medAggs = valueCols.map(c =>
      round(expr(s"percentile($c, 0.5)"), statScale).as(s"__med_$c"))
    val med = df.groupBy(gcols: _*).agg(medAggs.head, medAggs.tail: _*)
    val dev = valueCols.foldLeft(df.join(broadcast(med), groupCols)) { (acc, c) =>
      acc.withColumn(s"__adev_$c", abs(col(c) - col(s"__med_$c")))
    }
    val madAggs = valueCols.map(c =>
      round(expr(s"percentile(__adev_$c, 0.5)"), statScale).as(s"__mad_$c"))
    val mad = dev.groupBy(gcols: _*).agg(madAggs.head, madAggs.tail: _*)
    valueCols.foldLeft(
      dev.drop(valueCols.map(c => s"__adev_$c"): _*)
        .join(broadcast(mad), groupCols)) { (acc, c) =>
      acc.withColumn(s"${c}_rz", (col(c) - col(s"__med_$c")) /
        when(col(s"__mad_$c") === 0.0, lit(1.0)).otherwise(col(s"__mad_$c")))
    }.drop(valueCols.flatMap(c => Seq(s"__med_$c", s"__mad_$c")): _*)
  }
}
