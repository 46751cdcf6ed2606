package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair: per-key gap fill with linear
  * interpolation — the panel-data prep the reference does per entity
  * with pandas reindex/interpolate (analysis.py's monthly price
  * series), here as one distributed plan.
  *
  * Spark shape: the dense grid comes from `sequence()` + `explode`
  * inside executors (rows ∝ span, no driver loop), the
  * forward/backward neighbor lookup is two per-key windows with
  * `ignoreNulls` — state per group, never global. At 100 TB the cost
  * is the grid explode (linear in the filled output) plus one shuffle
  * on the key, which is the floor for any per-key resample.
  */
object TimeSeries {

  /** Fill every integer slot in `[min(slot), max(slot)]` per key;
    * missing slots get the linear interpolation between the nearest
    * observed neighbors (ends are always observed by construction, so
    * no extrapolation arm is needed).
    *
    * @param df   observed points, ONE row per (key, slot)
    * @param integral interpolate in integer arithmetic (`div`) instead
    *        of float division — for fixed-point value columns (e.g.
    *        µ-unit longs), making the fill bit-exact across engines,
    *        partitionings, and retries (the same discipline as
    *        PageRank's integer fixed-point)
    * @return (key, slot, value, interpolated) — `value` is the observed
    *         or interpolated reading, `interpolated` marks filled rows
    */
  def gapFillLinear(df: DataFrame, keyCol: String, slotCol: String,
      valCol: String, integral: Boolean = false): DataFrame = {
    val span = df.groupBy(col(keyCol))
      .agg(min(col(slotCol)).as("__lo"), max(col(slotCol)).as("__hi"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"))).as(slotCol))
    val joined = grid.join(
      df.select(col(keyCol), col(slotCol), col(valCol).as("__obs")),
      Seq(keyCol, slotCol), "left")
    val asc = Window.partitionBy(col(keyCol)).orderBy(col(slotCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.partitionBy(col(keyCol)).orderBy(col(slotCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined
      .withColumn("__pv", last(col("__obs"), ignoreNulls = true).over(asc))
      .withColumn("__ps",
        last(when(col("__obs").isNotNull, col(slotCol)), ignoreNulls = true).over(asc))
      .withColumn("__nv", first(col("__obs"), ignoreNulls = true).over(desc))
      .withColumn("__ns",
        first(when(col("__obs").isNotNull, col(slotCol)), ignoreNulls = true).over(desc))
      .select(col(keyCol), col(slotCol),
        when(col("__obs").isNotNull, col("__obs"))
          .otherwise(
            if (integral)
              col("__pv") + expr(s"((__nv - __pv) * ($slotCol - __ps)) div (__ns - __ps)")
            else
              col("__pv") + (col("__nv") - col("__pv")) *
                (col(slotCol) - col("__ps")) / (col("__ns") - col("__ps")))
          .as(valCol),
        col("__obs").isNull.as("interpolated"))
  }

  /** Bounded exponentially-weighted moving average with α = 1/2 over
    * the last `terms` observations per key — trend smoothing in exact
    * integer arithmetic. Weights are the powers of two
    * 2^(terms-1-k) for lag k, so with a fixed-point (µ-unit long)
    * value column both the weighted numerator and the
    * present-weight denominator are exact int64 sums — bit-identical
    * across engines, partitionings, and retries, and replayable by a
    * SQL oracle as `terms` unrolled `lag()` reads (the same
    * fixed-point discipline as [[gapFillLinear]]'s `integral` mode and
    * PageRank).
    *
    * Series starts normalize by the weights actually present (pandas
    * `ewm(adjust=True)` semantics), so the first row's EWMA is the
    * observation itself. Row-wise over the observation sequence —
    * resample to a regular grid first (e.g. hourly sums) if spacing
    * matters. One per-key window partition; lag depth is `terms`
    * compiled column reads, not an iteration.
    *
    * @param valCol integral (fixed-point) column
    * @return df + `ewmaNumCol` (Σ value·2^(terms-1-k)) and
    *         `ewmaDenCol` (Σ present 2^(terms-1-k)); the caller
    *         finishes with num/den at its output scale
    */
  /** Supervised lag-feature examples: each observation becomes a
    * training row carrying its previous `lags` values as features —
    * the standard autoregressive windowing that turns a series into
    * (X, y) pairs for a forecaster. One per-key window partition; the
    * lag depth is `lags` compiled column reads (no self-joins, no
    * explode). Rows whose history window is incomplete are DROPPED
    * (`requireFull = true`, the default — a padded/null feature row
    * poisons most trainers silently) or kept with nulls otherwise.
    */
  def supervisedLags(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valCol: String, lags: Int, requireFull: Boolean = true): DataFrame = {
    require(lags >= 1, s"need lags >= 1; got $lags")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val out = (1 to lags).foldLeft(df) { (acc, k) =>
      acc.withColumn(s"lag_$k", lag(col(valCol), k).over(w))
    }
    if (requireFull) out.where(col(s"lag_$lags").isNotNull) else out
  }

  /** Per-key closed-form OLS trend — slope, intercept-free fit
    * quality (r²), and point count for every key in ONE aggregate
    * pass (the grouped-regression shape: k keys ≠ k fits).
    *
    * Every sum (Σx, Σy, Σxy, Σx², Σy²) accumulates as exact
    * DECIMAL(38,0) over INTEGRAL x and y — order/partition-invariant
    * and engine-reproducible, with the final slope/r² the only double
    * arithmetic (on identical exact inputs → identical doubles; no
    * round() applied, so no half-way ties either). Shift x per key
    * before calling (e.g. hours since the key's first observation) to
    * keep x moments small; y in fixed-point µ-units per the house
    * discipline.
    *
    * r² is null when y is constant (Syy = 0 — fit quality undefined;
    * a double 0/0 would be engine-dependent NaN traffic), slope null
    * when x is constant.
    */
  def olsTrend(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    // 19-digit factors multiply into an EXACT decimal(38,0) product —
    // no precision cap in either engine (DuckDB's HUGEINT mirror tops
    // out at the same 38 digits)
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val x = col(xCol).cast(dec19)
    val y = col(yCol).cast(dec19)
    val g = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"),
        sum(x * x).as("__sxx"),
        sum(y * y).as("__syy"))
    // centered second moments combine in DOUBLE over the exact decimal
    // sums (each converted once) — decimal products of near-38-digit
    // moments would overflow the decimal domain, and identical double
    // ops on identical inputs stay engine-reproducible
    def d(c: String) = col(c).cast("double")
    val n = col("n").cast("double")
    val sxxC = n * d("__sxx") - d("__sx") * d("__sx")
    val syyC = n * d("__syy") - d("__sy") * d("__sy")
    val sxyC = n * d("__sxy") - d("__sx") * d("__sy")
    g.select(keyCols.map(col) ++ Seq(
      col("n"),
      when(sxxC > 0, sxyC / sxxC).as("slope"),
      when(sxxC > 0 && syyC > 0, sxyC * sxyC / (sxxC * syyC)).as("r2")): _*)
  }

  /** Two-sided CUSUM drift scores per key — the classic
    * changepoint/level-shift detector (Page 1954), exactly windowed:
    * the textbook recursion S⁺ₜ = max(0, S⁺ₜ₋₁ + xₜ − k) has the
    * closed form S⁺ₜ = Pₜ − min_{j≤t} Pⱼ with Pₜ = Σ_{i≤t}(xᵢ − k)
    * (and symmetrically S⁻ₜ = max_{j≤t} P'ⱼ − P'ₜ over P' = Σ(xᵢ+k)),
    * so the "inherently sequential" statistic becomes TWO stacked
    * window passes — a running sum, then a running min/max over it —
    * sharing one partition sort. Integer-exact end to end on µ-int
    * inputs: no recursion, no floats, identical on any engine,
    * partitioning, or retry.
    *
    * Pass DEVIATIONS from the in-control level as `valCol` (x − µ₀ in
    * µ-units): cusum_up accumulates runs above +k, cusum_down runs
    * below −k, exactly the textbook two-sided chart.
    *
    * @param driftK    per-step drift allowance k (µ-units): shifts
    *                  smaller than k never accumulate
    * @param threshold alarm level h (µ-units) for the flag columns
    * @return input + (cusum_up, cusum_down, flag_up, flag_down)
    */
  def cusum(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valCol: String, driftK: Long, threshold: Long): DataFrame = {
    require(driftK >= 0 && threshold > 0,
      s"need driftK >= 0, threshold > 0; got k=$driftK h=$threshold")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__p_up", sum(col(valCol) - lit(driftK)).over(w))
      .withColumn("__p_dn", sum(col(valCol) + lit(driftK)).over(w))
      // least/greatest with 0: the closed form's min/max ranges over
      // j = 0..t including the EMPTY prefix P₀ = 0 — dropping it
      // understates S whenever every prefix sum is positive (resp.
      // negative)
      .withColumn("cusum_up",
        col("__p_up") - least(min(col("__p_up")).over(w), lit(0L)))
      .withColumn("cusum_down",
        greatest(max(col("__p_dn")).over(w), lit(0L)) - col("__p_dn"))
      .withColumn("flag_up", (col("cusum_up") > threshold).cast("int"))
      .withColumn("flag_down", (col("cusum_down") > threshold).cast("int"))
      .drop("__p_up", "__p_dn")
  }

  /** Multiplicative seasonal index per (key, season slot): the slot's
    * mean over the key's overall mean — the classical decomposition
    * read ("hour 9 runs at 1.4× the daily average") and the
    * seasonal-adjustment factor for [[backtestSeasonalNaive]]'s
    * forecasts. Two small aggregates (slot cells, then per-key totals
    * DERIVED from the cells — the data is scanned once); the index is
    * the only double math, computed from exact integer sums with an
    * identical expression on any engine (the olsTrend discipline).
    *
    * @return (…keyCols, slot, n_slot, seasonal_index) — index null
    *         for a key whose overall sum is 0
    */
  def seasonalIndex(df: DataFrame, keyCols: Seq[String], slotCol: String,
      valCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val grp = keyCols.map(col)
    val cells = df.groupBy(grp :+ col(slotCol).as("slot"): _*)
      .agg(sum(col(valCol).cast(dec)).as("__ss"), count(lit(1)).as("__sn"))
    val totals = cells.groupBy(grp: _*)
      .agg(sum(col("__ss")).as("__ts"), sum(col("__sn")).as("__tn"))
    def d(c: String) = col(c).cast("double")
    cells.join(totals, keyCols)
      .select(grp ++ Seq(col("slot"), col("__sn").as("n_slot"),
        when(col("__ts") =!= 0,
          (d("__ss") * d("__tn")) / (d("__sn") * d("__ts")))
          .as("seasonal_index")): _*)
  }

  /** Rolling Pearson correlation of two integer-valued series per key
    * over a trailing row frame — "are these two signals still moving
    * together?" as a continuous monitor (regime detection, feature
    * stability). The [[olsTrend]] discipline applied to window frames:
    * all five moments accumulate as exact DECIMAL window sums over the
    * frame (order/partition-invariant), the closed-form corr is the
    * only double math. One window pass, every moment sharing the one
    * partition sort; frame state is five numbers regardless of window
    * width.
    *
    * @param window trailing row count (current row inclusive)
    * @return input + rolling_n + rolling_corr (null until the frame
    *         has ≥2 rows or while either series is frame-constant)
    */
  def rollingCorr(df: DataFrame, keyCols: Seq[String], orderCol: String,
      xCol: String, yCol: String, window: Int): DataFrame = {
    require(window >= 2, s"need window >= 2; got $window")
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val x = col(xCol).cast(dec19)
    val y = col(yCol).cast(dec19)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    def d(c: Column) = c.cast("double")
    val out = df
      .withColumn("rolling_n", count(lit(1)).over(w))
      .withColumn("__sx", sum(x).over(w)).withColumn("__sy", sum(y).over(w))
      .withColumn("__sxy", sum(x * y).over(w))
      .withColumn("__sxx", sum(x * x).over(w))
      .withColumn("__syy", sum(y * y).over(w))
    val n = d(col("rolling_n"))
    val cmxx = n * d(col("__sxx")) - d(col("__sx")) * d(col("__sx"))
    val cmyy = n * d(col("__syy")) - d(col("__sy")) * d(col("__sy"))
    val cmxy = n * d(col("__sxy")) - d(col("__sx")) * d(col("__sy"))
    out.withColumn("rolling_corr",
        when(col("rolling_n") >= 2 && cmxx > 0 && cmyy > 0,
          cmxy / sqrt(cmxx * cmyy)))
      .drop("__sx", "__sy", "__sxy", "__sxx", "__syy")
  }

  /** Rolling OLS slope per key — [[olsTrend]]'s closed form evaluated
    * over a trailing frame (the local-trend probe: where is the series
    * accelerating RIGHT NOW, vs the whole-history fit). Same
    * discipline as [[rollingCorr]]: the four moments are exact-decimal
    * window sums sharing ONE partition sort; doubles appear only in
    * the closed-form finish on identical exact inputs.
    */
  def rollingTrend(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String, window: Int): DataFrame = {
    require(window >= 2, s"need window >= 2; got $window")
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val x = col(orderCol).cast(dec19)
    val y = col(valueCol).cast(dec19)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    def d(c: Column) = c.cast("double")
    val out = df
      .withColumn("rolling_n", count(lit(1)).over(w))
      .withColumn("__sx", sum(x).over(w)).withColumn("__sy", sum(y).over(w))
      .withColumn("__sxy", sum(x * y).over(w))
      .withColumn("__sxx", sum(x * x).over(w))
    val n = d(col("rolling_n"))
    val den = n * d(col("__sxx")) - d(col("__sx")) * d(col("__sx"))
    val num = n * d(col("__sxy")) - d(col("__sx")) * d(col("__sy"))
    out.withColumn("rolling_slope",
        when(col("rolling_n") >= 2 && den > 0, num / den))
      .drop("__sx", "__sy", "__sxy", "__sxx")
  }

  /** Seasonal-naive forecast backtest per key: MAE of the
    * season-lag forecast (x̂ₜ = xₜ₋ₛ) against MAE of the one-step
    * naive (x̂ₜ = xₜ₋₁), i.e. MASE's in-sample form — the sanity
    * gate before shipping any fancier forecaster. Errors are exact
    * integer |diffs| on µ-int values summed as DECIMAL; only rows
    * where BOTH forecasts exist score, so the two MAEs share a
    * denominator and the ratio is scale-free. One window pass (two
    * compiled lag reads), one aggregate.
    *
    * @return (…keyCols, n_scored, mae_seasonal, mae_naive, mase)
    *         with mase null when the naive MAE is 0
    */
  def backtestSeasonalNaive(df: DataFrame, keyCols: Seq[String],
      orderCol: String, valCol: String, season: Int): DataFrame = {
    require(season >= 2, s"need season >= 2; got $season")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val scored = df
      .withColumn("__fs", lag(col(valCol), season).over(w))
      .withColumn("__fn", lag(col(valCol), 1).over(w))
      .where(col("__fs").isNotNull && col("__fn").isNotNull)
    scored.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_scored"),
        sum(abs(col(valCol) - col("__fs")).cast(dec)).as("__es"),
        sum(abs(col(valCol) - col("__fn")).cast(dec)).as("__en"))
      .select(keyCols.map(col) ++ Seq(
        col("n_scored"),
        (col("__es").cast("double") / col("n_scored").cast("double"))
          .as("mae_seasonal"),
        (col("__en").cast("double") / col("n_scored").cast("double"))
          .as("mae_naive"),
        when(col("__en") > 0,
          col("__es").cast("double") / col("__en").cast("double"))
          .as("mase")): _*)
  }

  def ewmaPow2Bounded(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valCol: String, terms: Int = 8,
      ewmaNumCol: String = "ewma_num", ewmaDenCol: String = "ewma_den"): DataFrame = {
    require(terms >= 1 && terms <= 62,
      s"terms must be in [1, 62] (weights are 2^(terms-1-k)); got $terms")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val lagged = (0 until terms).map { k =>
      (lag(col(valCol), k).over(w), 1L << (terms - 1 - k))
    }
    df.withColumn(ewmaNumCol,
        lagged.map { case (v, wt) => coalesce(v * lit(wt), lit(0L)) }
          .reduce(_ + _))
      .withColumn(ewmaDenCol,
        lagged.map { case (v, wt) =>
          when(v.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _))
  }
}
