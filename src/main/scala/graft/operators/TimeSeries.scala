package graft.operators

import org.apache.spark.sql.DataFrame
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
