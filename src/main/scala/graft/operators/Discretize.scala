package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equal-frequency (quantile) discretization — fit k-1 percentile cut
  * points in ONE aggregate pass, then assign bins with pure column
  * math against the broadcast cut array. The feature-binning step a
  * training pipeline runs ahead of histogram-based learners and
  * monotone-feature audits (the reference's 40-bin histogram sweep,
  * `utils.py` plotting, is the fixed-width cousin — `a12_histogram`).
  *
  * Scale shape: the fit is a single `percentile(col, array(...))`
  * aggregate (one shuffle, k-1 cuts in one pass — NOT k separate
  * quantile jobs); the apply is `aggregate(cuts, ...)` over a
  * broadcast 1-row cut frame — zero additional shuffles, stays inside
  * whole-stage codegen, and at 100 TB the swap-in for the fit is
  * `approx_percentile` with the same cut-array contract.
  *
  * Exactness discipline (the a19/a20 rule): cuts snap to `statScale`
  * decimals so cross-engine quantile-interpolation ulp noise cannot
  * flip a boundary comparison; the bin rule is strictly
  * `value > cut` (a value equal to a cut belongs to the LOWER bin),
  * mirrored verbatim in the DuckDB oracle.
  */
object Discretize {

  /** One row holding the sorted cut array: `cuts array<double>` of
    * length k-1 (the i/k percentiles, i = 1..k-1), snapped to
    * `statScale` decimals.
    */
  def fitQuantileBins(df: DataFrame, valueCol: String, k: Int,
      statScale: Int = 6): DataFrame = {
    require(k >= 2, s"need k >= 2 bins; got $k")
    df.agg(transform(
      expr(s"percentile($valueCol, array(${(1 until k).map(i => s"${i.toDouble / k}").mkString(",")}))"),
      c => round(c, statScale)).as("cuts"))
  }

  /** Assign `binCol` = number of cuts strictly below the value
    * (0-based, k bins). Null values get a null bin. `cuts` is the
    * 1-row frame from [[fitQuantileBins]], joined in as a broadcast —
    * the assignment itself is a codegen'd fold over the array.
    */
  def assignBins(df: DataFrame, valueCol: String, cuts: DataFrame,
      binCol: String = "bin"): DataFrame =
    df.crossJoin(broadcast(cuts))
      .withColumn(binCol,
        when(col(valueCol).isNotNull,
          aggregate(col("cuts"), lit(0),
            (acc, c) => acc + when(col(valueCol) > c, 1).otherwise(0))))
      .drop("cuts")
}
