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

  /** [[fitQuantileBins]] via the mergeable approx_percentile sketch —
    * the 100 TB fit: codegen'd, partial-aggregated, no per-partition
    * value map (the EXACT Percentile aggregate materializes a count
    * map of every distinct value — measured 3.3 s on 600k near-distinct
    * doubles at sf0.1, and it only grows with scale). Same 1-row
    * `cuts` contract, so [[assignBins]]/[[assignBinsLit]] are fit-
    * implementation-agnostic. `accuracy` is Spark's inverse-error
    * knob (1/accuracy relative rank error).
    */
  def fitQuantileBinsApprox(df: DataFrame, valueCol: String, k: Int,
      accuracy: Int = 10000, statScale: Int = 6): DataFrame = {
    require(k >= 2, s"need k >= 2 bins; got $k")
    df.agg(transform(
      expr(s"approx_percentile($valueCol, array(${(1 until k).map(i => s"${i.toDouble / k}").mkString(",")}), $accuracy)"),
      c => round(c, statScale)).as("cuts"))
  }

  /** Assign `binCol` = number of cuts strictly below the value
    * (0-based, k bins). Null values get a null bin. `cuts` is the
    * 1-row frame from [[fitQuantileBins]], joined in as a broadcast —
    * the assignment is a fold over the array column. Plan-pure (zero
    * driver round-trips — PlanSpec pins zero added exchanges) but the
    * array fold is an INTERPRETED higher-order function; the hot path
    * at scale is [[assignBinsLit]].
    */
  def assignBins(df: DataFrame, valueCol: String, cuts: DataFrame,
      binCol: String = "bin"): DataFrame =
    df.crossJoin(broadcast(cuts))
      .withColumn(binCol,
        when(col(valueCol).isNotNull,
          aggregate(col("cuts"), lit(0),
            (acc, c) => acc + when(col(valueCol) > c, 1).otherwise(0))))
      .drop("cuts")

  /** The 1-row cuts frame collapsed to its array — k-1 doubles, the
    * bounded-stats collect the engine allows (the Lloyd-state /
    * vocabulary pattern); feeds [[assignBinsLit]].
    */
  def cutsOf(cuts: DataFrame): Seq[Double] =
    cuts.head().getSeq[Double](0)

  /** Codegen'd assignment against literal cut points: a chained
    * `when(v > c, 1)` sum that whole-stage-codegen compiles — no
    * interpreted lambda per row (the same reason SimHash64/VecDot are
    * compiled expressions). ≡ [[assignBins]] (spec-pinned); use this
    * form whenever the fit already ran.
    */
  def assignBinsLit(df: DataFrame, valueCol: String, cuts: Seq[Double],
      binCol: String = "bin"): DataFrame = {
    require(cuts.nonEmpty, "need at least one cut")
    val v = col(valueCol)
    val bin = cuts.map(c => when(v > lit(c), 1).otherwise(0))
      .reduce(_ + _)
    df.withColumn(binCol, when(v.isNotNull, bin))
  }
}
