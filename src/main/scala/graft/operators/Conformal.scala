package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (Vovk et al.; the
  * distribution-free wrapper any point model can wear): on a held-out
  * CALIBRATION set, take the k-th smallest absolute residual with
  * k = ⌈(n+1)·(1−α)⌉ — then `pred ± q̂` on fresh rows covers the truth
  * with probability ≥ 1−α, no matter what the model is. The audit half
  * applies q̂ back to a TEST set and reports the empirical coverage,
  * closing the loop ("is the guarantee holding on this data?").
  *
  * Everything is exact integer arithmetic on micro-unit columns: the
  * order statistic is a per-group rank selection (k-th row of the
  * residual order, id-free — equal residuals are interchangeable at a
  * rank boundary), coverage is a count ratio in ppm via integral
  * divide — so the report hash-matches a SQL oracle bit for bit, the
  * md5-gate discipline applied to uncertainty quantification.
  *
  * Scale shape: one residual projection per side, ONE window
  * PARTITIONED by group over the calibration side (never
  * partitionless), a group-keyed broadcast-size join of q̂ onto the
  * test side, one final aggregate. Calibration sets are sample-sized
  * by construction; the test side only ever pays a scan + a
  * groups-sized broadcast join.
  */
object Conformal {

  /** Per-group split-conformal audit. `yCol`/`predCol` must be exact
    * integer (micro-unit) columns; `alphaPct` is the miscoverage level
    * in percent (10 → 90 % target coverage).
    *
    * When ⌈(n+1)(1−α)⌉ > n (calibration set too small for the level),
    * q̂ is NULL — the honest "interval is infinite" answer — and the
    * group's test rows count as covered, exactly as the theory says.
    *
    * @return per group: (…groupCols, n_calib, qhat, n_test, covered,
    *         coverage_ppm), coverage_ppm exact
    */
  def splitConformal(calib: DataFrame, test: DataFrame,
      groupCols: Seq[String], yCol: String, predCol: String,
      alphaPct: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(alphaPct >= 1 && alphaPct <= 99,
      s"alphaPct must be in [1, 99]; got $alphaPct")
    import org.apache.spark.sql.expressions.Window
    val grp = groupCols.map(col)
    def resid(df: DataFrame): DataFrame = df.select(
      grp :+ abs(col(yCol).cast("long") - col(predCol).cast("long"))
        .as("__r"): _*)
    val w = Window.partitionBy(grp: _*)
      .orderBy(col("__r"))
    val ranked = resid(calib)
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(grp: _*)))
    // k = ceil((n+1)(100-alpha)/100) in pure integers: (a + 99) div 100
    // (div truncates; the +99 makes that a ceiling for positive a)
    val k = expr(s"((__n + 1) * ${100 - alphaPct} + 99) div 100")
    val qhat = ranked.where(col("__rk") === k)
      .select(grp :+ col("__n").as("n_calib") :+ col("__r").as("qhat"): _*)
    // groups whose calibration is too small for the level (k > n) have
    // no rank-k row: recover them with their size and a null qhat
    val sizes = resid(calib).groupBy(grp: _*)
      .agg(count(lit(1)).as("__nc"))
    val perGroup = sizes.join(qhat, groupCols, "left")
      .select(grp :+ coalesce(col("n_calib"), col("__nc")).as("n_calib")
        :+ col("qhat"): _*)
    resid(test)
      .join(broadcast(perGroup), groupCols, "inner")
      .groupBy(grp: _*)
      .agg(first(col("n_calib")).as("n_calib"),
        first(col("qhat")).as("qhat"),
        count(lit(1)).as("n_test"),
        sum(when(col("qhat").isNull || col("__r") <= col("qhat"), 1L)
          .otherwise(0L)).as("covered"))
      .select(grp ++ Seq(col("n_calib"), col("qhat"), col("n_test"),
        col("covered"),
        expr("(1000000 * covered) div n_test").as("coverage_ppm")): _*)
  }
}
