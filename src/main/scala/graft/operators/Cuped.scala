package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et al.
  * WSDM'13) — the industry-standard variance-reduction estimator for
  * A/B tests: adjust each unit's metric by its pre-period covariate,
  * Y' = Y − θ(X − E[X]) with θ = cov(X,Y)/var(X), shrinking the
  * treatment-effect variance by the covariate's ρ² without biasing the
  * effect (θ is fit pooled, not per arm).
  *
  * Exactness contract: inputs are µ-scaled integer metric/covariate
  * columns; every sufficient statistic (Σx, Σy, Σx², Σxy, Σy², per-arm
  * Σ/n) accumulates as exact DECIMAL(38,0) integers — order-independent
  * across partitionings/engines — and the final θ/effect/ρ² are fixed
  * double expressions over those exact integers, so a SQL oracle
  * reproduces every output bit for bit at 4dp. Headroom: |µ-value| ≤
  * ~10⁹ and n ≤ ~10⁸ keep x²·n under DECIMAL(38,0).
  *
  * Scale shape: one aggregate over the unit frame + one 2-group
  * aggregate; nothing unit-sized ever reaches the driver.
  */
object Cuped {

  /** @param df      one row per experiment unit
    * @param armCol  two-valued arm label
    * @param metricCol µ-scaled integer outcome Y
    * @param covCol  µ-scaled integer pre-period covariate X
    * @param armA    treatment label (effect = A − B)
    * @param armB    control label
    * @return one row: (n_units, theta, effect_raw, effect_cuped,
    *         var_reduction) — effects in NATURAL units (µ ÷ 10⁶),
    *         var_reduction = ρ²(X,Y), all rounded
    */
  def effect(df: DataFrame, armCol: String, metricCol: String,
      covCol: String, armA: String, armB: String): DataFrame = {
    require(armA != armB, s"Cuped.effect: armA and armB are both '$armA'")
    val base = df.select(col(armCol).cast("string").as("__arm"),
      col(metricCol).cast("long").as("__y"), col(covCol).cast("long").as("__x"))
    val isA = col("__arm") === lit(armA)
    val isB = col("__arm") === lit(armB)
    def decSumIf(c: org.apache.spark.sql.Column, valueCol: String) =
      sum(when(c, col(valueCol).cast("decimal(38,0)")))
    // single conditional aggregation: pooled AND per-arm sufficient
    // statistics in one pass — no per-arm frames, no crossJoin, and the
    // empty-arm / stray-arm-value cases fail loudly instead of silently
    // producing an empty (or inflated-pooled-stats) result
    val g = base.agg(
      count(lit(1)).as("__n"),
      sum(expr("CAST(__x AS DECIMAL(38,0))")).as("__sx"),
      sum(expr("CAST(__y AS DECIMAL(38,0))")).as("__sy"),
      sum(expr("CAST(__x AS DECIMAL(38,0)) * __x")).as("__sxx"),
      sum(expr("CAST(__x AS DECIMAL(38,0)) * __y")).as("__sxy"),
      sum(expr("CAST(__y AS DECIMAL(38,0)) * __y")).as("__syy"),
      sum(when(isA, 1L).otherwise(0L)).as("__nA"),
      decSumIf(isA, "__x").as("__sxA"), decSumIf(isA, "__y").as("__syA"),
      sum(when(isB, 1L).otherwise(0L)).as("__nB"),
      decSumIf(isB, "__x").as("__sxB"), decSumIf(isB, "__y").as("__syB"),
      sum(when(!(isA || isB), 1L).otherwise(0L)).as("__nOther"))
      .withColumn("__n", when(
        col("__nA") === 0L || col("__nB") === 0L || col("__nOther") > 0L,
        raise_error(concat(
          lit(s"Cuped.effect: arm '$armA' has "), col("__nA"),
          lit(s" rows, arm '$armB' has "), col("__nB"),
          lit(" rows, other arm values: "), col("__nOther"),
          lit(" rows — both arms must be non-empty and the arm column " +
            "must contain exactly these two values"))).cast("long"))
        .otherwise(col("__n")))
    g
      // every operand below is an EXACT integer (decimal) — the doubles
      // are the same fixed expression tree on both engines
      .withColumn("__covn",
        expr("CAST(__sxy * __n - __sx * __sy AS DOUBLE)"))
      .withColumn("__varxn",
        expr("CAST(__sxx * __n - __sx * __sx AS DOUBLE)"))
      .withColumn("__varyn",
        expr("CAST(__syy * __n - __sy * __sy AS DOUBLE)"))
      .withColumn("__theta",
        expr("CASE WHEN __varxn = 0.0 THEN 0.0 ELSE __covn / __varxn END"))
      .withColumn("__dy", expr(
        "CAST(__syA AS DOUBLE) / __nA - CAST(__syB AS DOUBLE) / __nB"))
      .withColumn("__dx", expr(
        "CAST(__sxA AS DOUBLE) / __nA - CAST(__sxB AS DOUBLE) / __nB"))
      .select(col("__n").as("n_units"),
        round(col("__theta"), 6).as("theta"),
        round(col("__dy") / 1e6, 4).as("effect_raw"),
        round((col("__dy") - col("__theta") * col("__dx")) / 1e6, 4)
          .as("effect_cuped"),
        round(expr("""CASE WHEN __varxn = 0.0 OR __varyn = 0.0 THEN 0.0
          ELSE (__covn * __covn) / (__varxn * __varyn) END"""), 4)
          .as("var_reduction"))
  }
}
