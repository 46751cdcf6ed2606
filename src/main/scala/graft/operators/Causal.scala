package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Observational treatment-effect estimation by stratification — the
  * step past the A/B report ([[graft.queries.WarehouseQueries]]'s
  * `ab_experiment`) for when assignment was NOT randomized: exposure
  * correlates with a confounder (heavy users both click more and buy
  * more), so the naive treated-vs-control difference mixes the effect
  * with the confounding. Classic stratified adjustment (Cochran 1968):
  * estimate the effect inside each confounder stratum, then average the
  * per-stratum effects weighted by stratum size — identical to inverse
  * propensity weighting when the propensity model is saturated on the
  * strata.
  *
  * Determinism contract: outcomes and treatment are 0/1 integers, every
  * per-stratum effect is ONE integral division at ppm scale
  * (`(10⁶·(y₁n₀ − y₀n₁)) div (n₁n₀)`), and the overall estimate is one
  * more integral division of the size-weighted term sum — both engines
  * run identical integer ops, so the report hash-matches bit for bit.
  * Off-support strata (a single arm only) get a null effect and are
  * EXCLUDED from the weighted average, numerator and denominator alike —
  * the standard on-support restriction, visible in `n_on_support`.
  *
  * Scale shape: one hash aggregate to the strata table (strata-sized),
  * then driver-scale arithmetic; nothing shuffles twice and the wide
  * input is never sorted. Products widen to DECIMAL(38,0) — y·n terms
  * pass int64 at ~3·10⁹ rows per stratum, and the weighted sum at
  * ~10³¹ total rows.
  */
object Causal {

  private def strataAgg(df: DataFrame, strataCols: Seq[String],
      treatCol: String, outcomeCol: String): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    val t = col(treatCol).cast("long")
    val y = col(outcomeCol).cast("long")
    df.groupBy(strataCols.map(col): _*)
      .agg(sum(t).as("n_treat"),
        (count(lit(1)) - sum(t)).as("n_ctrl"),
        sum(t * y).as("y_treat"),
        sum((lit(1L) - t) * y).as("y_ctrl"))
  }

  private val ateTerm =
    """(1000000 * (CAST(y_treat AS DECIMAL(38,0)) * n_ctrl
       - CAST(y_ctrl AS DECIMAL(38,0)) * n_treat))
       div (CAST(n_treat AS DECIMAL(38,0)) * n_ctrl)"""

  /** Per-stratum effect table: treated/control sizes, outcome sums, and
    * the exact ppm risk difference — null where a stratum has only one
    * arm (no within-stratum comparison exists).
    *
    * @return (…strataCols, n_treat, n_ctrl, y_treat, y_ctrl, ate_ppm)
    */
  def strataEffects(df: DataFrame, strataCols: Seq[String],
      treatCol: String, outcomeCol: String): DataFrame =
    strataAgg(df, strataCols, treatCol, outcomeCol)
      .withColumn("ate_ppm",
        when(col("n_treat") > 0 && col("n_ctrl") > 0, expr(ateTerm)))

  /** The one-row adjusted summary: naive (unstratified) ppm risk
    * difference next to the stratified estimate — the gap between the
    * two columns IS the measured confounding.
    *
    * @return (n_total, n_on_support, n_strata, naive_ate_ppm, ate_ppm)
    */
  def stratifiedAte(df: DataFrame, strataCols: Seq[String],
      treatCol: String, outcomeCol: String): DataFrame = {
    val strata = strataEffects(df, strataCols, treatCol, outcomeCol)
    strata.agg(
      sum(col("n_treat") + col("n_ctrl")).as("n_total"),
      sum(when(col("ate_ppm").isNotNull, col("n_treat") + col("n_ctrl"))
        .otherwise(0L)).as("n_on_support"),
      count(lit(1)).as("n_strata"),
      sum(col("y_treat")).as("__y1"), sum(col("y_ctrl")).as("__y0"),
      sum(col("n_treat")).as("__n1"), sum(col("n_ctrl")).as("__n0"),
      sum(when(col("ate_ppm").isNotNull,
        expr("CAST(n_treat + n_ctrl AS DECIMAL(38,0)) * ate_ppm"))
        .otherwise(lit(java.math.BigDecimal.ZERO))).as("__wsum"))
      .select(col("n_total"), col("n_on_support"), col("n_strata"),
        when(col("__n1") > 0 && col("__n0") > 0,
          expr("""(1000000 * (CAST(__y1 AS DECIMAL(38,0)) * __n0
                  - CAST(__y0 AS DECIMAL(38,0)) * __n1))
                  div (CAST(__n1 AS DECIMAL(38,0)) * __n0)"""))
          .as("naive_ate_ppm"),
        when(col("n_on_support") > 0, expr("__wsum div n_on_support"))
          .as("ate_ppm"))
  }
}
