package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta-method inference for RATIO metrics (revenue per session,
  * clicks per view — the metrics whose denominator is itself random):
  * naive per-user averaging biases the estimate and a t-test on
  * per-user ratios is wrong for users with different exposure; the
  * standard treatment (Deng et al., the online-experimentation
  * canon) analyzes R = ΣY/ΣX per arm with the first-order Taylor
  * variance
  *
  * {{{ Var(R) ≈ (s_y² − 2R·s_xy + R²·s_x²) / (n·x̄²) }}}
  *
  * over per-UNIT (user) totals, then a two-sample z on the arm
  * difference.
  *
  * Determinism: all six moments per arm (n, ΣX, ΣY, ΣX², ΣY², ΣXY)
  * accumulate in DECIMAL(38,0) — exact, partition-order-proof — and
  * the ratio/variance/z are a fixed IEEE double sequence over them,
  * shared verbatim with the SQL oracle (the [[Regression]] contract).
  * Headroom: micro-scaled Y ≤ 10⁷ holds the moment sums to ~10¹⁷ rows.
  *
  * @param unitCols the randomization unit key (user)
  * @param armCol 0/1 integer arm
  * @return one row: (n_a, n_b, ratio_a, ratio_b, diff, se_diff, z) —
  *         doubles at 6dp, null when either arm lacks 2 units or has
  *         a zero denominator
  */
object RatioMetric {

  def ratioDelta(df: DataFrame, armCol: String, yCol: String,
      xCol: String): DataFrame = {
    def dec(c: String) = s"CAST($c AS DECIMAL(38,0))"
    val m = df.select(col(armCol).cast("long").as("__arm"),
        col(yCol).cast("long").as("__y"), col(xCol).cast("long").as("__x"))
      .groupBy(col("__arm"))
      .agg(count(lit(1)).as("__n"),
        sum(expr(dec("__y"))).as("__sy"), sum(expr(dec("__x"))).as("__sx"),
        sum(expr(s"${dec("__y")} * __y")).as("__syy"),
        sum(expr(s"${dec("__x")} * __x")).as("__sxx"),
        sum(expr(s"${dec("__x")} * __y")).as("__sxy"))
      // per-arm stats as doubles over the exact moments
      .withColumn("__ok", col("__n") >= 2 && col("__sx") > 0)
      .withColumn("__r", when(col("__ok"),
        expr("CAST(__sy AS DOUBLE) / CAST(__sx AS DOUBLE)")))
      .withColumn("__v", when(col("__ok"), expr(
        """((CAST(__n * __syy - __sy * __sy AS DOUBLE)
            - 2.0 * (CAST(__sy AS DOUBLE) / CAST(__sx AS DOUBLE))
              * CAST(__n * __sxy - __sx * __sy AS DOUBLE)
            + (CAST(__sy AS DOUBLE) / CAST(__sx AS DOUBLE))
              * (CAST(__sy AS DOUBLE) / CAST(__sx AS DOUBLE))
              * CAST(__n * __sxx - __sx * __sx AS DOUBLE))
           / (CAST(__n AS DOUBLE) * CAST(__n - 1 AS DOUBLE)))
           / (CAST(__n AS DOUBLE)
              * (CAST(__sx AS DOUBLE) / CAST(__n AS DOUBLE))
              * (CAST(__sx AS DOUBLE) / CAST(__n AS DOUBLE)))""")))
    val a = m.where(col("__arm") === 0).select(col("__n").as("n_a"),
      col("__r").as("__ra"), col("__v").as("__va"))
    val b = m.where(col("__arm") === 1).select(col("__n").as("n_b"),
      col("__r").as("__rb"), col("__v").as("__vb"))
    a.crossJoin(b)
      .select(col("n_a"), col("n_b"),
        round(col("__ra"), 6).as("ratio_a"),
        round(col("__rb"), 6).as("ratio_b"),
        round(expr("__rb - __ra"), 6).as("diff"),
        round(expr("sqrt(__va + __vb)"), 6).as("se_diff"),
        when(expr("__va + __vb") > 0.0,
          round(expr("(__rb - __ra) / sqrt(__va + __vb)"), 4)).as("z"))
  }
}
