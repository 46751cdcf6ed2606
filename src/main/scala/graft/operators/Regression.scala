package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Closed-form least squares per group — the linear probe of the
  * feature-engineering report: two regressors + intercept fit by the
  * normal equations on CENTERED second moments, solved by Cramer's rule
  * (a 2×2 determinant — no iterative optimizer, no per-row state). One
  * pass, one hash aggregate; everything downstream is per-group scalar
  * arithmetic.
  *
  * Determinism contract (the [[graft.metrics.Scores.aucRoc]] split):
  * every data-sized reduction — n, Σy, Σx, Σx², Σxy — accumulates in
  * DECIMAL(38,0), so the moment table is EXACT and independent of
  * partition order (a double sum is not). The solve itself is a fixed
  * handful of IEEE double ops on those exact integers, written with the
  * same association order as the SQL oracle — deterministic cross-engine
  * because correctly-rounded integer→double conversion and double
  * mul/sub/div are bit-specified, unlike a data-length double
  * accumulation.
  *
  * Headroom: moment sums hold while n·max(x²·y⁰)… products stay under
  * 10³⁸ — with micro-scaled inputs ≤10⁷ that is ~10¹⁷ rows per group.
  * Callers pick integer units (cents, percent points) accordingly.
  *
  * Singular groups (det = 0: a constant regressor, or collinear x₁/x₂)
  * and groups with n < 3 return null coefficients — underdetermined is
  * visible, not invented.
  */
object Regression {

  /** y ≈ b0 + b1·x1 + b2·x2 per group; inputs must be integer-typed
    * (cast/scale first — exactness is the caller's unit choice).
    *
    * @return per group: (…groupCols, n, b0, b1, b2, r2) — doubles
    *         rounded at 6dp, null when singular
    */
  def ols2(df: DataFrame, groupCols: Seq[String], yCol: String,
      x1Col: String, x2Col: String): DataFrame = {
    require(groupCols.nonEmpty,
      "need at least one group column (pass a literal for a global fit)")
    val grp = groupCols.map(col)
    def dec(c: String) = s"CAST($c AS DECIMAL(38,0))"
    val m = df.select(grp ++ Seq(col(yCol).cast("long").as("__y"),
      col(x1Col).cast("long").as("__x1"),
      col(x2Col).cast("long").as("__x2")): _*)
      .groupBy(grp: _*)
      .agg(count(lit(1)).as("__n"),
        sum(expr(dec("__y"))).as("__sy"),
        sum(expr(dec("__x1"))).as("__s1"),
        sum(expr(dec("__x2"))).as("__s2"),
        sum(expr(s"${dec("__x1")} * __x1")).as("__s11"),
        sum(expr(s"${dec("__x2")} * __x2")).as("__s22"),
        sum(expr(s"${dec("__x1")} * __x2")).as("__s12"),
        sum(expr(s"${dec("__x1")} * __y")).as("__s1y"),
        sum(expr(s"${dec("__x2")} * __y")).as("__s2y"),
        sum(expr(s"${dec("__y")} * __y")).as("__syy"))
    // centered moments stay exact decimals; the solve is double
    val centered = m.select(grp ++ Seq(col("__n"), col("__sy"), col("__s1"),
      col("__s2"),
      expr("CAST(__n * __s11 - __s1 * __s1 AS DOUBLE)").as("__c11"),
      expr("CAST(__n * __s22 - __s2 * __s2 AS DOUBLE)").as("__c22"),
      expr("CAST(__n * __s12 - __s1 * __s2 AS DOUBLE)").as("__c12"),
      expr("CAST(__n * __s1y - __s1 * __sy AS DOUBLE)").as("__c1y"),
      expr("CAST(__n * __s2y - __s2 * __sy AS DOUBLE)").as("__c2y"),
      expr("CAST(__n * __syy - __sy * __sy AS DOUBLE)").as("__cyy")): _*)
    centered
      .withColumn("__det", expr("__c11 * __c22 - __c12 * __c12"))
      .withColumn("__b1", when(col("__n") >= 3 && col("__det") =!= 0.0,
        expr("(__c1y * __c22 - __c2y * __c12) / __det")))
      .withColumn("__b2", when(col("__n") >= 3 && col("__det") =!= 0.0,
        expr("(__c2y * __c11 - __c1y * __c12) / __det")))
      .select(grp ++ Seq(col("__n").as("n"),
        round(expr("""(CAST(__sy AS DOUBLE) - __b1 * CAST(__s1 AS DOUBLE)
          - __b2 * CAST(__s2 AS DOUBLE)) / CAST(__n AS DOUBLE)"""), 6)
          .as("b0"),
        round(col("__b1"), 6).as("b1"),
        round(col("__b2"), 6).as("b2"),
        when(col("__cyy") > 0.0,
          round(expr("(__b1 * __c1y + __b2 * __c2y) / __cyy"), 6))
          .as("r2")): _*)
  }
}
