package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wald sequential probability ratio test — the always-peeking
  * experiment monitor: as samples arrive, the cumulative log-likelihood
  * ratio of the design alternative p₁ against the null p₀ walks until
  * it crosses ±ln((1−β)/α); unlike a fixed-horizon test the analyst
  * may look after EVERY sample with the error rates intact.
  *
  * Determinism: arrival/conversion cumulative counts are exact integers
  * (one group-partitioned window over the hours table); the only reals
  * are the two ln design constants, multiplied by exact counts and
  * SNAPPED to DECIMAL(20,8) (the text_entropy libm rule). The ratio
  * arguments are CAST-to-DOUBLE explicitly — Spark parses a bare
  * `0.5 / 0.4` literal as scale-truncating DECIMAL division where
  * other engines do not (the round-13 lesson an oracle mismatch
  * taught).
  */
object Sprt {

  /** Per-group cumulative SPRT curve over pre-aggregated arrivals.
    *
    * @param byHour (groupCol, hourCol, n, c) — arrivals and conversions
    *               per period, ONE row per (group, period)
    * @param p0 null conversion rate, p1 design alternative (0 < p < 1)
    * @param bound decision bound ln((1−β)/α), e.g. ln 19 for α = β = .05
    * @return (…group, hour, n_cum, conv_cum, llr, decision)
    */
  def curve(byHour: DataFrame, groupCol: String, hourCol: String,
      p0: Double, p1: Double, bound: Double): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      s"need distinct rates in (0,1); got p0=$p0 p1=$p1")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(hourCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    byHour
      .withColumn("n_cum", sum(col("n")).over(w))
      .withColumn("conv_cum", sum(col("c")).over(w))
      .withColumn("__llr",
        expr(s"""CAST(CAST(conv_cum AS DOUBLE)
                 * ln(CAST($p1 AS DOUBLE) / CAST($p0 AS DOUBLE))
                 AS DECIMAL(20,8))""") +
        expr(s"""CAST(CAST(n_cum - conv_cum AS DOUBLE)
                 * ln(CAST(${1 - p1} AS DOUBLE) / CAST(${1 - p0} AS DOUBLE))
                 AS DECIMAL(20,8))"""))
      .select(col(groupCol), col(hourCol), col("n_cum"), col("conv_cum"),
        round(col("__llr").cast("double"), 4).as("llr"),
        when(col("__llr") >= bound, "reject_h0")
          .when(col("__llr") <= -bound, "accept_h0")
          .otherwise("continue").as("decision"))
  }
}
