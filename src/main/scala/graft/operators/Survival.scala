package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-sample log-rank test (Mantel-Cox) — the significance half of the
  * survival family: `survival_km` draws each cohort's curve, the
  * log-rank statistic says whether the two curves DIFFER beyond chance,
  * comparing observed vs hypergeometric-expected events in group 1 at
  * every event time:
  *
  * {{{ χ² = (Σ_t (d₁ₜ − dₜ·n₁ₜ/nₜ))² / Σ_t Vₜ,
  *     Vₜ = dₜ·(n₁ₜ/nₜ)·(1 − n₁ₜ/nₜ)·(nₜ − dₜ)/(nₜ − 1) }}}
  *
  * Scale shape: data-sized work is ONE (group, time) aggregate; at-risk
  * counts come from cumulative ender totals over the TIMES table (two
  * [[PrefixSum.withRunningTotal]] passes — the Drift discipline, never a
  * partitionless window), and every per-time term is a fixed IEEE double
  * expression over exact integers SNAPPED to DECIMAL(20,8) before the
  * sum (the text_entropy libm rule), so the one-row report hash-matches
  * a SQL oracle.
  *
  * Ties: subjects censored AT an event time count as at risk for it
  * (both end-types share the time bucket — the convention this
  * engine's `survival_km` uses; state it when comparing to tools that
  * censor-after-events).
  */
object Survival {

  /** @param groupCol 0/1 integer column (the two cohorts)
    * @param eventCol 1 = event, 0 = censored
    * @return one row: (n_event_times, n_obs_g1, obs_minus_exp, variance,
    *         chi2) — doubles at 4dp
    */
  def logRank(df: DataFrame, groupCol: String, timeCol: String,
      eventCol: String): DataFrame = {
    val byT = df.select(col(groupCol).cast("long").as("__g"),
        col(timeCol).cast("long").as("t"),
        col(eventCol).cast("long").as("__e"))
      .groupBy(col("t"))
      .agg(sum(when(col("__g") === 0, 1L).otherwise(0L)).as("end0"),
        sum(when(col("__g") === 1, 1L).otherwise(0L)).as("end1"),
        sum(when(col("__g") === 0, col("__e")).otherwise(0L)).as("ev0"),
        sum(when(col("__g") === 1, col("__e")).otherwise(0L)).as("ev1"))
    val cum = PrefixSum.withRunningTotal(
      PrefixSum.withRunningTotal(byT, "end0", "__c0", "t"),
      "end1", "__c1", "t")
    val tot = byT.agg(sum(col("end0")).as("__t0"), sum(col("end1")).as("__t1"))
    val terms = cum.crossJoin(broadcast(tot))
      // at risk AT t: everyone not ended strictly before t
      .withColumn("__n0", col("__t0") - (col("__c0") - col("end0")))
      .withColumn("__n1", col("__t1") - (col("__c1") - col("end1")))
      .withColumn("__n", col("__n0") + col("__n1"))
      .withColumn("__d", col("ev0") + col("ev1"))
      .where(col("__d") > 0)
      .withColumn("__ome", expr(
        """CAST(CAST(ev1 AS DOUBLE)
           - CAST(__d AS DOUBLE) * CAST(__n1 AS DOUBLE) / CAST(__n AS DOUBLE)
           AS DECIMAL(20,8))"""))
      .withColumn("__v", expr(
        """CAST(CASE WHEN __n <= 1 THEN 0.0 ELSE
           CAST(__d AS DOUBLE) * (CAST(__n1 AS DOUBLE) / CAST(__n AS DOUBLE))
           * (1.0 - CAST(__n1 AS DOUBLE) / CAST(__n AS DOUBLE))
           * (CAST(__n - __d AS DOUBLE) / CAST(__n - 1 AS DOUBLE))
           END AS DECIMAL(20,8))"""))
    terms.agg(count(lit(1)).as("n_event_times"),
        sum(col("ev1")).as("n_obs_g1"),
        sum(col("__ome")).as("__some"), sum(col("__v")).as("__sv"))
      .select(col("n_event_times"), col("n_obs_g1"),
        round(col("__some").cast("double"), 4).as("obs_minus_exp"),
        round(col("__sv").cast("double"), 4).as("variance"),
        when(col("__sv") > 0, round(
          expr("""CAST(__some AS DOUBLE) * CAST(__some AS DOUBLE)
                  / CAST(__sv AS DOUBLE)"""), 4)).as("chi2"))
  }
}
