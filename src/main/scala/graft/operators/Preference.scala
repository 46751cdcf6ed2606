package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise preference construction — the reward-model / DPO prep step:
  * turn per-group scored candidates (N sampled responses per prompt, N
  * ranked results per query, N events per user) into (chosen, rejected)
  * training pairs with a score margin.
  *
  * All-pairs per group is quadratic in the group size; the standard
  * recipe (and the only shape that survives heavy groups at corpus
  * scale) caps each side first: the `topM` best are eligible as
  * `chosen`, the `bottomM` worst as `rejected`, so a group emits at
  * most topM·bottomM pairs no matter how many candidates it has. Both
  * rank windows ride the SAME per-group shuffle (one exchange total),
  * and the pair join is group-local on the two capped — hence tiny —
  * sides. Pairs are strict (`chosen.score > rejected.score`), which
  * makes mirror duplicates impossible, and a `minMargin` floor drops
  * near-tie pairs that teach a preference model nothing.
  *
  * Determinism: ranks tie-break on `idCol`, so the emitted pair set is
  * a pure function of the input — partitioning, retries, and AQE
  * re-plans cannot change it.
  */
object Preference {

  /** Group-relative advantage — the GRPO normalization (Shao et al.,
    * 2024, DeepSeekMath): per group, advantage_i = (s_i − mean) / std
    * over the group's candidate scores, the score signal a
    * policy-gradient trainer consumes instead of a learned value
    * baseline. Scores snap to DECIMAL(18,6) before the moment sums so
    * the group moments are aggregation-order-free; the z itself is an
    * identical double expression over those exact sums on both engines.
    * Degenerate groups (all scores equal — min = max, an EXACT decimal
    * test) get advantage 0 rather than 0/0. One per-group exchange.
    */
  def groupAdvantage(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    // centi-unit integer scores: z = (n·s_i − S1) / √(n·S2 − S1²) is
    // ALGEBRAICALLY (s_i − mean)/σ_pop, but every intermediate is an
    // exact ≤2^53 integer at realistic group sizes, so the only float
    // ops are one division and one sqrt of exactly-converted values —
    // no decimal→double of huge scaled sums, whose last-ulp rounding
    // differs across engines and flips 4dp boundaries (caught by the
    // sf0.1 sweep). Degenerate groups (den = 0, an exact integer test)
    // get advantage 0 rather than 0/0; `+ 0.0` kills negative zero.
    val snapped = df.select(col(groupCol), col(idCol),
      (col(scoreCol).cast("decimal(18,2)") * 100).cast("long").as("__sc"))
    val stats = snapped.groupBy(col(groupCol))
      .agg(sum(col("__sc")).as("__s1"),
        sum(col("__sc") * col("__sc")).as("__s2"),
        count(lit(1)).as("__n"))
    snapped.join(stats, Seq(groupCol))
      .select(col(groupCol), col(idCol),
        (round(when(col("__n") * col("__s2") - col("__s1") * col("__s1") === 0,
          lit(0.0))
          .otherwise(
            (col("__n") * col("__sc") - col("__s1")).cast("double")
              / sqrt((col("__n") * col("__s2")
                - col("__s1") * col("__s1")).cast("double"))), 4) + lit(0.0))
          .as("advantage"))
  }

  /** (groupCol, chosen_id, chosen_score, chosen_rank, rejected_id,
    * rejected_score, rejected_rank, margin) — strict-preference pairs,
    * top-`topM` × bottom-`bottomM` per group, margin ≥ `minMargin`.
    */
  def pairs(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, topM: Int = 3, bottomM: Int = 3,
      minMargin: Double = 0.0): DataFrame = {
    require(topM > 0 && bottomM > 0,
      s"need positive caps, got topM=$topM bottomM=$bottomM")
    val byBest = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val byWorst = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    // one projection, one per-group exchange; both ranks ride it
    val ranked = df.select(col(groupCol), col(idCol), col(scoreCol))
      .withColumn("__top", row_number().over(byBest))
      .withColumn("__bot", row_number().over(byWorst))
    val chosen = ranked.where(col("__top") <= topM)
      .select(col(groupCol), col(idCol).as("chosen_id"),
        col(scoreCol).as("chosen_score"), col("__top").as("chosen_rank"))
    val rejected = ranked.where(col("__bot") <= bottomM)
      .select(col(groupCol), col(idCol).as("rejected_id"),
        col(scoreCol).as("rejected_score"), col("__bot").as("rejected_rank"))
    chosen.join(rejected, Seq(groupCol))
      .where(col("chosen_score") > col("rejected_score") &&
        col("chosen_score") - col("rejected_score") >= minMargin)
      .select(col(groupCol), col("chosen_id"), col("chosen_score"),
        col("chosen_rank").cast("long").as("chosen_rank"),
        col("rejected_id"), col("rejected_score"),
        col("rejected_rank").cast("long").as("rejected_rank"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
  }
}
