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

  /** Bradley-Terry ratings from pairwise outcomes (Hunter's MM
    * algorithm, Annals of Statistics 2004) — the arena-style rating a
    * model-eval pipeline computes from head-to-head preference wins.
    * Each iteration is γ_i ← W_i / Σ_j (n_ij + n_ji)/(γ_i + γ_j),
    * renormalized to mean 1.
    *
    * Cross-engine determinism: the Σ_j terms and the normalization sum
    * snap to DECIMAL(20,8) BEFORE summing (double sums are partial-
    * order-dependent), each γ update reads the SNAPPED value, and every
    * other op is an identical IEEE expression — so a fixed number of
    * rounds replays exactly in SQL. Scale shape: the matches scan is
    * the only corpus-sized pass; everything after lives on the
    * players²-bounded win matrix. A player with zero wins rates 0 (the
    * MM fixed point when W_i = 0) rather than erroring.
    */
  def bradleyTerry(matches: DataFrame, winnerCol: String, loserCol: String,
      iters: Int = 3): DataFrame =
    bradleyTerryFromCounts(
      matches.groupBy(col(winnerCol).as("i"), col(loserCol).as("j"))
        .agg(count(lit(1)).as("n_ij")), iters)

  /** Same MM iteration over a PRE-AGGREGATED (i, j, n_ij) win-count
    * matrix — the incremental-arena entry point: match counts are
    * additive, so a stream folds batches into the (players²-bounded)
    * count state and re-derives ratings from it at any time; ratings
    * from folded counts ≡ one-shot over all matches, BY the oracle
    * (`bt_maintained`).
    */
  def bradleyTerryFromCounts(counts: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val n = counts.select(col("i"), col("j"), col("n_ij"))
      .localCheckpoint(true)
    val tot = n.select(col("i"), col("j"), col("n_ij"))
      .unionByName(n.select(col("j").as("i"), col("i").as("j"), col("n_ij")))
      .groupBy(col("i"), col("j")).agg(sum(col("n_ij")).as("n_tot"))
    val wins = n.groupBy(col("i")).agg(sum(col("n_ij")).as("w"))
    val players = tot.select(col("i")).distinct()
    var g = players.withColumn("gamma", lit(1.0))
    for (_ <- 1 to iters) {
      val d = tot
        .join(g.select(col("i"), col("gamma").as("__gi")), Seq("i"))
        .join(g.select(col("i").as("j"), col("gamma").as("__gj")), Seq("j"))
        .select(col("i"),
          (col("n_tot") / (col("__gi") + col("__gj")))
            .cast("decimal(20,8)").as("__term"))
        .groupBy(col("i")).agg(sum(col("__term")).as("__d"))
      val raw = players
        .join(d, Seq("i"))
        .join(wins, Seq("i"), "left")
        .select(col("i"),
          (coalesce(col("w"), lit(0L)).cast("double")
            / col("__d").cast("double")).cast("decimal(20,8)").as("__graw"))
      val norm = raw.agg(sum(col("__graw")).as("__s"),
        count(lit(1)).as("__ng"))
      g = raw.crossJoin(broadcast(norm))
        .select(col("i"),
          (col("__graw").cast("double") * col("__ng")
            / col("__s").cast("double")).as("gamma"))
        .localCheckpoint(true)
    }
    val joined = g.select(col("i").as("player"),
        (round(col("gamma"), 4) + lit(0.0)).as("rating"))
      .join(wins.select(col("i").as("player"), col("w").as("n_wins")),
        Seq("player"), "left")
      .select(col("player"), coalesce(col("n_wins"), lit(0L)).as("n_wins"),
        col("rating"))
      .withColumn("__negr", -col("rating"))
    // DenseId, not a partitionless rank window (the PlanSpec sweep) —
    // players-bounded here, but the discipline is unconditional
    DenseId.withOrderedId(joined, "__rk", "__negr", "player")
      .select(col("player"), col("n_wins"), col("rating"),
        (col("__rk") + 1).as("rank"))
  }

  /** Group-relative advantage — the GRPO normalization (Shao et al.,
    * 2024, DeepSeekMath): per group, advantage_i = (s_i − mean) / std
    * over the group's candidate scores, the score signal a
    * policy-gradient trainer consumes instead of a learned value
    * baseline. Scores snap to DECIMAL(18,2) (centi-unit longs — see the
    * body comment) before the moment sums so
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
    // whole-group window frames instead of a groupBy + rejoin: the same
    // exact integer sums, but ONE per-group exchange instead of two
    // (the join shuffled both sides; in-suite this row paid the extra
    // exchange + join build on every cold run — r18 bench watch item)
    val byGroup = Window.partitionBy(col(groupCol))
    snapped
      .withColumn("__s1", sum(col("__sc")).over(byGroup))
      .withColumn("__s2", sum(col("__sc") * col("__sc")).over(byGroup))
      .withColumn("__n", count(lit(1)).over(byGroup))
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
