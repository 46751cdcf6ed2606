package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-LM scoring + perplexity bucketing — the CCNet curation recipe
  * (Wenzek et al., LREC 2020): score every document under a language
  * model fit on the corpus itself, order by score, cut the corpus into
  * equal perplexity buckets (head / middle / tail) and keep the cleaner
  * buckets.
  *
  * [[bigramNll]] is the scoring pass (factored out of the
  * `text_lm_score` query so bucketing composes on the same math).
  * [[pplBuckets]] is the bucketing pass: a GLOBAL ntile computed
  * without a partitionless window — [[DenseId.withOrderedId]] gives the
  * global rank (range-partitioned sort + per-partition offsets), and
  * the ANSI ntile bucket is then closed-form in (rank, n, k), so the
  * cut costs one distributed sort however large the corpus is. Ranks
  * order by the ALREADY-ROUNDED score (ties broken by id), which is
  * the repo's cross-engine boundary — last-ulp ln() differences
  * between engines cannot flip a bucket edge.
  */
object CorpusLm {

  /** Per-doc (idCol, n_bigrams, lm_score): mean negative log-likelihood
    * under the corpus's own bigram MLE. Bigrams come from a
    * doc-partitioned lag window (never a global sort); only the
    * bigram-VOCAB-sized count table persists (the bigram stream itself
    * is corpus-sized — caching it at 100 TB would cost more than the
    * second scan it saves) and the unigram denominators fold out of it
    * instead of re-reading the corpus. Per-bigram NLL is fixed to
    * DECIMAL(20,8) before summing so the per-doc mean is independent
    * of partial-aggregation order (and of 1-ulp ln() differences
    * between engines). Docs with fewer than 2 tokens have no bigrams
    * and emit no row.
    */
  def bigramNll(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .select(col(idCol), col("pos"), col("col").as("w"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val bi = toks
      .withColumn("w1", lag(col("w"), 1).over(byDoc))
      .where(col("w1").isNotNull)
      .select(col(idCol), col("w1"), col("w").as("w2"))
    // the bigram-vocab-bounded count table snapshots eagerly instead of
    // holding a .persist handle the caller can never release: the
    // checkpoint job costs the same token pass the old persist paid on
    // first use, leaves no dangling cache entry, and the RESULT stays
    // lazy so a single-consumer caller keeps full plan pruning (callers
    // that fan out snapshot themselves — see pplBuckets)
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    bi.join(c2, Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .select(col(idCol),
        (-log(col("c2") / col("c1"))).cast("decimal(20,8)").as("nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 4).as("lm_score"))
  }

  /** Per-doc mean NLL under an interpolated Kneser-Ney bigram model
    * (Kneser & Ney, ICASSP 1995; absolute discount D):
    *
    *   P(w2|w1) = max(c12 − D, 0)/c1 + (D·N1+(w1·)/c1) · N1+(·w2)/N1+(··)
    *
    * — the smoothing every real perplexity filter uses, where the MLE
    * ([[bigramNll]]) assigns unseen-continuation mass nothing. Every
    * statistic (bigram counts, left/right continuation type counts, the
    * type total) derives from the ONE bigram-vocab-sized count table;
    * the probability is an identical double expression on both engines
    * over those exact integers, and the per-bigram NLL snaps to
    * DECIMAL(20,8) before summing (the bigramNll discipline), so the
    * per-doc mean replays in SQL. No backoff-to-unseen term is needed:
    * scoring the training corpus itself, every scored bigram was seen.
    */
  def bigramKnNll(docs: DataFrame, textCol: String, idCol: String,
      discount: Double = 0.5): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    val toks = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .select(col(idCol), col("pos"), col("col").as("w"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val bi = toks
      .withColumn("w1", lag(col("w"), 1).over(byDoc))
      .where(col("w1").isNotNull)
      .select(col(idCol), col("w1"), col("w").as("w2"))
    // same count-table snapshot discipline as [[bigramNll]]: eager
    // vocab-bounded checkpoint, no dangling persist handle, lazy result
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    // all four smoothing statistics fold out of the count table
    val left = c2.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
    val right = c2.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val types = c2.agg(count(lit(1)).as("nt"))
    bi.join(c2, Seq("w1", "w2"))
      .join(broadcast(left), Seq("w1"))
      .join(broadcast(right), Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col(idCol),
        (-log(greatest(col("c2") - lit(discount), lit(0.0)) / col("c1")
          + (lit(discount) * col("n1f") / col("c1"))
            * (col("n1b") / col("nt"))))
          .cast("decimal(20,8)").as("nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 4)
          .as("kn_score"))
  }

  /** Held-out scoring — the deployment mode of a perplexity filter:
    * fit the interpolated-KN statistics on `train`, score `test`
    * documents the model has NEVER seen. Unlike [[bigramKnNll]]
    * (which scores the fitting corpus, where every bigram is seen),
    * this must assign positive mass to three unseen cases:
    *
    *  - (w1,w2) unseen, w1 seen  → the discount term is 0 and the
    *    backoff weight carries everything;
    *  - w2 never a continuation  → its raw continuation count is 0,
    *    so continuation probabilities are add-D smoothed over the
    *    right vocabulary: Pcont(w2) = (N1+(·w2) + D) / (N1+(··) + D·Vr)
    *    — a proper distribution that never zeroes;
    *  - w1 unseen entirely       → back off to Pcont(w2) alone.
    *
    * All statistics are train-bigram-vocab-bounded broadcasts; the
    * scoring pass is the test token stream joined against them (LEFT
    * joins — absence IS the signal). Per-bigram NLL snaps to
    * DECIMAL(20,8), the per-doc mean is one double division: the
    * whole scorer replays in SQL including the null branches.
    */
  def bigramKnHeldout(train: DataFrame, test: DataFrame, textCol: String,
      idCol: String, discount: Double = 0.5): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    def bigrams(docs: DataFrame) = {
      val toks = docs
        .select(col(idCol), posexplode(split(col(textCol), " ")))
        .select(col(idCol), col("pos"), col("col").as("w"))
      val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      toks.withColumn("w1", lag(col("w"), 1).over(byDoc))
        .where(col("w1").isNotNull)
        .select(col(idCol), col("w1"), col("w").as("w2"))
    }
    val c2 = bigrams(train).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val left = c2.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
    val right = c2.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val scalars = c2.agg(count(lit(1)).as("nt"),
      countDistinct(col("w2")).as("vr"))
    val d = lit(discount)
    val pcont = (coalesce(col("n1b"), lit(0L)) + d) /
      (col("nt") + d * col("vr"))
    val p = when(col("c1").isNotNull,
      greatest(coalesce(col("c2"), lit(0L)) - d, lit(0.0)) / col("c1")
        + (d * col("n1f") / col("c1")) * pcont)
      .otherwise(pcont)
    bigrams(test)
      .join(c2, Seq("w1", "w2"), "left")
      .join(broadcast(left), Seq("w1"), "left")
      .join(broadcast(right), Seq("w2"), "left")
      .crossJoin(broadcast(scalars))
      .select(col(idCol), (-log(p)).cast("decimal(20,8)").as("nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 4)
          .as("heldout_score"))
  }

  /** Both scores in ONE pass — (idCol, n_bigrams, lm_score, kn_score):
    * the MLE and Kneser-Ney NLLs share the bigram stream, the count
    * table, and the per-doc aggregate, so a consumer that needs both
    * (mixture_doremi's proxy-vs-reference excess) pays one scoring
    * pipeline instead of two. Identical per-column math to
    * [[bigramNll]]/[[bigramKnNll]] — the same oracle CTEs gate it.
    */
  def bigramBothNll(docs: DataFrame, textCol: String, idCol: String,
      discount: Double = 0.5): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    val toks = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .select(col(idCol), col("pos"), col("col").as("w"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val bi = toks
      .withColumn("w1", lag(col("w"), 1).over(byDoc))
      .where(col("w1").isNotNull)
      .select(col(idCol), col("w1"), col("w").as("w2"))
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val left = c2.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
    val right = c2.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val types = c2.agg(count(lit(1)).as("nt"))
    bi.join(c2, Seq("w1", "w2"))
      .join(broadcast(left), Seq("w1"))
      .join(broadcast(right), Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col(idCol),
        (-log(col("c2") / col("c1"))).cast("decimal(20,8)").as("mle"),
        (-log(greatest(col("c2") - lit(discount), lit(0.0)) / col("c1")
          + (lit(discount) * col("n1f") / col("c1"))
            * (col("n1b") / col("nt"))))
          .cast("decimal(20,8)").as("kn"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("mle")).cast("double") / count(lit(1)), 4).as("lm_score"),
        round(sum(col("kn")).cast("double") / count(lit(1)), 4).as("kn_score"))
  }

  /** `scored` (from [[bigramNll]]) + `ppl_bucket` (1..k, ANSI-ntile
    * sizes: the first n mod k buckets get one extra row) + `keep`
    * (every bucket but the worst — the CCNet head+middle cut).
    *
    * `snapshot = false` skips the internal localCheckpoint — pass it
    * when the caller's frame is ALREADY materialized (checkpointed or
    * persisted); the default would otherwise pay a second full copy.
    * Note the snapshot truncates lineage for the session (blocks are
    * freed only by the context cleaner once the result is no longer
    * referenced), and the result reads it lazily — it cannot be freed
    * inside this call.
    */
  def pplBuckets(scored: DataFrame, idCol: String, k: Int,
      snapshot: Boolean = true): DataFrame = {
    require(k >= 2, s"need at least 2 buckets, got $k")
    // the count pass and the rank pass both consume `scored`; snapshot
    // the |docs|-sized frame once so an unpersisted caller's scoring
    // pipeline doesn't execute twice
    val snap = if (snapshot) scored.localCheckpoint(true) else scored
    val n = snap.count()
    val ranked = DenseId.withOrderedId(snap, "__rk", "lm_score", idCol)
    // ANSI ntile in closed form over the 0-based global rank r:
    // q = n div k, m = n mod k; the first m buckets hold q+1 rows.
    val q = n / k
    val m = n % k
    val bucket = when(col("__rk") < m * (q + 1),
      expr(s"__rk div ${q + 1} + 1L"))
      .otherwise(expr(
        s"$m + (__rk - ${m * (q + 1)}) div ${math.max(q, 1L)} + 1L"))
      .cast("long")
    ranked.select(col(idCol), col("n_bigrams"), col("lm_score"),
      bucket.as("ppl_bucket"), (bucket < k).as("keep"))
  }
}
