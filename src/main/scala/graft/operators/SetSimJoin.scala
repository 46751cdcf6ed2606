package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Prefix-filtered set-similarity join — the SSJoin / All-Pairs /
  * PPJoin family (Chaudhuri et al. ICDE'06, Bayardo et al. WWW'07,
  * Xiao et al. WWW'08): exact token-set Jaccard pairs WITHOUT the
  * quadratic inverted-index blowup, via a candidate filter that is
  * PROVABLY lossless at the requested threshold — the principled
  * complement to [[Dedup.shingleJaccardPairs]]'s heuristic hot-shingle
  * cap (that operator trades boilerplate-only pairs for a bound; this
  * one keeps every qualifying pair by construction).
  *
  * The prefix-filter principle: order every set by one GLOBAL token
  * order (ascending document frequency, so each set's prefix holds its
  * globally rarest tokens). If Jaccard(A,B) ≥ τ then
  * |A∩B| ≥ ⌈τ·max(|A|,|B|)⌉, and two sets whose overlap is at least α
  * must share a token within their first |x|−α+1 tokens — so emitting
  * only each set's first |x|−⌈τ·|x|⌉+1 tokens into the candidate index
  * misses no qualifying pair. Rare-first ordering is what makes the
  * candidate join scale: stop-words land in suffixes and never
  * generate candidates, no df cap needed. A size filter
  * (min ≥ τ·max) prunes length-incompatible candidates before
  * verification; exact Jaccard on FULL sets then decides.
  *
  * Scale shape: one token scan feeds the df table, the positional
  * order, the candidate self-join AND verification (persisted once);
  * every join is an equi-join on token or doc id; candidate volume is
  * Σ_t df_prefix(t)² over RARE tokens only. SetSimJoinSpec proves
  * pruned ≡ exhaustive on real text — the losslessness theorem as a
  * test.
  */
object SetSimJoin {

  /** Exact Jaccard ≥ `minJaccard` pairs over word-token SETS of
    * `textCol`, prefix-filtered. Returns (doc_a, doc_b, jaccard) with
    * doc_a < doc_b and jaccard rounded to 4 dp.
    */
  /** @param checkpoint materialize the result eagerly (default; the
    *        pair set is small next to the scanned text and the
    *        persisted token frame should release). PlanSpec passes
    *        false to pin the join shape on the un-truncated plan.
    */
  def jaccardPrefixPairs(df: DataFrame, textCol: String, idCol: String,
      minJaccard: Double, checkpoint: Boolean = true): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard in (0, 1]; got $minJaccard")
    // distinct word tokens per doc — reused by ordering, candidates,
    // verification, and cardinalities (persist: one tokenize+scan, not 4)
    val toks = df
      .select(col(idCol).as("doc"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("t"))
      .where(col("t") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dfc = toks.groupBy(col("t")).agg(count(lit(1)).as("__tdf"))
      val byDoc = Window.partitionBy(col("doc"))
      // global canonical order: rarest token first, token asc tiebreak —
      // deterministic on any partitioning
      val ordered = toks.join(dfc, Seq("t"))
        .withColumn("__pos", row_number().over(
          byDoc.orderBy(col("__tdf").asc, col("t").asc)))
        .withColumn("__n", count(lit(1)).over(byDoc))
      val prefix = ordered.where(
        col("__pos") <= col("__n") - ceil(lit(minJaccard) * col("__n")) + 1)
      val cand = prefix.select(col("t"), col("doc").as("doc_a"), col("__n").as("__na"))
        .join(prefix.select(col("t"), col("doc").as("doc_b"), col("__n").as("__nb")),
          Seq("t"))
        .where(col("doc_a") < col("doc_b"))
        // size filter: Jaccard ≥ τ forces min(|A|,|B|) ≥ τ·max(|A|,|B|)
        .where(least(col("__na"), col("__nb")).cast("double") >=
          lit(minJaccard) * greatest(col("__na"), col("__nb")).cast("double"))
        .select(col("doc_a"), col("doc_b")).distinct()
      // verification on FULL token sets, restricted to candidates
      val inter = cand
        .join(toks.select(col("doc").as("doc_a"), col("t")), Seq("doc_a"))
        .join(toks.select(col("doc").as("doc_b"), col("t")), Seq("doc_b", "t"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("__inter"))
      val card = toks.groupBy(col("doc")).agg(count(lit(1)).as("__n"))
      val result = inter
        .join(card.select(col("doc").as("doc_a"), col("__n").as("__na")), Seq("doc_a"))
        .join(card.select(col("doc").as("doc_b"), col("__n").as("__nb")), Seq("doc_b"))
        .withColumn("jaccard",
          col("__inter") / (col("__na") + col("__nb") - col("__inter")))
        .where(col("jaccard") >= minJaccard)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      if (checkpoint) result.localCheckpoint(true) else result
    } finally toks.unpersist(false)
  }
}
