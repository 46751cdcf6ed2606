package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SQL-only access to the operator library: each `register*` runs an
  * operator over TEMP VIEWS and publishes the result as a temp view, so
  * a user who only speaks `spark.sql` can compose the engine's
  * operators with plain SQL before/after — the "table-valued function"
  * role, spelled as view-producing wrappers (Spark has no public TVF
  * extension point; a view of a DataFrame is plan-identical).
  *
  * The compiled scalar expressions (vec_dot, simhash64, jaro_winkler, …)
  * are registered separately by
  * [[graft.functions.expressions.GraftExtensions]]; together the two
  * cover the scalar and table halves of the SQL surface.
  *
  * Nothing here executes eagerly: registering a view captures the
  * operator's LOGICAL plan, so Catalyst optimizes the user's downstream
  * SQL together with the operator's own plan (filters push into it,
  * unused columns prune out of it) exactly as if they had composed
  * DataFrames.
  */
object GraftSql {

  /** PageRank over an edge view → `outView(node, pr_fx)` — exact
    * fixed-point integers, directly composable in SQL.
    */
  def registerPageRank(s: SparkSession, edgesView: String, srcCol: String,
      dstCol: String, iters: Int, outView: String): Unit =
    graft.operators.PageRank.ranks(s.table(edgesView), srcCol, dstCol, iters)
      .createOrReplaceTempView(outView)

  /** PageRank over a PRE-ANNOTATED degree-edge view (src, dst, od) and
    * node view (node) → `outView(node, pr_fx)` — the stored-artifact
    * path: a warehouse keeps the degree-annotated canonical edge table
    * as a shared asset, and every ranking query starts from it instead
    * of re-deriving the annotation. Bit-identical to [[registerPageRank]]
    * on the raw edges.
    */
  def registerPageRankPrepared(s: SparkSession, degreeEdgesView: String,
      nodesView: String, iters: Int, outView: String): Unit =
    graft.operators.PageRank.ranksFromPrepared(
        s.table(degreeEdgesView), s.table(nodesView), iters)
      .createOrReplaceTempView(outView)

  /** Exact dedup over a document view → `outView(idCol, dup_count)`:
    * one surviving id (the minimum) per distinct content value, with
    * the group size. Groups on the 16-byte md5 of the content, never
    * the multi-KB text itself.
    */
  def registerDedupExact(s: SparkSession, docsView: String, idCol: String,
      textCol: String, outView: String): Unit =
    s.table(docsView)
      .groupBy(md5(col(textCol).cast("binary")).as("__fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(col(idCol), col("dup_count"))
      .createOrReplaceTempView(outView)

  /** As-of join of two keyed/timestamped views → `outView` with the
    * right payload columns suffixed `_asof` (see
    * [[graft.operators.AsofJoin.asofJoin]] for direction/tolerance
    * semantics; `timeCol` is a numeric epoch column on both sides).
    */
  def registerAsofJoin(s: SparkSession, leftView: String, rightView: String,
      keyCol: String, timeCol: String, payloadCols: Seq[String],
      outView: String, direction: String = "backward",
      tolerance: Option[Long] = None): Unit =
    graft.operators.AsofJoin.asofJoin(s.table(leftView), s.table(rightView),
        keyCol, timeCol, payloadCols, direction = direction,
        tolerance = tolerance)
      .createOrReplaceTempView(outView)

  /** Exact cosine k-NN join of a query view against a corpus view →
    * `outView(query_id, neighbor_id, rank, cosine)`. This is the exact
    * baseline; at corpus scale swap in the IVF(-PQ) variants
    * ([[graft.operators.SimilaritySearch.knnJoinIvfPq]]) behind the
    * same output shape.
    */
  def registerKnnJoin(s: SparkSession, corpusView: String,
      queriesView: String, vecCol: String, idCol: String, k: Int,
      outView: String): Unit =
    graft.operators.SimilaritySearch.knnJoinBruteForce(
        s.table(corpusView), s.table(queriesView), vecCol, idCol, k)
      .createOrReplaceTempView(outView)

  /** MinHash-LSH near-duplicate pairs over a document view →
    * `outView(doc_a, doc_b, jaccard)` (banded signature join, exact
    * Jaccard verify — [[graft.operators.Dedup.minHashLshPairs]]).
    */
  def registerMinHashDedup(s: SparkSession, docsView: String, idCol: String,
      textCol: String, outView: String, shingleLen: Int = 5,
      bands: Int = 8, rowsPerBand: Int = 2,
      minJaccard: Double = 0.5): Unit =
    graft.operators.Dedup.minHashLshPairs(s.table(docsView), textCol, idCol,
        shingleLen = shingleLen, bands = bands, rowsPerBand = rowsPerBand,
        minJaccard = minJaccard)
      .createOrReplaceTempView(outView)

  /** SCD type-2 history from a change-log view →
    * `outView(key, state, valid_from, valid_to, is_current)`
    * ([[graft.operators.Scd.buildHistory]]).
    */
  def registerScd2History(s: SparkSession, logView: String, keyCol: String,
      tsCol: String, tieCol: String, stateCol: String,
      outView: String): Unit =
    graft.operators.Scd.buildHistory(s.table(logView), keyCol, tsCol,
        tieCol, stateCol)
      .createOrReplaceTempView(outView)

  /** Point-in-time slice of a type-2 history view: every key's state
    * as of `atEpoch` ([[graft.operators.Scd.asOf]]).
    */
  def registerScd2AsOf(s: SparkSession, historyView: String, atEpoch: Long,
      outView: String): Unit =
    graft.operators.Scd.asOf(s.table(historyView), lit(atEpoch))
      .createOrReplaceTempView(outView)

  /** Population-stability-index drift report between a baseline view
    * and a current view → `outView(bin, n_base, n_cur, psi_term)`
    * ([[graft.operators.Drift.psiByBin]]; bins fit on the baseline).
    */
  def registerPsiDrift(s: SparkSession, baseView: String, curView: String,
      valueCol: String, k: Int, outView: String): Unit =
    graft.operators.Drift.psiByBin(s.table(baseView), s.table(curView),
        valueCol, k)
      .createOrReplaceTempView(outView)

  /** Strict-order funnel over an event view → one-row
    * `outView(n_users, n_reach_1 … n_reach_N)`: per user, the FIRST
    * time of each stage type; a user reaches stage i when every prior
    * stage happened and each first-time is strictly after the previous
    * stage's. One hash aggregate per grouping — no per-user state.
    */
  def registerFunnel(s: SparkSession, eventsView: String, userCol: String,
      typeCol: String, tsCol: String, stages: Seq[String],
      outView: String): Unit = {
    require(stages.nonEmpty, "registerFunnel: need at least one stage")
    val firsts = stages.zipWithIndex.map { case (st, i) =>
      min(when(col(typeCol) === st, col(tsCol))).as(s"__t$i") }
    val perUser = s.table(eventsView)
      .groupBy(col(userCol)).agg(firsts.head, firsts.tail: _*)
    val reach = (1 to stages.size).map { n =>
      val present = (0 until n).map(i => col(s"__t$i").isNotNull)
        .reduce(_ && _)
      val ordered = (1 until n).map(i => col(s"__t$i") > col(s"__t${i - 1}"))
        .foldLeft(lit(true))(_ && _)
      sum((present && ordered).cast("long")).as(s"n_reach_$n")
    }
    perUser.agg(count(lit(1)).as("n_users"), reach: _*)
      .createOrReplaceTempView(outView)
  }

  /** Connected components of an undirected edge view →
    * `outView(id, cluster)` (cluster = min reachable id), via the same
    * large-star/small-star contraction the dedup clusters use —
    * O(log² n) rounds, billion-edge-safe. Iterative: registration runs
    * the contraction (like [[registerPageRank]]), the view holds the
    * result.
    */
  def registerComponents(s: SparkSession, edgesView: String, srcCol: String,
      dstCol: String, outView: String): Unit = {
    val e = graft.operators.GraphAlgs.canonical(
      s.table(edgesView), srcCol, dstCol).localCheckpoint(true)
    val nodes = e.select(col("a").as("node"))
      .unionAll(e.select(col("b"))).distinct()
    graft.operators.Dedup.duplicateClustersStar(nodes, "node",
        e.select(col("a").as("doc_a"), col("b").as("doc_b")))
      .createOrReplaceTempView(outView)
  }

  /** Absorption probability by value iteration over a transition-count
    * view → `outView(state, p_fx, p_ppm)`: from each state, the
    * probability of reaching `absorbing` within `iters` steps — the
    * conversion-potential read behind Markov attribution
    * ([[graft.operators.GraphAlgs.absorptionProbability]]; exact
    * fixed-point integers, sinks count as non-converting).
    */
  def registerAbsorption(s: SparkSession, transView: String, srcCol: String,
      dstCol: String, nCol: String, absorbing: String, iters: Int,
      outView: String): Unit =
    graft.operators.GraphAlgs.absorptionProbability(s.table(transView),
        srcCol, dstCol, nCol, absorbing, iters)
      .createOrReplaceTempView(outView)

  /** Gap-based sessionization of an event view →
    * `outView(userCol, session_id, start_us, end_us, n_events,
    * total_value)` — a new session starts when the gap to the user's
    * previous event exceeds `gapUs`
    * ([[graft.streaming.EventStreams.sessionizeBatch]]; the same
    * expressions run streaming under a watermark).
    */
  def registerSessionize(s: SparkSession, eventsView: String, gapUs: Long,
      outView: String, userCol: String = "user_id",
      tsCol: String = "ts_us", valueCol: String = "value"): Unit =
    graft.streaming.EventStreams.sessionizeBatch(s.table(eventsView),
        gapUs, userCol, tsCol, valueCol)
      .createOrReplaceTempView(outView)

  /** Fixed-bin histograms of every listed column in two passes total →
    * `outView(col_name, bucket, cnt)`
    * ([[graft.operators.Histograms.sweep]] — one min/max aggregate +
    * one explode/groupBy, however many columns are swept).
    */
  def registerHistogram(s: SparkSession, rowsView: String,
      columns: Seq[String], bins: Int, outView: String): Unit =
    graft.operators.Histograms.sweep(s.table(rowsView), columns, bins)
      .createOrReplaceTempView(outView)

  /** CUPED variance-reduced A/B read over a per-unit view →
    * one-row `outView(n_units, theta, effect_raw, effect_cuped,
    * var_reduction)` ([[graft.operators.Cuped.effect]]; θ fit pooled
    * from exact DECIMAL sufficient statistics, loud failure on empty
    * or stray arms).
    */
  def registerCuped(s: SparkSession, unitsView: String, armCol: String,
      metricCol: String, covariateCol: String, armA: String, armB: String,
      outView: String): Unit =
    graft.operators.Cuped.effect(s.table(unitsView), armCol, metricCol,
        covariateCol, armA, armB)
      .createOrReplaceTempView(outView)

  /** Per-group winsorization of `valueCol` → `outView` = the input
    * columns plus `<valueCol>_w` clamped to the group's exact
    * [lo, hi] percentiles ([[graft.operators.Outliers.winsorize]];
    * one stats aggregate, broadcast back, codegen'd clamp).
    */
  def registerWinsorize(s: SparkSession, rowsView: String, valueCol: String,
      groupCols: Seq[String], lo: Double, hi: Double,
      outView: String): Unit =
    graft.operators.Outliers.winsorize(s.table(rowsView), valueCol,
        groupCols, lo, hi)
      .createOrReplaceTempView(outView)

  /** Deterministic weighted sample without replacement → `outView` =
    * the `n` input rows with the largest md5-Gumbel keys
    * ([[graft.operators.CorpusPrep.weightedSample]] — reproducible on
    * any engine, no rand()).
    */
  def registerWeightedSample(s: SparkSession, rowsView: String,
      idCol: String, weightCol: String, n: Int, outView: String): Unit =
    graft.operators.CorpusPrep.weightedSample(s.table(rowsView), idCol,
        weightCol, n)
      .createOrReplaceTempView(outView)

  /** Multi-touch attribution over an event view →
    * `outView(touch_type, n_conversions_touched, credit_ppm_total)`:
    * conversions credit the same user's prior touches inside the
    * lookback under `model` ∈ {first_touch, last_touch, linear},
    * integer ppm credits summing to exactly 1e6 per conversion
    * ([[graft.operators.Attribution.creditTouches]] rolled up by
    * [[graft.operators.Attribution.channelCredit]]).
    */
  def registerAttribution(s: SparkSession, eventsView: String,
      userCol: String, tsCol: String, typeCol: String, idCol: String,
      touchTypes: Seq[String], convType: String, model: String,
      lookbackUs: Long, outView: String): Unit =
    graft.operators.Attribution.channelCredit(
        graft.operators.Attribution.creditTouches(s.table(eventsView),
          userCol, tsCol, typeCol, idCol, touchTypes, convType, model,
          lookbackUs))
      .createOrReplaceTempView(outView)

  /** Winnowing (MOSS) candidate pairs over a document view →
    * `outView(doc_a, doc_b, n_shared_fp, fp_jaccard)`
    * ([[graft.operators.Dedup.winnowingPairs]]; any shared run of
    * `window + shingleLen − 1` tokens is guaranteed to pair).
    */
  def registerWinnowingPairs(s: SparkSession, docsView: String,
      idCol: String, textCol: String, outView: String,
      shingleLen: Int = 5, window: Int = 4, minShared: Long = 2): Unit =
    graft.operators.Dedup.winnowingPairs(s.table(docsView), textCol, idCol,
        shingleLen, window, minShared)
      .createOrReplaceTempView(outView)

  /** Token-balanced snake shard assignment over a weighted rows view →
    * `outView(idCol, weightCol, rank, shard)`
    * ([[graft.operators.CorpusPrep.snakeShards]]).
    */
  def registerSnakeShards(s: SparkSession, rowsView: String, idCol: String,
      weightCol: String, nShards: Int, outView: String): Unit =
    graft.operators.CorpusPrep.snakeShards(s.table(rowsView), idCol,
        weightCol, nShards)
      .createOrReplaceTempView(outView)

  /** Leakage-safe holdout over a document view + near-dup pairs view
    * (`doc_a`, `doc_b`) → `outView(id, cluster, split)`: clusters are
    * the star-contraction components over the pairs (every document a
    * node, singletons their own cluster), and the train/test gate draws
    * once per CLUSTER ([[graft.operators.CorpusPrep.leakageSafeSplit]]),
    * so near-duplicates never straddle the boundary. Iterative:
    * registration runs the contraction (like [[registerComponents]]).
    */
  def registerLeakageSplit(s: SparkSession, docsView: String, idCol: String,
      pairsView: String, testFraction: Double, outView: String): Unit = {
    val clusters = graft.operators.Dedup.duplicateClustersStar(
      s.table(docsView).select(col(idCol)), idCol, s.table(pairsView))
    graft.operators.CorpusPrep.leakageSafeSplit(clusters, "id", "cluster",
        testFraction)
      .createOrReplaceTempView(outView)
  }

  /** Batch BM25 retrieval: a query view scored against a corpus view
    * through the inverted index → `outView(query_id, doc_id, rank,
    * bm25)` ([[graft.operators.Retrieval.bm25TopK]]; postings prune to
    * the query vocabulary before any join).
    */
  def registerBm25TopK(s: SparkSession, corpusView: String,
      queriesView: String, k: Int, outView: String,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", queryTextCol: String = "qtext"): Unit =
    graft.operators.Retrieval.bm25TopK(s.table(corpusView),
        s.table(queriesView), k, idCol, textCol, queryIdCol, queryTextCol)
      .createOrReplaceTempView(outView)

  /** Two-pass PRF retrieval through the facade →
    * `outView(query_id, doc_id, rank, bm25)`
    * ([[graft.operators.Retrieval.bm25PrfTopK]] — pass one's feedback
    * documents donate expansion terms, pass two scores the expanded
    * query).
    */
  def registerBm25Prf(s: SparkSession, corpusView: String,
      queriesView: String, k: Int, outView: String,
      fbDocs: Int = 3, expTerms: Int = 2): Unit =
    graft.operators.Retrieval.bm25PrfTopK(s.table(corpusView),
        s.table(queriesView), k, fbDocs, expTerms)
      .createOrReplaceTempView(outView)

  /** Warm-start rank refresh: continue the fixed-point iteration from a
    * stored rank view for `moreIters` more rounds →
    * `outView(node, pr_fx)` ([[graft.operators.PageRank.continueRanks]]
    * — bit-identical to recomputing (n + moreIters) rounds cold).
    */
  def registerPageRankContinue(s: SparkSession, degreeEdgesView: String,
      nodesView: String, ranksView: String, moreIters: Int,
      outView: String): Unit =
    graft.operators.PageRank.continueRanks(s.table(degreeEdgesView),
        s.table(nodesView), s.table(ranksView), moreIters)
      .createOrReplaceTempView(outView)

  /** Contiguous sequence packing over a rows view (idCol, nTokensCol) →
    * `outView(idCol, nTokensCol, start_tok, seq_id, seq_offset,
    * n_seqs)` ([[graft.operators.SequencePack.packContiguous]] — the
    * GPT-style fixed-length layout with boundary spillover).
    */
  /** Pairwise preference pairs over a scored-candidate view →
    * `outView(groupCol, chosen_id, chosen_score, chosen_rank,
    * rejected_id, rejected_score, rejected_rank, margin)` — see
    * [[graft.operators.Preference.pairs]]: strict top-`topM` ×
    * bottom-`bottomM` pairs per group with a margin floor.
    */
  def registerPreferencePairs(s: SparkSession, rowsView: String,
      groupCol: String, idCol: String, scoreCol: String, topM: Int,
      bottomM: Int, minMargin: Double, outView: String): Unit =
    graft.operators.Preference.pairs(s.table(rowsView), groupCol, idCol,
        scoreCol, topM, bottomM, minMargin)
      .createOrReplaceTempView(outView)

  /** Dictionary blocklist screen over a document view →
    * `outView(idCol, blocked_hits, keep)` — see
    * [[graft.operators.DictTag.screen]]: per-doc hit totals in the
    * blocked categories, keep = hits ≤ maxHits (no-hit docs kept).
    */
  def registerDictScreen(s: SparkSession, docsView: String, idCol: String,
      textCol: String, dict: Seq[(String, String)],
      blockCategories: Set[String], maxHits: Long, outView: String): Unit =
    graft.operators.DictTag.screen(s.table(docsView), textCol, idCol,
        dict, blockCategories, maxHits)
      .createOrReplaceTempView(outView)

  /** Fill-in-the-middle transform over a document view →
    * `outView(doc_id, fim, n_tokens, cut_a, cut_b, out_text)` — see
    * [[graft.operators.SpanCorrupt.fimTransform]].
    */
  def registerFim(s: SparkSession, docsView: String, textCol: String,
      idCol: String, ratePermille: Int, outView: String): Unit =
    graft.operators.SpanCorrupt.fimTransform(s.table(docsView), textCol,
        idCol, ratePermille)
      .createOrReplaceTempView(outView)

  /** Own-HLL distinct estimates over a keyed view →
    * `outView(groupCol, n_obs, est)` — fit + estimate in one call; see
    * [[graft.operators.Sketches.hllLongFit]]/[[graft.operators.Sketches.hllLongEstimate]].
    */
  def registerHllDistinct(s: SparkSession, rowsView: String, keyCol: String,
      groupCol: String, p: Int, outView: String): Unit =
    graft.operators.Sketches.hllLongEstimate(
        graft.operators.Sketches.hllLongFit(s.table(rowsView), keyCol,
          groupCol, p), groupCol, p)
      .createOrReplaceTempView(outView)

  /** DoReMi-style domain reweighting over a per-row scored view →
    * `outView(domainCol, n_docs, loss, ref_loss, excess, weight_ppm)` —
    * see [[graft.operators.CorpusPrep.doremiWeights]]: multiplicative
    * weights over per-domain excess loss, smoothed toward uniform.
    *
    * EAGER at registration, unlike the other register* helpers:
    * doremiWeights checkpoints its domain frame, so the full per-doc
    * scoring pipeline behind `perDocView` EXECUTES here, not at first
    * query of the view. Deliberate — the view then reads a
    * domain-count-sized snapshot instead of re-running the scorer per
    * consumer.
    */
  def registerDoremi(s: SparkSession, perDocView: String,
      domainCol: String, lossCol: String, refCol: String, eta: Double,
      smoothPermille: Long, outView: String): Unit =
    graft.operators.CorpusPrep.doremiWeights(s.table(perDocView),
        domainCol, lossCol, refCol, eta, smoothPermille)
      .createOrReplaceTempView(outView)

  /** Own deterministic Lloyd k-means over a vector view →
    * `outView(cell, pos, value)` — the k×d centroid frame of
    * [[graft.operators.LloydKmeans.fitIvfOwn]] (grid-snapped inputs,
    * hash-ranked seeds, DECIMAL-snapped rounds: the fit itself
    * replays in SQL, see KmeansSql). EAGER at registration like
    * [[registerDoremi]]: the Lloyd rounds are a driver-coordinated
    * loop, so the fit executes here and the view holds the tiny
    * centroid frame.
    */
  def registerKmeansFit(s: SparkSession, rowsView: String, vecCol: String,
      idCol: String, k: Int, rounds: Int, outView: String): Unit =
    graft.queries.VectorQueries.centroidsToDF(s,
        graft.operators.LloydKmeans.fitIvfOwn(s.table(rowsView), vecCol,
          idCol, k, rounds))
      .createOrReplaceTempView(outView)

  /** Bradley-Terry ratings over a (winner, loser) match view →
    * `outView(player, n_wins, rating, rank)` — see
    * [[graft.operators.Preference.bradleyTerry]].
    */
  def registerBradleyTerry(s: SparkSession, matchesView: String,
      winnerCol: String, loserCol: String, iters: Int,
      outView: String): Unit =
    graft.operators.Preference.bradleyTerry(s.table(matchesView),
        winnerCol, loserCol, iters)
      .createOrReplaceTempView(outView)

  def registerPackContiguous(s: SparkSession, rowsView: String,
      nTokensCol: String, seqLen: Long, outView: String,
      orderCol: String): Unit =
    graft.operators.SequencePack.packContiguous(s.table(rowsView),
        nTokensCol, seqLen, orderCol)
      .createOrReplaceTempView(outView)

  /** Content-defined chunks over a document view →
    * `outView(doc, chunk_idx, n_tokens, chunk_text, chunk_md5)`
    * ([[graft.operators.CdcChunking.chunks]] — boundaries are a pure
    * function of local content, so shifted duplicates share chunks).
    */
  def registerCdcChunks(s: SparkSession, docsView: String, idCol: String,
      textCol: String, w: Int, divisor: Int, outView: String): Unit =
    graft.operators.CdcChunking.chunks(s.table(docsView), textCol, idCol,
        w, divisor)
      .createOrReplaceTempView(outView)

  /** T5 span-corruption pairs over a document view →
    * `outView(doc_id, input_text, target_text, n_noise, n_spans)`
    * ([[graft.operators.SpanCorrupt.pairs]] — deterministic Bernoulli
    * mask, order-free span assembly).
    */
  def registerSpanCorruption(s: SparkSession, docsView: String,
      idCol: String, textCol: String, noisePct: Int, outView: String): Unit =
    graft.operators.SpanCorrupt.pairs(s.table(docsView), textCol, idCol,
        noisePct)
      .createOrReplaceTempView(outView)

  /** Per-epoch deterministic training order over a rows view →
    * `outView(epoch, idCol, shard, ord)`
    * ([[graft.operators.CorpusPrep.epochOrder]] — every epoch a fresh
    * seedless reshuffle, resumable mid-epoch).
    */
  def registerEpochOrder(s: SparkSession, rowsView: String, idCol: String,
      epochs: Int, shards: Int, outView: String): Unit =
    graft.operators.CorpusPrep.epochOrder(s.table(rowsView), idCol,
        epochs, shards)
      .createOrReplaceTempView(outView)

  /** Mergeable deterministic quantile estimates over a rows view →
    * `outView(…groupCols, q_ppm, n_sample, est)` — the
    * [[graft.operators.QuantileSketch]] bottom-k-by-md5 row sample,
    * sketched then read in one registration (the sketch itself stays a
    * composable intermediate; persist it to roll up forever).
    */
  def registerQuantiles(s: SparkSession, rowsView: String,
      groupCols: Seq[String], valueCol: String, idCol: String, k: Int,
      qPpms: Seq[Long], outView: String): Unit =
    graft.operators.QuantileSketch.quantiles(
        graft.operators.QuantileSketch.sketch(s.table(rowsView), groupCols,
          valueCol, idCol, k),
        groupCols, qPpms)
      .createOrReplaceTempView(outView)
}
