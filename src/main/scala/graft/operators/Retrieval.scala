package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Batch lexical retrieval: a QUERY SET scored against a corpus through
  * the inverted index — the "find supporting passages for every training
  * example" shape a RAG-curation pipeline runs at corpus scale, where
  * per-query loops are a non-starter.
  *
  * Scale shape: postings prune to the query VOCABULARY before anything
  * joins (a million queries share a few thousand distinct terms, so the
  * pruned tf table is corpus-postings-for-those-terms, not the corpus);
  * the query⋈postings equi-join on the term key is the only fan-out,
  * bounded by Σ_t df(t) over query terms; df/avgdl ride in as broadcast
  * scalars; and the per-query top-k is a query-partitioned rank window —
  * Catalyst plans map-side WindowGroupLimit, so at most k rows per
  * (partition, query) reach the shuffle. BM25 terms snap to
  * DECIMAL(20,8) (the text_entropy libm rule) so scores — and therefore
  * RANKS — are aggregation-order-independent and replay exactly in SQL.
  */
object Retrieval {

  /** Top-`k` corpus documents per query by BM25 (k1 = 1.2, b = 0.75 —
    * the text_bm25 constants). `corpus` is (idCol, textCol); `queries`
    * is (queryIdCol, queryTextCol). Output = (query_id, doc_id, rank,
    * bm25), rank 1-based by (score desc, doc_id asc).
    */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id",
      queryTextCol: String = "qtext"): DataFrame = {
    // persist the POSTINGS index, not the raw token stream: the index
    // is what both consumers (the query-vocabulary tf prune and the
    // doc-length aggregate) actually read, it is never larger than the
    // exploded tokens, and caching it runs the tokenize+count shuffle
    // ONCE — caching `toks` instead (the pre-r16 shape) still paid that
    // shuffle once per consumer. This is the same index PRF persists;
    // its sf1 win over the inline shape motivated the change.
    val postings = postingsOf(corpus, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val result = scorePostings(postings, queries, k,
      queryIdCol, queryTextCol).localCheckpoint(true)
    postings.unpersist(false)
    result
  }

  /** The full tokenizer pass as a persistable index: (doc_id, t, tf)
    * rows — `scorePostings(postings(text), q, k) ≡ bm25TopK(text, q, k)`
    * by construction, which is what lets a streaming pipeline MAINTAIN
    * the index (append per-document batches) instead of rebuilding it.
    */
  def postingsOf(corpus: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    corpus
      .select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("t"))
      .where(col("t") =!= "")
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))

  /** BM25 top-`k` per query over a stored postings index (doc_id, t,
    * tf). Document length, df, and avgdl all derive FROM the index
    * (dl = Σ tf per doc), so a maintained index needs no side stats.
    */
  def scorePostings(postings: DataFrame, queries: DataFrame, k: Int,
      queryIdCol: String = "query_id",
      queryTextCol: String = "qtext"): DataFrame = {
    val qt = queries
      .select(col(queryIdCol).as("query_id"),
        explode(TextOps.tokens(col(queryTextCol))).as("t"))
      .where(col("t") =!= "").distinct()
    scoreTermRows(postings, qt, k)
  }

  /** The scoring core against an explicit (query_id, t) term-row frame —
    * the entry point query EXPANSION uses (an expanded query is extra
    * term rows, not new text).
    */
  def scoreTermRows(postings: DataFrame, qt: DataFrame, k: Int): DataFrame =
    scoreTermRows(postings, qt, k,
      postings.groupBy(col("doc_id")).agg(sum(col("tf")).as("len")))

  /** Same, with the (doc_id, len) document-length frame precomputed —
    * a multi-pass caller (PRF) derives `dl` from the index ONCE and
    * reuses it, instead of re-aggregating the postings per pass.
    */
  def scoreTermRows(postings: DataFrame, qt: DataFrame, k: Int,
      dl: DataFrame): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    rankScores(termScores(postings, qt, dl), k)
  }

  /** The per-(query, doc) partial BM25 sums for a (query_id, t) term
    * set — scoring WITHOUT the final rank cut. Partial sums over
    * disjoint term sets ADD: each term's DECIMAL-snapped contribution
    * depends only on global index statistics (df counts docs per term,
    * dl/avgdl/n_docs come from the index), never on which other terms
    * the query carries — so an expanded query's scores are the base
    * partials plus the expansion terms' partials, no re-scoring.
    */
  private def termScores(postings: DataFrame, qt: DataFrame,
      dl: DataFrame): DataFrame = {
    val stats = dl.agg(avg(col("len")).as("avgdl"),
      count(lit(1)).as("n_docs"))
    // postings restricted to the query vocabulary FIRST — df per term is
    // unchanged by the restriction (it counts docs per term), and the
    // scored join never touches a term no query asked about
    val tf = postings.join(broadcast(qt.select(col("t")).distinct()), Seq("t"))
    val dft = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    qt
      .join(tf, Seq("t"))
      .join(broadcast(dft), Seq("t"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5))))
      .withColumn("term",
        (col("idf") * ((col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75)
            + lit(0.75) * col("len") / col("avgdl")))))
          .cast("decimal(20,8)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term")).as("__sd"))
  }

  /** The per-query rank cut over (query_id, doc_id, __sd) partials. */
  private def rankScores(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sd").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"),
        round(col("__sd").cast("double"), 4).as("bm25"))
  }

  /** Two-pass retrieval with pseudo-relevance feedback (RM3-lite): pass
    * one retrieves `fbDocs` feedback documents per query; their heaviest
    * non-query terms (Σ tf across the feedback set, `expTerms` per
    * query, t-asc tiebreak) join the term set; pass two scores the
    * expanded query. Fully deterministic and index-local — expansion
    * reads the feedback docs' POSTINGS, never the corpus — so both
    * passes replay exactly in SQL.
    *
    * `maxDfPermille` caps expansion-term document frequency at
    * df/n_docs ≤ maxDfPermille/1000: PRF selects the HEAVIEST feedback
    * terms by construction, so without a df cap pass two joins the
    * corpus's largest posting lists (stopword-grade terms that carry
    * near-zero idf anyway). The cap is integer arithmetic
    * (df·1000 ≤ n_docs·permille) so the boundary replays bit-exactly
    * in any engine. Original query terms are never capped — only
    * expansion candidates.
    */
  def bm25PrfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      fbDocs: Int = 3, expTerms: Int = 2, maxDfPermille: Int = 200,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id",
      queryTextCol: String = "qtext"): DataFrame = {
    require(fbDocs >= 1 && expTerms >= 0,
      s"need fbDocs >= 1, expTerms >= 0; got $fbDocs/$expTerms")
    require(maxDfPermille >= 1 && maxDfPermille <= 1000,
      s"maxDfPermille must be in [1, 1000]; got $maxDfPermille")
    val postings = postingsOf(corpus, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // document lengths derived from the index ONCE, shared by both
    // scoring passes (each pass previously re-aggregated the postings)
    val dl = postings.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qt1 = queries
      .select(col(queryIdCol).as("query_id"),
        explode(TextOps.tokens(col(queryTextCol))).as("t"))
      .where(col("t") =!= "").distinct()
    // pass 1 partial sums are persisted because pass 2 REUSES them:
    // per-term contributions depend only on global index stats, so the
    // expanded query's scores = these partials + the expansion terms'
    // partials — the corpus is scored against the base query ONCE
    val scored1 = termScores(postings, qt1, dl)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // cand is QUERY-SET-sized (each query's feedback docs' vocabulary)
    // and its lineage contains the whole pass-1 rank job — it feeds
    // BOTH the df-count branch and the capped selection below, so cut
    // the lineage here or that job runs once per consumer
    val cand = rankScores(scored1, fbDocs)
      .select(col("query_id"), col("doc_id"))
      .join(postings, Seq("doc_id"))
      .groupBy(col("query_id"), col("t")).agg(sum(col("tf")).as("__w"))
      .join(qt1, Seq("query_id", "t"), "left_anti")
      .localCheckpoint(true)
    // df cap: candidate-term df is counted over postings restricted to
    // the candidate vocabulary (a broadcast of the feedback docs' terms),
    // so the cap never scans posting lists it is about to discard
    val nDocs = dl.agg(count(lit(1)).as("n_docs"))
    val candTerms = cand.select(col("t")).distinct()
    val dfc = postings.join(broadcast(candTerms), Seq("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("__cdf"))
    val capped = cand.join(broadcast(dfc), Seq("t"))
      .crossJoin(broadcast(nDocs))
      .where(col("__cdf") * lit(1000L)
        <= col("n_docs") * lit(maxDfPermille.toLong))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__w").desc, col("t").asc)
    val exp = capped.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= expTerms)
      .select(col("query_id"), col("t"))
    // exp is anti-joined against qt1 above, so the term sets are
    // disjoint and the partials add without double counting
    val scored2 = scored1.unionByName(termScores(postings, exp, dl))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__sd")).as("__sd"))
    val result = rankScores(scored2, k).localCheckpoint(true)
    postings.unpersist(false)
    dl.unpersist(false)
    scored1.unpersist(false)
    result
  }

  /** Reciprocal-rank fusion of a lexical hit list (query_id, doc_id,
    * rank) and a dense hit list (query_id, neighbor_id, rank):
    * rrf = Σ 1/(c + rank) over the lists a document appears in, top-`k`
    * per query — the standard hybrid-retrieval combiner (Cormack et al.
    * SIGIR'09), score-scale-free because it fuses RANKS. Both inputs
    * are already k-bounded per query, so the full-outer join and the
    * rank window touch ≤ 2k rows per query — fusion cost follows the
    * QUERY count, never the corpus.
    */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int,
      c: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    val l = lex.select(col("query_id"), col("doc_id"),
      col("rank").as("__lr"))
    val d = dense.select(col("query_id"),
      col("neighbor_id").as("doc_id"), col("rank").as("__dr"))
    val fused = l.join(d, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col("__lr")), lit(0.0))
          + coalesce(lit(1.0) / (lit(c) + col("__dr")), lit(0.0)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"),
        round(col("rrf"), 6).as("rrf"))
  }
}
