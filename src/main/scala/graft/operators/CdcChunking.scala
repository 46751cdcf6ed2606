package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Content-defined chunking (CDC) over the word stream of each document —
  * the storage-dedup technique (Muthitacharoen et al., LBFS SOSP'01;
  * rsync's rolling checksum) applied to corpus prep: chunk boundaries are
  * a pure function of local CONTENT (a w-gram hash hitting 0 mod D), so a
  * duplicated passage produces the same chunks no matter where it sits in
  * a document. Fixed-size chunking misses every shifted duplicate; CDC
  * re-synchronizes one boundary after any insertion.
  *
  * Reference scope: none — the reference has no sub-document dedup.
  * CDC chunking is part of the training-data-pipeline extension
  * surface (dedup family) this engine adds beyond the reference.
  *
  * Scale shape: chunking is per-document column math — array expressions
  * inside whole-stage codegen, ZERO shuffles until the cross-corpus
  * chunk-hash aggregation, which is a map-side-partial count on a 48-bit
  * key. At 100 TB the chunk table is the only shuffled payload, and it
  * carries md5 fingerprints (16 bytes/chunk), not text.
  *
  * Determinism contract: the boundary draw is the shared md5-48 family
  * ([[graft.operators.KmvSketch.hash48]]), so a DuckDB oracle replays
  * boundaries, chunk texts, and fingerprints bit-exactly.
  */
object CdcChunking {

  /** Sorted 1-based token positions where chunks END: every position j
    * (j ≥ w) where hash48 of the w-gram ending at j ≡ 0 (mod divisor),
    * plus the document tail n. Expected chunk length ≈ divisor tokens.
    */
  def boundaries(toks: Column, w: Int, divisor: Int): Column = {
    val n = size(toks)
    // candidate gram starts i = 1..n-w+1 (the sequence stop is clamped to
    // ≥1 and the in-body guard re-checks, so a doc shorter than w tokens
    // yields no content boundary — just the tail)
    val cand = transform(
      sequence(lit(1), greatest(n - lit(w - 1), lit(1))),
      i => when((i + lit(w - 1) <= n) &&
          KmvSketch.hash48(concat_ws(" ", slice(toks, i, lit(w)))) % divisor === 0,
        (i + lit(w - 1)).cast("long")))
    array_sort(array_distinct(concat(
      filter(cand, x => x.isNotNull), array(n.cast("long")))))
  }

  /** (doc, chunk_idx, n_tokens, chunk_text, chunk_md5) — one row per CDC
    * chunk. chunk_idx is 1-based in document order; chunk_md5 is the md5
    * hex of the chunk text (the cross-corpus dedup key).
    */
  def chunks(df: DataFrame, textCol: String, idCol: String,
      w: Int = 4, divisor: Int = 8): DataFrame = {
    require(w >= 1 && divisor >= 2,
      s"need w >= 1 and divisor >= 2; got $w/$divisor")
    df.select(col(idCol).as("doc"), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("bnds", boundaries(col("toks"), w, divisor))
      .select(col("doc"), col("toks"), col("bnds"),
        posexplode(col("bnds")).as(Seq("k0", "fin")))
      .select(col("doc"), (col("k0") + 1).as("chunk_idx"),
        when(col("k0") === 0, lit(1L))
          .otherwise(element_at(col("bnds"), col("k0").cast("int")) + 1)
          .as("start"),
        col("fin"), col("toks"))
      .select(col("doc"), col("chunk_idx"),
        (col("fin") - col("start") + 1).as("n_tokens"),
        concat_ws(" ", slice(col("toks"), col("start").cast("int"),
          (col("fin") - col("start") + 1).cast("int"))).as("chunk_text"))
      .withColumn("chunk_md5", md5(col("chunk_text").cast("binary")))
  }

  /** Per-source boilerplate chunks (the C4/CCNet boilerplate rule lifted
    * from lines to CDC chunks): a chunk whose distinct-document frequency
    * within its source reaches `minDocs` is template text (headers,
    * navigation, legal footers), not content — report it with its
    * document fraction. Input: [[chunks]] rows joined back to a
    * (doc, source) frame. Aggregates run on fingerprints only.
    */
  def boilerplate(chunkRows: DataFrame, docSource: DataFrame,
      minDocs: Long = 3L): DataFrame = {
    val withSrc = chunkRows.join(docSource, Seq("doc"))
    val df = withSrc.groupBy(col("source"), col("chunk_md5"))
      .agg(countDistinct(col("doc")).as("doc_df"),
        max(col("n_tokens")).as("n_tokens"))
    val nDocs = docSource.groupBy(col("source"))
      .agg(countDistinct(col("doc")).as("n_docs"))
    df.where(col("doc_df") >= minDocs)
      .join(nDocs, Seq("source"))
      .select(col("source"), col("chunk_md5"), col("n_tokens"),
        col("doc_df"), col("n_docs"),
        round(col("doc_df") / col("n_docs"), 4).as("doc_frac"))
  }

  /** Per-document boilerplate-strip report: tokens before, tokens removed
    * (every instance of a boilerplate chunk), and the keep ratio. The
    * join runs on (source, chunk_md5) against the small boilerplate
    * frame — broadcast at any corpus size with a sane minDocs.
    */
  def stripReport(chunkRows: DataFrame, docSource: DataFrame,
      minDocs: Long = 3L): DataFrame = {
    val bp = boilerplate(chunkRows, docSource, minDocs)
      .select(col("source"), col("chunk_md5")).distinct()
    val withSrc = chunkRows.join(docSource, Seq("doc"))
    val removed = withSrc.join(broadcast(bp), Seq("source", "chunk_md5"))
      .groupBy(col("doc")).agg(sum(col("n_tokens")).as("n_removed"))
    val totals = chunkRows.groupBy(col("doc"))
      .agg(sum(col("n_tokens")).as("n_tokens"))
    totals.join(removed, Seq("doc"), "left")
      .select(col("doc"), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
      .withColumn("keep_ratio",
        round((col("n_tokens") - col("n_removed")) / col("n_tokens"), 4))
  }

  /** Corpus-level chunk-dedup report: one row — how many chunks, how many
    * unique, and the token fraction a chunk-store would save. The
    * aggregate runs over (chunk_md5, n_tokens) only; chunk text never
    * shuffles.
    */
  def dedupReport(chunkRows: DataFrame): DataFrame = {
    val per = chunkRows.groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("cnt"), max(col("n_tokens")).as("n_tok"))
    per.agg(
      sum(col("cnt")).as("n_chunks"),
      count(lit(1)).as("n_unique_chunks"),
      sum(col("cnt") * col("n_tok")).as("total_tokens"),
      sum(col("n_tok")).as("unique_tokens"))
      .withColumn("dup_token_ratio",
        round(lit(1.0) - col("unique_tokens") / col("total_tokens"), 4))
  }
}
