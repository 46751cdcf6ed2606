package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the corpus-prep step that turns a
  * document table into fixed-length training sequences: documents are
  * laid end-to-end in a deterministic order and cut into `seqLen`-token
  * sequences, a document spilling across a boundary when it must (the
  * GPT-style packed-pretraining layout: zero padding waste, every
  * sequence exactly full). The output tells a shard writer, for every
  * document, WHERE it lands: global start offset, first sequence id,
  * offset within that sequence, and how many sequences it spans.
  *
  * Reference scope: none — this is part of the training-data-pipeline
  * extension surface (corpus layout family) this engine adds.
  *
  * Scale shape: the global running total comes from [[PrefixSum]]
  * (range-sort + two scans, driver state ∝ partition count) — never a
  * partitionless window — and everything after it is per-row integer
  * arithmetic inside whole-stage codegen. Deterministic: the layout is
  * a pure function of the order key, so any engine replays it exactly.
  */
object SequencePack {

  /** Pack rows into `seqLen`-token sequences in (orderCols) order.
    * Adds: `start_tok` (0-based global token offset), `seq_id` (first
    * sequence the row occupies), `seq_offset` (token offset within that
    * sequence), `n_seqs` (sequences the row touches). Rows must carry a
    * positive LongType token count in `nTokensCol` — a zero-token row
    * occupies no span and would make `n_seqs` meaningless.
    */
  def packContiguous(df: DataFrame, nTokensCol: String, seqLen: Long,
      orderCols: String*): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1; got $seqLen")
    require(orderCols.nonEmpty, "packing needs a deterministic order key")
    val cum = PrefixSum.withRunningTotal(
      df.where(col(nTokensCol) > 0), nTokensCol, "__end", orderCols: _*)
    cum
      .withColumn("start_tok", col("__end") - col(nTokensCol))
      .withColumn("seq_id", expr(s"start_tok div ${seqLen}L"))
      .withColumn("seq_offset", col("start_tok") % seqLen)
      .withColumn("n_seqs",
        expr(s"(__end - 1) div ${seqLen}L") - col("seq_id") + lit(1L))
      .drop("__end")
  }

  /** The shard-writer's census over a packed layout: one row per
    * sequence that STARTS a document run — how many documents begin in
    * each sequence and the boundary-spanning count. (A reader fleet
    * provisions from this: sequences with zero document starts are
    * pure continuation payload.)
    */
  def seqCensus(packed: DataFrame): DataFrame =
    packed.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_doc_starts"),
        sum(when(col("n_seqs") > 1, 1L).otherwise(0L)).as("n_spanning"))
}
