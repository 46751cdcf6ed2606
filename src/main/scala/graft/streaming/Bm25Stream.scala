package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{DurableIters, Retrieval}

/** Continuous maintenance of the BM25 postings index — the streaming
  * half of `bm25_batch_topk`: each arriving document batch appends its
  * (doc_id, t, tf) postings ([[Retrieval.postingsOf]]) to the durable
  * index, and retrieval reads score from the MAINTAINED index — df,
  * document lengths, and avgdl all derive from the postings themselves,
  * so no side statistics can drift out of sync. Documents never span
  * batches, so append IS the merge (exact by construction);
  * `bm25_maintained` proves maintained ≡ one-shot BY the oracle, which
  * scores from the raw text directly. Versioned [[DurableIters]]
  * snapshots make a crash-replayed batch recompute from the prior
  * state instead of double-appending — the discipline shared with
  * [[WinnowStream]] / [[JoinStream]].
  */
object Bm25Stream {

  /** Fold one micro-batch of documents into the postings index. */
  def applyBatch(batch: DataFrame, textCol: String, idCol: String,
      indexDir: String, batchId: Long): Unit = {
    val prev = DurableIters.latest(batch.sparkSession, indexDir,
      upTo = batchId - 1).map(_._2)
    val delta = Retrieval.postingsOf(batch, idCol, textCol)
    val merged = prev match {
      case Some(p) => p.unionByName(delta)
      case None => delta
    }
    DurableIters.save(merged, indexDir, batchId)
    ()
  }

  /** Start the maintenance stream over a document source. */
  def maintain(docs: DataFrame, textCol: String, idCol: String,
      indexDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          applyBatch(batch.toDF(), textCol, idCol, indexDir, batchId)
      }
      .start()

  /** The latest maintained postings index. */
  def index(spark: SparkSession, indexDir: String): DataFrame =
    DurableIters.latest(spark, indexDir)
      .getOrElse(throw new IllegalStateException(
        s"no postings index under $indexDir"))._2

  /** BM25 top-k reads against the maintained index. */
  def topK(spark: SparkSession, indexDir: String, queries: DataFrame,
      k: Int): DataFrame =
    Retrieval.scorePostings(index(spark, indexDir), queries, k)
}
