package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{DurableIters, Sketches}

/** Continuous own-HLL maintenance from an append stream — live distinct
  * counts per group without re-scanning history, with the whole
  * pipeline hash-gated (unlike [[KmvStream]]'s md5 sketch this one's
  * registers replay in SQL via the XxSql hashLong unroll; see
  * `distinct_hll_replay`).
  *
  * The merge IS the HLL mergeability law ([[Sketches.hllLongMerge]]):
  * a register only ever grows, so max-merging batch register frames is
  * LOSSLESS — the maintained table is bit-identical to the one-shot
  * sketch over all rows so far whatever the batch packing
  * (`hll_maintained` proves it BY the oracle — same replay SQL as the
  * one-shot query). Exactly-once via the versioned [[DurableIters]]
  * discipline shared with [[CmsStream]]/[[KmvStream]]: merge FROM
  * snapshots strictly below the batch id, overwrite idempotently.
  * State is ≤ groups·2^p rows — constant per group forever.
  */
object HllStream {

  /** Fold one micro-batch of (group, key) rows into the registers. */
  def applyBatch(batch: DataFrame, keyCol: String, groupCol: String,
      p: Int, stateDir: String, batchId: Long): Unit = {
    val prev = DurableIters.latest(batch.sparkSession, stateDir,
      upTo = batchId - 1).map(_._2)
    val delta = Sketches.hllLongFit(batch, keyCol, groupCol, p)
    val merged = prev match {
      case Some(pr) => Sketches.hllLongMerge(pr, delta, Seq(groupCol))
      case None => delta
    }
    DurableIters.save(merged, stateDir, batchId)
    ()
  }

  /** Start the maintenance stream over (group, key) rows. */
  def maintain(rows: DataFrame, keyCol: String, groupCol: String, p: Int,
      stateDir: String, checkpointDir: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), keyCol, groupCol, p, stateDir,
          batchId)
      }
      .start()

  /** Live distinct estimates from the latest maintained registers. */
  def estimates(spark: SparkSession, stateDir: String, groupCol: String,
      p: Int): DataFrame = {
    val regs = DurableIters.latest(spark, stateDir)
      .getOrElse(throw new IllegalStateException(
        s"no HLL state under $stateDir"))._2
    Sketches.hllLongEstimate(regs, Seq(groupCol), p)
  }
}
