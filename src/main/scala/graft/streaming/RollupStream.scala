package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{DurableIters, IncrementalAgg}

/** Continuous rollup maintenance from an append stream — the streaming
  * half of [[graft.operators.IncrementalAgg]]: each micro-batch folds
  * into a durable partial-aggregate state table (count / decimal sum /
  * min / max per key) with `applyDelta`, so the serving query reads a
  * keys-sized table instead of rescanning history. RollupStreamSpec
  * pins the invariant: after any number of micro-batches, the
  * maintained state equals `IncrementalAgg.fit` over all rows so far.
  *
  * Durability/exactly-once: the same [[DurableIters]] versioned-
  * snapshot discipline as [[ScdStream]] — a batch merges FROM the
  * latest snapshot with id strictly below its own and overwrites its
  * own version directory idempotently, so sink replays after a crash
  * cannot double-count a batch (spec-pinned). Because the combiners
  * are commutative and associative, the result is also independent of
  * how rows were packed into batches.
  *
  * State size is |keys|, not |rows| — the rollup's group-by columns
  * bound it, which is what makes this viable forever on an unbounded
  * stream (no watermark needed: the state IS the aggregate, not
  * buffered rows).
  */
object RollupStream {

  /** Fold one micro-batch of raw rows into the versioned state.
    * Exposed for tests and batch backfill (call with increasing ids).
    */
  def applyBatch(batch: DataFrame, stateDir: String, batchId: Long,
      keyCols: Seq[String], valueCol: String): Unit = {
    val spark = batch.sparkSession
    val merged = DurableIters.latest(spark, stateDir, upTo = batchId - 1) match {
      case Some((_, state)) =>
        IncrementalAgg.applyDelta(state, batch, keyCols, valueCol)
      case None =>
        IncrementalAgg.fit(batch, keyCols, valueCol)
    }
    DurableIters.save(merged, stateDir, batchId)
    ()
  }

  /** Start the maintenance stream over a streaming row frame. */
  def maintain(rows: DataFrame, stateDir: String, checkpointDir: String,
      keyCols: Seq[String], valueCol: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), stateDir, batchId, keyCols, valueCol)
      }
      .start()
}
