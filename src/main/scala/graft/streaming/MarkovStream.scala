package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.DurableIters

/** Continuous Markov transition-matrix maintenance from an append
  * stream — the streaming half of the `event_markov` query: the live
  * "where do users go from X" table without ever re-scanning history.
  *
  * Two pieces of durable state, both dimension-sized:
  *  - transition counts (src, dst, n) — additive, merged per batch;
  *  - the last event per user (user_id, last_type, last_us) — carried
  *    so a user's sequence that straddles a micro-batch boundary still
  *    produces its boundary transition (within-batch pairs alone would
  *    silently drop one transition per user per batch).
  *
  * Exactly-once on replay, the [[MomentsStream]]/[[RollupStream]]
  * discipline: a batch merges FROM the latest snapshots with id
  * strictly below its own and overwrites its own version directories
  * idempotently (the [[DurableIters]] contract) — a crash-retried
  * batch cannot double-count, and both state dirs re-save under the
  * same version so a crash BETWEEN the two saves is also healed by
  * the retry. Because counts are exact integers, the maintained table
  * is bit-identical to the one-shot lead-window computation over all
  * rows so far, independent of batch packing (MarkovStreamSpec pins
  * it). Input contract: each user's events arrive in (ts, id) order
  * across batches — the append-log replay shape; an out-of-order feed
  * needs a watermarked reorder upstream.
  */
object MarkovStream {

  /** Fold one micro-batch (user_id, event_type, ts_us, event_id) into
    * the versioned state. Exposed for tests and batch backfill.
    */
  def applyBatch(batch: DataFrame, countsDir: String, lastDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prevCounts = DurableIters.latest(spark, countsDir, upTo = batchId - 1)
      .map(_._2)
    val prevLast = DurableIters.latest(spark, lastDir, upTo = batchId - 1)
      .map(_._2)
    val e = batch.select(col("user_id"), col("event_type"),
      col("ts_us").cast("long").as("ts_us"), col("event_id"))
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val withPrev = e
      .withColumn("__prev", lag(col("event_type"), 1).over(byTime))
      .withColumn("__rn", row_number().over(byTime))
    val intra = withPrev.where(col("__prev").isNotNull)
      .select(col("__prev").as("src"), col("event_type").as("dst"))
    val boundary = prevLast match {
      case Some(pl) => withPrev.where(col("__rn") === 1)
        .join(pl.select(col("user_id"), col("last_type")), Seq("user_id"))
        .select(col("last_type").as("src"), col("event_type").as("dst"))
      case None => intra.where(lit(false))
    }
    val delta = intra.unionByName(boundary)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    val counts = prevCounts match {
      case Some(pc) => pc.unionByName(delta)
        .groupBy(col("src"), col("dst")).agg(sum(col("n")).as("n"))
      case None => delta
    }
    val newestFirst = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val batchLast = e.withColumn("__r", row_number().over(newestFirst))
      .where(col("__r") === 1)
      .select(col("user_id"), col("event_type").as("last_type"),
        col("ts_us").as("last_us"))
    val newLast = prevLast match {
      case Some(pl) => pl
        .join(batchLast.select(col("user_id")), Seq("user_id"), "left_anti")
        .unionByName(batchLast)
      case None => batchLast
    }
    DurableIters.save(counts, countsDir, batchId)
    DurableIters.save(newLast, lastDir, batchId)
    ()
  }

  /** Start the maintenance stream over a streaming frame with columns
    * (user_id, event_type, ts_us, event_id).
    */
  def maintain(rows: DataFrame, countsDir: String, lastDir: String,
      checkpointDir: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(batch.toDF(), countsDir, lastDir, batchId)
      }
      .start()

  /** The live transition table from the latest maintained counts, in
    * the `event_markov` output shape (src, dst, n, n_src, p_ppm).
    */
  def transitions(spark: SparkSession, countsDir: String): DataFrame = {
    val counts = DurableIters.latest(spark, countsDir)
      .getOrElse(throw new IllegalStateException(
        s"no transition state under $countsDir"))._2
    val totals = counts.groupBy(col("src")).agg(sum(col("n")).as("n_src"))
    counts.join(totals, Seq("src"))
      .select(col("src"), col("dst"), col("n"), col("n_src"),
        expr("n * 1000000L DIV n_src").as("p_ppm"))
  }
}
