package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/** Continuous maintenance of an IVF-PQ ANN index over an embedding
  * stream — the ingest half of the retrieval stack ([[graft.operators
  * .SimilaritySearch.knnJoinIvfPq]] is the query half). Production
  * vector stores work exactly this way: the quantizers (coarse
  * centroids + PQ codebooks) are FIT OFFLINE on a bounded sample and
  * refreshed rarely; the high-volume path only APPLIES them — assign
  * the arriving vector's cell, encode its residual to m small ints,
  * append (id, cell, pq_code) to the cell-partitioned code table. That
  * application is stateless projection (literal centroid tables +
  * codegen'd expressions, no per-key state, no shuffle), so the same
  * function body serves batch backfill and the 24/7 stream — the
  * batch ≡ stream equivalence is asserted literally in
  * AnnIndexStreamSpec, and exactly-once hinges only on the sink's
  * idempotence plus the optional watermarked dedup below.
  */
object AnnIndexStream {

  /** The index row for every input vector: `(idCol, cell, pq_code)` —
    * coarse cell by nearest-centroid, codes by residual PQ. Stateless,
    * so it accepts a batch OR streaming frame unchanged; write the
    * result partitioned by `cell` and the probe join of
    * [[SimilaritySearch.knnJoinIvfPq]] becomes partition pruning over
    * the maintained table.
    */
  def indexRows(vectors: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[(Int, Seq[Double])],
      codebooks: Seq[Seq[(Int, Seq[Double])]]): DataFrame =
    SimilaritySearch.pqEncode(
      SimilaritySearch.cellResiduals(
        vectors.select(col(idCol), col(vecCol).as("__v")), "__v", centroids),
      "__resid", codebooks)
      .select(col(idCol), col("cell"), col("pq_code"))

  /** Streaming form with at-most-once index rows per vector id inside
    * the watermark horizon: re-delivered ids (source retries, upstream
    * replays) are dropped by id with bounded state —
    * `dropDuplicatesWithinWatermark` keeps an id's fingerprint only
    * until the watermark passes it, so state size follows the horizon,
    * not the stream's lifetime. `tsCol` is the vector's event/ingest
    * time column used for the watermark.
    */
  def indexRowsDeduped(vectors: DataFrame, vecCol: String, idCol: String,
      tsCol: String, watermark: String,
      centroids: Seq[(Int, Seq[Double])],
      codebooks: Seq[Seq[(Int, Seq[Double])]]): DataFrame =
    indexRows(
      vectors.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(idCol),
      vecCol, idCol, centroids, codebooks)

  /** Per-cell residual statistics of `vectors` under the coarse
    * quantizer: `(cell, n, mean_resid_norm)` — how far the cell's
    * members sit from their centroid, on average. Run once on the FIT
    * sample to freeze the baseline, then periodically on fresh arrivals;
    * [[quantizerDrift]] compares the two. One aggregate pass, group
    * state is two scalars per cell. On a stream, apply the same body per
    * micro-batch (`foreachBatch`) or swap the groupBy for a windowed
    * aggregation — the metric is an ordinary mergeable mean.
    */
  def residualStats(vectors: DataFrame, vecCol: String,
      centroids: Seq[(Int, Seq[Double])]): DataFrame =
    SimilaritySearch.cellResiduals(
      vectors.select(col(vecCol).as("__v")), "__v", centroids)
      .select(col("cell"),
        graft.functions.VectorOps.l2Norm(col("__resid")).as("__rn"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), avg(col("__rn")).as("mean_resid_norm"))

  /** The REFIT TRIGGER for the streaming index's offline-fitted
    * quantizers: [[indexRows]] applies fit-time centroids forever, so a
    * drifted embedding distribution silently degrades recall (vectors
    * land in cells whose centroid no longer represents them, residuals
    * grow, the PQ codebooks resolve less of the distance). This joins
    * the current window's [[residualStats]] against the fit-time
    * baseline per cell: `drift_ratio` = current/fit mean residual norm,
    * and `refit` flags a cell whose ratio exceeds `threshold` (or that
    * the fit never saw members of). Operational contract: when flagged
    * cells hold a meaningful share of current `n`, refit both quantizers
    * on a fresh sample and rebuild the code table — the index rows are a
    * pure function of (vectors, quantizers), so a rebuild is one batch
    * [[indexRows]] pass, not a stateful migration. Both stats frames are
    * cell-count-sized: the join is trivially broadcast.
    */
  def quantizerDrift(current: DataFrame, baseline: DataFrame,
      threshold: Double = 1.25): DataFrame = {
    require(threshold > 0, s"need threshold > 0, got $threshold")
    current.select(col("cell"), col("n"),
        col("mean_resid_norm").as("current_norm"))
      .join(broadcast(baseline.select(col("cell"),
        col("mean_resid_norm").as("fit_norm"))), Seq("cell"), "left")
      .withColumn("drift_ratio", col("current_norm") / col("fit_norm"))
      .withColumn("refit",
        col("fit_norm").isNull || col("drift_ratio") > lit(threshold))
  }
}
