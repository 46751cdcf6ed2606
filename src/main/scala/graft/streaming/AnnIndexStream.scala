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
}
