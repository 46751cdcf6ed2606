package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField}
import org.apache.spark.storage.StorageLevel

/** Scale-safe dense id assignment — the replacement for the
  * `row_number() OVER (ORDER BY …)` anti-pattern: a partitionless Window
  * moves the ENTIRE dataset onto one partition to sort it, which is fine
  * for a vocabulary but fatal for a 100 TB node set. Here the sort is a
  * normal range-partitioned global sort (every partition stays parallel)
  * and the 0-based index comes from `zipWithIndex`, whose per-partition
  * offsets cost one extra lightweight count job — no single-partition
  * stage anywhere.
  *
  * The sorted lineage is persisted before `zipWithIndex` fires its offset
  * job and the indexed result is materialized once via an eager
  * `localCheckpoint`, so the global sort (and everything upstream of it)
  * executes exactly once no matter how many times the result is consumed;
  * the temporary cache is dropped before returning. The id table is
  * therefore EAGER by construction — `zipWithIndex` must see final
  * partition sizes — which also means consumers (count, broadcast, reuse
  * in several branches) read cheap checkpointed blocks. localCheckpoint
  * blocks are not executor-loss-resilient; pipelines that need a durable
  * id table write it to parquet (see EmbeddingStore / Lifecycles).
  *
  * Matches the reference's dense 0-based ids from
  * `np.unique(..., return_inverse=True)` (samples.py:45-47) and the
  * dictionary's insertion-order ids (utils.py:144-153).
  */
object DenseId {

  /** `df` + a new `idCol` = row_number over (ORDER BY orderCols) − 1,
    * computed without a partitionless WindowExec. The remaining
    * ORDERABLE columns are appended to the sort key as a deterministic
    * tiebreaker, so rows with equal order keys still get stable ids
    * across recomputations (cache eviction, speculative re-runs) as long
    * as the orderable projection of each row is distinct. Non-orderable
    * columns (maps) ride along unsorted — a frame whose only
    * distinguishing column is a map keeps ties nondeterministic, as any
    * ORDER BY would.
    */
  def withOrderedId(df: DataFrame, idCol: String, orderCols: String*): DataFrame = {
    val spark = df.sparkSession
    val tiebreak = df.schema.fields
      .filterNot(f => orderCols.contains(f.name))
      .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType))
      .map(f => col(f.name))
    val sorted = df.orderBy(orderCols.map(col) ++ tiebreak: _*)
    val sortedRdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val schema = sorted.schema.add(StructField(idCol, LongType, nullable = false))
      val indexed = sortedRdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ i)
      }
      spark.createDataFrame(indexed, schema).localCheckpoint(eager = true)
    } finally sortedRdd.unpersist(blocking = false)
  }
}
