package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}
import org.apache.spark.storage.StorageLevel

/** Distributed inclusive prefix sum — running totals WITHOUT the
  * partitionless Window this repo bans (a global-ORDER window funnels
  * every row through ONE task; the round-1 scale-killer PlanSpec's
  * global sweep exists to keep out).
  *
  * The classic two-pass formulation instead: range-partition-sort by
  * the order key, reduce each partition to its local sum (ONE long per
  * partition to the driver — the Lloyd-state discipline, state ∝
  * partition count, never rows), scan those into per-partition start
  * offsets, broadcast, and stream each partition once adding its
  * offset. Work is 2 scans + a partition-count-sized driver array at
  * ANY input size; the [[DenseId]] precedent for justified RDD use
  * (genuinely per-partition imperative logic).
  *
  * Determinism matches [[DenseId.withOrderedId]]: remaining orderable
  * columns are appended to the sort key, so ties still order stably
  * across recomputations as long as the orderable projection of each
  * row is distinct. Null values in `valueCol` contribute 0.
  */
object PrefixSum {

  /** `df` + `cumCol` = inclusive running total of `valueCol` (must be
    * LongType) over (ORDER BY orderCols).
    */
  def withRunningTotal(df: DataFrame, valueCol: String, cumCol: String,
      orderCols: String*): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be bigint; cast first (got ${df.schema(valueCol).dataType})")
    val tiebreak = df.schema.fields
      .filterNot(f => orderCols.contains(f.name))
      .filter(f => RowOrdering.isOrderable(f.dataType))
      .map(f => col(f.name))
    val sorted = df.orderBy(orderCols.map(col) ++ tiebreak: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
        Iterator((i, s))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = spark.sparkContext.broadcast(partSums.scanLeft(0L)(_ + _))
      val schema = sorted.schema.add(StructField(cumCol, LongType, nullable = false))
      val out = rdd.mapPartitionsWithIndex { (i, it) =>
        var s = offsets.value(i)
        it.map { r =>
          if (!r.isNullAt(vIdx)) s += r.getLong(vIdx)
          Row.fromSeq(r.toSeq :+ s)
        }
      }
      spark.createDataFrame(out, schema).localCheckpoint(eager = true)
    } finally rdd.unpersist(blocking = false)
  }
}
