package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Releases the storage behind a `localCheckpoint`ed Dataset.
  *
  * `Dataset.unpersist` only talks to the CacheManager (`.cache`/
  * `.persist` entries); a local checkpoint is an RDD-level persist
  * hanging off the plan's `LogicalRDD` leaf, which the CacheManager
  * never sees — so iterative algorithms that re-checkpoint per round
  * (connected components, embedding training) would pin every
  * superseded round's blocks until the context cleaner happens to GC
  * them. This walks the logical plan and unpersists the backing RDDs
  * directly. Safe ONLY once the checkpointed data is truly dead: the
  * lineage was truncated, so the Dataset cannot be recomputed after.
  */
object CheckpointShim {
  def freeLocalCheckpoint(ds: Dataset[_], blocking: Boolean = false): Unit =
    ds.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking)
      case _ => ()
    }
}
