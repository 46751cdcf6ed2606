package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField}

/** Scale-safe dense id assignment — the replacement for the
  * `row_number() OVER (ORDER BY …)` anti-pattern: a partitionless Window
  * moves the ENTIRE dataset onto one partition to sort it, which is fine
  * for a vocabulary but fatal for a 100 TB node set. Here the sort is a
  * normal range-partitioned global sort (every partition stays parallel)
  * and the 0-based index comes from `zipWithIndex`, whose per-partition
  * offsets cost one extra lightweight count job — no single-partition
  * stage anywhere.
  *
  * Matches the reference's dense 0-based ids from
  * `np.unique(..., return_inverse=True)` (samples.py:45-47) and the
  * dictionary's insertion-order ids (utils.py:144-153) — deterministic
  * because callers order by a unique key set.
  */
object DenseId {

  /** `df` + a new `idCol` = row_number over (ORDER BY orderCols) − 1,
    * computed without a partitionless WindowExec. Rows with equal order
    * keys get arbitrary-but-deterministic relative ids (same caveat as
    * row_number); callers use unique keys.
    */
  def withOrderedId(df: DataFrame, idCol: String, orderCols: String*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols.map(col): _*)
    val schema = sorted.schema.add(StructField(idCol, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }
}
