package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A12 — the reference's per-column statistics sweep
  * (preprocess.py:120-160 `pre_statistics` loops EVERY discrete/continue
  * column and draws a histogram per column; the data side of that plot
  * is a fixed-bin histogram per column).
  *
  * Cost is TWO passes over the table regardless of how many columns are
  * swept: one all-columns min/max aggregate (a broadcastable 1-row
  * frame), then one explode → (col_name, bucket) hash aggregate. The
  * reference's loop re-reads the dataset once per column.
  */
object Histograms {

  /** Fixed-bin histograms for every column in `columns` (numeric),
    * returned long-form as (col_name, bucket, cnt). Null values are
    * skipped (the reference's plots drop NaN); a constant column
    * collapses into bucket 0 rather than dividing by zero.
    */
  def sweep(df: DataFrame, columns: Seq[String], bins: Int = 40): DataFrame = {
    require(columns.nonEmpty)
    val aggs = columns.flatMap(c =>
      Seq(min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(columns.map { c =>
      val lo = col(s"__lo_$c"); val hi = col(s"__hi_$c")
      val bucket = when(hi === lo, lit(0L)).otherwise(
        least(floor((col(c) - lo) * bins / (hi - lo)), lit(bins - 1)).cast("long"))
      struct(lit(c).as("col_name"), bucket.as("bucket"))
    }: _*)
    df.crossJoin(broadcast(stats))
      .select(explode(entries).as("e"))
      .select(col("e.col_name"), col("e.bucket"))
      .where(col("bucket").isNotNull)
      .groupBy(col("col_name"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }
}
