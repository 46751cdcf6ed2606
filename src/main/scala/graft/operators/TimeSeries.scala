package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair: per-key gap fill with linear
  * interpolation — the panel-data prep the reference does per entity
  * with pandas reindex/interpolate (analysis.py's monthly price
  * series), here as one distributed plan.
  *
  * Spark shape: the dense grid comes from `sequence()` + `explode`
  * inside executors (rows ∝ span, no driver loop), the
  * forward/backward neighbor lookup is two per-key windows with
  * `ignoreNulls` — state per group, never global. At 100 TB the cost
  * is the grid explode (linear in the filled output) plus one shuffle
  * on the key, which is the floor for any per-key resample.
  */
object TimeSeries {

  /** Fill every integer slot in `[min(slot), max(slot)]` per key;
    * missing slots get the linear interpolation between the nearest
    * observed neighbors (ends are always observed by construction, so
    * no extrapolation arm is needed).
    *
    * @param df   observed points, ONE row per (key, slot)
    * @param integral interpolate in integer arithmetic (`div`) instead
    *        of float division — for fixed-point value columns (e.g.
    *        µ-unit longs), making the fill bit-exact across engines,
    *        partitionings, and retries (the same discipline as
    *        PageRank's integer fixed-point)
    * @return (key, slot, value, interpolated) — `value` is the observed
    *         or interpolated reading, `interpolated` marks filled rows
    */
  def gapFillLinear(df: DataFrame, keyCol: String, slotCol: String,
      valCol: String, integral: Boolean = false): DataFrame = {
    val span = df.groupBy(col(keyCol))
      .agg(min(col(slotCol)).as("__lo"), max(col(slotCol)).as("__hi"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"))).as(slotCol))
    val joined = grid.join(
      df.select(col(keyCol), col(slotCol), col(valCol).as("__obs")),
      Seq(keyCol, slotCol), "left")
    val asc = Window.partitionBy(col(keyCol)).orderBy(col(slotCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.partitionBy(col(keyCol)).orderBy(col(slotCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined
      .withColumn("__pv", last(col("__obs"), ignoreNulls = true).over(asc))
      .withColumn("__ps",
        last(when(col("__obs").isNotNull, col(slotCol)), ignoreNulls = true).over(asc))
      .withColumn("__nv", first(col("__obs"), ignoreNulls = true).over(desc))
      .withColumn("__ns",
        first(when(col("__obs").isNotNull, col(slotCol)), ignoreNulls = true).over(desc))
      .select(col(keyCol), col(slotCol),
        when(col("__obs").isNotNull, col("__obs"))
          .otherwise(
            if (integral)
              col("__pv") + expr(s"((__nv - __pv) * ($slotCol - __ps)) div (__ns - __ps)")
            else
              col("__pv") + (col("__nv") - col("__pv")) *
                (col(slotCol) - col("__ps")) / (col("__ns") - col("__ps")))
          .as(valCol),
        col("__obs").isNull.as("interpolated"))
  }
}
