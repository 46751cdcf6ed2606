package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with the same
  * key and right time ≤ left time (the time-series "most recent fact
  * before the event" join; LEFT semantics, unmatched rows keep nulls).
  *
  * Spark has no native ASOF JOIN; expressing it as a θ-join
  * (`l.key = r.key AND r.t <= l.t` + a per-left max) plans a
  * per-key cross product then a second aggregation pass. This is the
  * scale path instead: tag both sides, union, ONE shuffle on the key,
  * and a KEY-PARTITIONED running `last(ignoreNulls)` window — never a
  * partitionless window, work O(|L| + |R|) after the sort-within-key.
  * The right payload rides as a single struct, so the window carries
  * one column regardless of payload width.
  *
  * Determinism on ties: rows ordering within a key is (time, side,
  * payload struct) — right rows sort before left at the same timestamp
  * (`≤` semantics, the right row at exactly t matches), and equal-time
  * right rows resolve by payload struct order, so make the payload's
  * first column a unique id when exact tie behavior matters.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String],
      suffix: String = "_asof"): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one right payload column")
    val l = left.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__lpay"))
    val r = right.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(0).as("__side"),
      struct(payloadCols.map(col): _*).as("__rpay"))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__rpay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__lpay.*") +:
        payloadCols.map(c => col(s"__match.$c").as(s"$c$suffix")): _*)
  }
}
