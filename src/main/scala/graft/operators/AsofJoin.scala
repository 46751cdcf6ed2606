package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the temporally closest right row with
  * the same key on the requested side of the event (the time-series
  * "most recent fact before / next fact after" join; LEFT semantics,
  * unmatched rows keep nulls). `backward` matches the latest right with
  * `t_r ≤ t_l` (the default, pandas merge_asof's); `forward` matches
  * the earliest right with `t_r ≥ t_l`; `nearest` takes whichever of
  * the two candidates is temporally closer, distance ties resolving
  * BACKWARD (the deterministic choice merge_asof leaves to row order).
  * An optional `tolerance` bounds the match distance — a match farther
  * than the bound degrades to null, exactly like merge_asof's
  * tolerance; under `nearest` it gates each side BEFORE the
  * closest-pick, so an in-range far-side candidate still matches when
  * the near side is out of range. `nearest` costs the same single
  * shuffle — the one union order serves both window frames (an
  * equal-time right sorts into the PRECEDING frame only, but its Δ = 0
  * backward candidate wins the pick regardless).
  *
  * Spark has no native ASOF JOIN; expressing it as a θ-join
  * (`l.key = r.key AND r.t <= l.t` + a per-left max) plans a
  * per-key cross product then a second aggregation pass. This is the
  * scale path instead: tag both sides, union, ONE shuffle on the key,
  * and a KEY-PARTITIONED running `last`/`first(ignoreNulls)` window —
  * never a partitionless window, work O(|L| + |R|) after the
  * sort-within-key. The right payload rides as a single struct (with
  * the right timestamp smuggled in for the tolerance gate), so the
  * window carries one column regardless of payload width.
  *
  * Determinism on ties: row ordering within a key is (time, side,
  * payload struct) with the side bit chosen so an exactly-equal
  * timestamp matches in BOTH directions (`≤`/`≥` semantics); equal-time
  * right rows resolve by payload struct order, so make the payload's
  * first column a unique id when exact tie behavior matters.
  *
  * `tolerance` subtracts timestamps directly — use a numeric time
  * column (the engine's µs/ns-long convention; convert TimestampType
  * via unix_micros first).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String],
      suffix: String = "_asof",
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one right payload column")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val backward = direction == "backward"
    val nearest = direction == "nearest"
    // side bit: the right row at an EQUAL timestamp must fall inside the
    // left row's window frame — before it (backward) or after (forward);
    // nearest uses the backward order (see scaladoc on the Δ=0 case)
    val (leftSide, rightSide) = if (backward || nearest) (1, 0) else (0, 1)
    val l = left.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(leftSide).as("__side"),
      struct(left.columns.map(col): _*).as("__lpay"))
    val r = right.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(rightSide).as("__side"),
      struct(col(timeCol).as("__rt") +: payloadCols.map(col): _*).as("__rpay"))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w0 = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__rpay"))
    val backMatch = last(col("__rpay"), ignoreNulls = true)
      .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwdMatch = first(col("__rpay"), ignoreNulls = true)
      .over(w0.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val gated =
      if (nearest) {
        def gate(c: Column) = tolerance match {
          case Some(tol) => when(abs(c.getField("__rt") - col("__t")) <= tol, c)
          case None => c
        }
        u.withColumn("__b", backMatch).withColumn("__f", fwdMatch)
          .where(col("__side") === leftSide)
          .withColumn("__b", gate(col("__b")))
          .withColumn("__f", gate(col("__f")))
          .withColumn("__match",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              // strict <: a distance tie resolves backward
              .when(col("__f.__rt") - col("__t") < col("__t") - col("__b.__rt"),
                col("__f"))
              .otherwise(col("__b")))
      } else {
        val withMatch = u
          .withColumn("__match", if (backward) backMatch else fwdMatch)
          .where(col("__side") === leftSide)
        tolerance match {
          case Some(tol) => withMatch.withColumn("__match",
            when(abs(col("__match.__rt") - col("__t")) <= tol, col("__match")))
          case None => withMatch
        }
      }
    gated.select(col("__lpay.*") +:
      payloadCols.map(c => col(s"__match.$c").as(s"$c$suffix")): _*)
  }
}
