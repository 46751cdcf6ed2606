package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance over a change log —
  * the warehouse-side mirror of the reference's snapshot joins
  * (analysis.py's per-month state rebuilds): instead of re-deriving a
  * dimension's state per query, keep one history table with
  * `[valid_from, valid_to)` intervals and answer any as-of question
  * with a range predicate.
  *
  * Spark shape: everything is partitioned by the dimension key — the
  * run-length encoding is two per-key windows and one hash aggregate,
  * and the incremental merge is key equi-joins. Nothing global: no
  * driver state, no all-history sort, so the same plan holds when the
  * history is 10^12 rows as long as per-key change counts are sane
  * (they are, by the definition of a dimension).
  *
  * Determinism: ties in the change-log timestamp are broken by a
  * caller-supplied unique tiebreak column, so run boundaries are a
  * total order and identical on any partitioning/retry.
  */
object Scd {

  /** Collapse a change log into type-2 history rows.
    *
    * @param log      change events: one row per observation
    * @param keyCol   dimension key
    * @param tsCol    observation time (any orderable numeric/temporal)
    * @param tieCol   unique column breaking equal-`tsCol` ties
    * @param stateCol the tracked attribute (single column; wrap multiple
    *                 attributes in `struct(...)` upstream if needed)
    * @return (key, state, valid_from, valid_to, is_current): one row per
    *         run of consecutive identical states; `valid_from` is the
    *         run's first observation time, `valid_to` the next run's
    *         `valid_from` (null on the open/current run)
    */
  def buildHistory(log: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, stateCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val runs = log
      .withColumn("__chg",
        when(lag(col(stateCol), 1).over(byKey) <=> col(stateCol), lit(0L)).otherwise(lit(1L)))
      .withColumn("__run", sum(col("__chg")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__run"), col(stateCol))
      .agg(min(col(tsCol)).as("valid_from"))
    val byFrom = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(stateCol), col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** Merge a (strictly newer) change batch into an existing type-2
    * history, incrementally: closed rows and untouched keys pass
    * through by reference; only the open rows of keys PRESENT in the
    * batch are re-derived, by replaying each affected key's open run as
    * a synthetic first observation ahead of its new changes. A batch
    * whose first state equals the key's current state therefore
    * collapses into the existing run (same `valid_from`) — exactly what
    * a full rebuild over the concatenated log would produce, which
    * ScdSpec pins as `applyChanges(buildHistory(a), b) ≡
    * buildHistory(a ∪ b)`.
    *
    * Requires every batch timestamp for a key to be ≥ that key's open
    * `valid_from` (the normal append-only feed contract).
    */
  def applyChanges(history: DataFrame, changes: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, stateCol: String): DataFrame = {
    val affected = changes.select(col(keyCol)).distinct()
    val untouched = history.join(affected, Seq(keyCol), "left_anti")
    val closedOfAffected = history.where(!col("is_current"))
      .join(affected, Seq(keyCol), "left_semi")
    // The open run replays as a pseudo-event ordered before every batch
    // row: its tiebreak sorts first because batch timestamps are >= the
    // open valid_from and the synthetic tie column is the minimum long.
    val openAsLog = history.where(col("is_current"))
      .join(affected, Seq(keyCol), "left_semi")
      .select(col(keyCol), col("valid_from").as(tsCol),
        lit(Long.MinValue).as(tieCol), col(stateCol))
    val replayed = buildHistory(
      openAsLog.unionByName(changes.select(col(keyCol), col(tsCol),
        col(tieCol).cast("long").as(tieCol), col(stateCol))),
      keyCol, tsCol, tieCol, stateCol)
    untouched.unionByName(closedOfAffected).unionByName(replayed)
  }

  /** Point-in-time lookup against a type-2 history: the state of every
    * key as of `at` (keys born after `at` drop out).
    */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.where(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
