package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of an aggregate rollup — the materialized-
  * view pattern that keeps a 100 TB dashboard query from rescanning
  * history on every arrival batch. The state table holds MERGEABLE
  * partial aggregates per key (count / decimal sum / min / max —
  * the same algebraic-combiner idea as the HLL sketch rollup in
  * [[Sketches]], in exact form); applying a delta batch costs one
  * aggregate over the DELTA (map-side combined, delta-sized shuffle)
  * plus a key-equi full-outer merge with the state — history is never
  * re-read. With the state stored bucketed by key
  * ([[Layout.writeBucketed]]) the merge join is shuffle-free.
  *
  * Sums accumulate as exact DECIMAL(20,6) (order/partition-invariant),
  * so `merge(fit(base), fit(delta)) == fit(base ∪ delta)` is an exact
  * equality, not an approximation — the `agg_delta_merge` gate query
  * hash-matches a full DuckDB rebuild, and IncrementalAggSpec pins
  * merge ≡ rebuild across cuts, disjoint keys, and repeated deltas.
  */
object IncrementalAgg {

  /** Build the partial-aggregate state for a batch: one row per key
    * with `n` (count of non-null values), `sum` (exact decimal),
    * `vmin`/`vmax`.
    */
  def fit(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    val y = col(valueCol).cast(DecimalType(20, 6))
    df.groupBy(keyCols.map(col): _*)
      .agg(count(y).as("n"), sum(y).as("sum"),
        min(y).as("vmin"), max(y).as("vmax"))
  }

  /** Merge two state tables: full-outer on the keys, counters add,
    * min/max combine via null-skipping least/greatest. Commutative and
    * associative — batches can arrive and merge in any order.
    */
  def merge(state: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame = {
    val l = state.select(keyCols.map(col) ++
      Seq(col("n").as("__ln"), col("sum").as("__ls"),
        col("vmin").as("__lmin"), col("vmax").as("__lmax")): _*)
    val r = delta.select(keyCols.map(col) ++
      Seq(col("n").as("__rn"), col("sum").as("__rs"),
        col("vmin").as("__rmin"), col("vmax").as("__rmax")): _*)
    l.join(r, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("__ln"), lit(0L)) + coalesce(col("__rn"), lit(0L))).as("n"),
        (coalesce(col("__ls"), lit(0).cast(DecimalType(20, 6)))
          + coalesce(col("__rs"), lit(0).cast(DecimalType(20, 6)))).as("sum"),
        least(col("__lmin"), col("__rmin")).as("vmin"),
        greatest(col("__lmax"), col("__rmax")).as("vmax")): _*)
  }

  /** Apply a raw delta batch to an existing state table:
    * `merge(state, fit(delta))`.
    */
  def applyDelta(state: DataFrame, deltaRows: DataFrame,
      keyCols: Seq[String], valueCol: String): DataFrame =
    merge(state, fit(deltaRows, keyCols, valueCol), keyCols)

  /** Finisher: derive presentation columns (mean from the exact
    * sum/count pair) without touching the mergeable state layout.
    *
    * The mean is µ-unit integer fixed-point — `(sum·10⁶) div n`, then
    * one exact double conversion — NOT `round(double_sum / n, k)`:
    * divisions by small counts land on exact half-way k-dp values
    * (e.g. 1512.12/32 = 47.25375) where Spark's HALF_UP and an
    * oracle's nearest-double rounding disagree on the last digit.
    * Integer division is bit-identical everywhere (the ts_anomaly /
    * PageRank discipline); found by the sf0.1 gate sweep.
    */
  def report(state: DataFrame, keyCols: Seq[String], outScale: Int = 4): DataFrame =
    state.select(keyCols.map(col) ++ Seq(
      col("n"),
      round(col("sum").cast("double"), outScale).as("sum_value"),
      (expr("cast(cast(sum * 1000000 as bigint) div n as double)") / lit(1e6))
        .as("mean_value"),
      round(col("vmin").cast("double"), outScale).as("min_value"),
      round(col("vmax").cast("double"), outScale).as("max_value")): _*)
}
