package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations: two-stage salted aggregate.
  *
  * A `groupBy(key)` with one hot key funnels that key's every row
  * through a single reduce task. Partial (map-side) aggregation already
  * absorbs most of this for algebraic aggregates, and AQE rebalances
  * skewed JOINS — but when a hot key's pre-aggregated state is still
  * too big per task (high-cardinality inner state, huge groups with
  * low map-side reduction), salting splits each key into `salts`
  * deterministic sub-keys, aggregates partially per (key, salt), and
  * re-aggregates the `salts`-sized residue per key. Stage-1 shuffle
  * keys are uniform by construction; stage 2 moves only #keys × salts
  * rows.
  *
  * The aggregate must be decomposable (sum/count/min/max/avg via
  * sum+count — the classic algebraic set). `partial` computes stage 1,
  * `merge` combines the per-salt partials.
  */
object Salting {

  /** `xxhash64`-salted sub-key — deterministic across retries (rand()
    * salts re-deal rows on recompute and can double-count).
    */
  def saltCol(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong))

  def saltedAggregate(df: DataFrame, keyCols: Seq[String], salts: Int,
      partial: Seq[Column], merge: Seq[Column],
      saltBy: Seq[Column] = Nil): DataFrame = {
    require(salts > 0)
    val saltSource = if (saltBy.nonEmpty) saltBy
      else Seq(monotonically_increasing_id())
    val stage1 = df
      .withColumn("__salt", saltCol(salts, saltSource: _*))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    stage1.groupBy(keyCols.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** The common case: salted sum/count/avg of one value column. */
  def saltedStats(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int, saltBy: Seq[Column] = Nil): DataFrame =
    saltedAggregate(df, keyCols, salts,
      partial = Seq(sum(col(valueCol)).as("__s"), count(lit(1)).as("__n")),
      merge = Seq(sum(col("__s")).as("sum_value"),
        sum(col("__n")).as("n"),
        (sum(col("__s")) / sum(col("__n"))).as("avg_value")),
      saltBy = saltBy)

  /** Pre-join skew report: for a planned equi-join `left ⋈ right` on
    * `keyCols`, the keys whose output contribution `cnt_left ×
    * cnt_right` exceeds `minPairs` — the rows that will concentrate in
    * single reduce tasks (or blow the output up) BEFORE the join runs.
    * The operational check you run at 100 TB before committing to a
    * shuffle: its cost is two map-side-combined counts plus an
    * equi-join of the two (already keys-sized) count tables, so the
    * report is key-cardinality work, never data-sized. Feed flagged
    * keys to [[saltedAggregate]], AQE skew handling, or a broadcast
    * carve-out.
    *
    * Exact counts, not samples — a sample-based estimate misses the
    * moderate-key × moderate-key products that still dominate output
    * size, and exact per-key counts are one cheap aggregate anyway.
    */
  def joinSkewReport(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], minPairs: Long): DataFrame = {
    require(minPairs >= 1, s"minPairs must be >= 1; got $minPairs")
    val k = keyCols.map(col)
    val lc = left.groupBy(k: _*).agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(k: _*).agg(count(lit(1)).as("n_right"))
    lc.join(rc, keyCols)
      .withColumn("n_pairs", col("n_left") * col("n_right"))
      .where(col("n_pairs") >= minPairs)
  }
}
