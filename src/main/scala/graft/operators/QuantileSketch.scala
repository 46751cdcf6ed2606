package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable deterministic quantile sketch — the QUANTILE member of the
  * [[KmvSketch]] family: a per-group uniform k-ROW sample selected as
  * the bottom-k rows by the 48-bit md5 of the row's unique id. Because
  * "random" is a pure function of the id, the sketch is a pure function
  * of the data (exact-replay contract: a DuckDB oracle reproduces every
  * estimate bit for bit), and because bottom-k of a union is the
  * bottom-k of the concatenated bottom-k's, per-partition / per-day
  * sketches MERGE losslessly — the 100 TB pattern: sketch once, roll up
  * forever, never re-touch raw rows. Estimator rank error is the
  * standard sample-quantile ~1/√k in rank space.
  *
  * Unlike [[KmvSketch]] (which sketches the value SET for distinct
  * counting), this samples ROWS, preserving multiplicity — the thing a
  * quantile needs. Values ride along untouched (no arithmetic on them:
  * order statistics only), so there is no accumulation-order hazard.
  *
  * Scale shape: one group-partitioned window over (group, h) keeps k
  * rows per group; merges and quantile reads run on (groups·k)-sized
  * frames.
  */
object QuantileSketch {

  /** Per-group ≤ k-row uniform sample: (…groupCols, h, v), h the
    * 48-bit md5 draw of `idCol` (unique by contract — duplicate ids
    * would bias the sample), v the value (any orderable numeric).
    */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2; got $k")
    val grp = groupCols.map(col)
    // (h, v) not h alone: two ids colliding on the 48-bit prefix at the
    // rank-k boundary must resolve the same way on every partitioning
    // (and in the DuckDB oracle) or the bit-exact replay contract breaks
    val w = Window.partitionBy(grp: _*).orderBy(col("h"), col("v"))
    df.select(grp :+ KmvSketch.hash48(col(idCol)).as("h")
        :+ col(valueCol).as("v"): _*)
      .where(col("v").isNotNull)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Merge sketches (any number, unioned into one frame): re-rank the
    * concatenation by hash and keep k — exactly the sketch the full
    * data would have produced, because every input kept ITS k smallest
    * draws (QuantileSketchSpec pins merge ≡ whole-data).
    */
  def merge(sketches: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(col("h"), col("v"))
    sketches.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Quantile estimates from a sketch: for each q (ppm), the
    * ceil(q·n)-th smallest sampled value (clamped to rank ≥ 1), ties
    * total-ordered by (v, h) so the read is deterministic on any
    * partitioning. Groups that never saturated k ARE their own sample,
    * so their estimates are exact.
    *
    * @return (…groupCols, q_ppm, n_sample, est)
    */
  def quantiles(sk: DataFrame, groupCols: Seq[String],
      qPpms: Seq[Long]): DataFrame = {
    require(qPpms.nonEmpty && qPpms.forall(q => q >= 0 && q <= 1000000),
      s"q_ppm values must be in [0, 1000000]; got $qPpms")
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(col("v"), col("h"))
    val ranked = sk
      .withColumn("__vrk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(grp: _*)))
    ranked
      .withColumn("q_ppm", explode(array(qPpms.map(lit): _*)))
      // ceil(q·n) in exact integers, clamped to >= 1
      .where(col("__vrk") ===
        greatest(lit(1L), expr("(q_ppm * __n + 999999) div 1000000")))
      .select(grp ++ Seq(col("q_ppm"), col("__n").as("n_sample"),
        col("v").as("est")): _*)
  }
}
