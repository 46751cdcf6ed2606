package graft.car

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** A2-A4 — column normalization (reference data.py:107-125, ext variant
  * data.py:209-231; denormalization evaluate.py:72-83).
  *
  * Stats for ALL columns are computed in a single aggregate pass (one
  * HashAggregateExec), then applied as literal expressions — the
  * reference does one full-column pass per column. `stddev_samp` matches
  * pandas' ddof=1. Stats are tiny scalars, carried as a case class and
  * baked into the plan as literals (cheaper than a broadcast join at any
  * scale).
  */
object Normalize {

  sealed trait Method
  case object ZScore extends Method
  case object MinMax extends Method

  /** Per-column fitted stats: (a, b) such that normalized = (x − a) / b. */
  final case class Stats(offset: Map[String, Double], scale: Map[String, Double]) {
    def denormalize(df: DataFrame, cols: Seq[String]): DataFrame =
      cols.foldLeft(df) { (acc, c) =>
        acc.withColumn(c, col(c) * scale(c) + offset(c))
      }
  }

  /** One-pass fit over `cols`. */
  def fit(df: DataFrame, cols: Seq[String], method: Method): Stats = {
    val aggs = method match {
      case ZScore => cols.flatMap(c =>
        Seq(avg(col(c)).as(s"${c}__a"), stddev_samp(col(c)).as(s"${c}__b")))
      case MinMax => cols.flatMap(c =>
        Seq(min(col(c)).cast("double").as(s"${c}__a"),
          (max(col(c)) - min(col(c))).cast("double").as(s"${c}__b")))
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    // constant column ⇒ scale 0 (the reference produces NaN/inf there;
    // pandas std=0). Clamp to 1 so a constant column normalizes to 0
    // instead of poisoning the frame (documented divergence).
    def safeScale(b: Double): Double = if (b == 0.0 || b.isNaN) 1.0 else b
    Stats(
      offset = cols.map(c => c -> row.getAs[Double](s"${c}__a")).toMap,
      scale = cols.map(c => c -> safeScale(row.getAs[Double](s"${c}__b"))).toMap)
  }

  /** Apply fitted stats (same stats reused for train/dev/test — the
    * reference refits on raw for the inverse transform, A4; both uses go
    * through this one Stats value here).
    */
  def transform(df: DataFrame, stats: Stats, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, (col(c) - stats.offset(c)) / stats.scale(c))
    }

  def fitTransform(df: DataFrame, cols: Seq[String], method: Method): (DataFrame, Stats) = {
    val s = fit(df, cols, method)
    (transform(df, s, cols), s)
  }
}
