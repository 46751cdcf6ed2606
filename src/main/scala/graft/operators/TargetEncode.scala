package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Out-of-fold target encoding — the leakage-safe categorical encoder
  * used ahead of GBT/linear models (the capability the reference's
  * `LabelEncoder` + per-category statistics in `preprocess.py` gestures
  * at, done the way a training pipeline must do it to avoid target
  * leakage).
  *
  * For a categorical column `cat`, a label `y`, and a fold assignment
  * (e.g. [[graft.car.Splits.kfold]]'s deterministic md5 gate), each
  * row's encoding is the smoothed mean of `y` over all OTHER folds'
  * rows of the same category:
  *
  * {{{ enc(cat, fold) = (sum_cat - sum_{cat,fold} + m * prior)
  *                      / (cnt_cat - cnt_{cat,fold} + m) }}}
  *
  * with `prior` the global label mean and `m` the smoothing
  * pseudo-count (m > 0 also makes the denominator strictly positive
  * even when a category lives entirely inside one fold).
  *
  * Scale shape: ONE map-side-combined aggregate over (cat, fold) —
  * the only full-data shuffle — then all remaining arithmetic happens
  * on the |cats|×|folds| cell table (broadcast-sized by construction:
  * the encoder is only useful for categoricals whose cardinality is
  * far below the row count). [[applyEncoding]] joins the cell table
  * back as a broadcast hash join, so encoding n rows costs one
  * shuffle + one broadcast probe regardless of fold count — NOT the
  * naive k re-aggregations of a per-fold loop.
  *
  * Exactness discipline (the a20 rule): label sums are exact
  * DECIMAL(20,6) accumulations — order/partitioning-invariant and
  * engine-reproducible — and the single double division happens once
  * at the end, so a DuckDB oracle running the same formula
  * hash-matches at 4 decimals.
  */
object TargetEncode {

  /** The (cat, fold, n, enc) encoding table. `foldCol` must be an
    * integer fold id column already on `df` (see
    * [[graft.car.Splits.kfold]]).
    */
  def oofEncoding(df: DataFrame, catCol: String, labelCol: String,
      foldCol: String, smoothing: Double = 10.0,
      outScale: Int = 4): DataFrame = {
    require(smoothing > 0.0,
      s"smoothing must be > 0 (keeps the denominator positive); got $smoothing")
    val y = col(labelCol).cast(DecimalType(20, 6))
    val cell = df.groupBy(col(catCol), col(foldCol))
      .agg(sum(y).as("__fsum"), count(y).as("__fcnt"))
    val cat = cell.groupBy(col(catCol))
      .agg(sum(col("__fsum")).as("__tsum"), sum(col("__fcnt")).as("__tcnt"))
    val global = cat.agg(sum(col("__tsum")).as("__gsum"),
      sum(col("__tcnt")).as("__gcnt"))
    val prior = col("__gsum").cast("double") / col("__gcnt")
    cell.join(cat, catCol)
      .crossJoin(broadcast(global))
      .select(col(catCol), col(foldCol), col("__fcnt").as("n"),
        round(((col("__tsum") - col("__fsum")).cast("double")
            + lit(smoothing) * prior)
          / ((col("__tcnt") - col("__fcnt")).cast("double") + lit(smoothing)),
          outScale).as("enc"))
  }

  /** Attach the out-of-fold encoding to every row as `outCol`. The
    * encoding table is broadcast (|cats|×|folds| rows), so this is a
    * map-side join — zero additional shuffles on `df`. Categories
    * unseen at fit time fall back to the smoothed prior, which for a
    * fresh category is exactly `prior` (fallbackPrior).
    */
  def applyEncoding(df: DataFrame, encoding: DataFrame, catCol: String,
      foldCol: String, fallbackPrior: Double, outCol: String = "enc"): DataFrame = {
    val enc = encoding.withColumnRenamed("enc", outCol)
      .drop("n")
    df.join(broadcast(enc), Seq(catCol, foldCol), "left")
      .withColumn(outCol, coalesce(col(outCol), lit(fallbackPrior)))
  }
}
