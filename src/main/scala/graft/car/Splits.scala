package graft.car

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R1/R2 — dataset splitting (reference utils.py:210-219, samples.py:96-117). */
object Splits {

  /** R1 — shuffled fraction split (reference `split_dataset`:
    * sklearn shuffle + positional slice ⇒ Spark randomSplit).
    */
  def shuffledSplit(df: DataFrame, trainFraction: Double, seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(train, dev) = df.randomSplit(Array(trainFraction, 1 - trainFraction), seed)
    (train, dev)
  }

  /** R2 — sequential split by an ordering column. The reference slices
    * `.loc[:n]` / `.loc[n:]`, which puts row n in BOTH halves (quirk X1);
    * `overlapBoundary = true` reproduces that, the default fixes it.
    */
  def sequentialSplit(df: DataFrame, orderCol: String, trainFraction: Double,
      overlapBoundary: Boolean = false): (DataFrame, DataFrame) = {
    val n = df.count()
    val trainLen = (trainFraction * n).toLong
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))
    val indexed = df.withColumn("__idx", row_number().over(w).cast("long") - 1)
    val train = indexed.where(col("__idx") <= trainLen).drop("__idx")
    val devFrom = if (overlapBoundary) trainLen else trainLen + 1
    val dev = indexed.where(col("__idx") >= devFrom).drop("__idx")
    (train, dev)
  }
}
