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

  /** R1, oracle form — deterministic fraction split by an md5 gate on a
    * unique key: a row lands in train iff the first 16 bits of
    * `md5(key)` fall below `trainFraction · 2¹⁶`. Same uniform marginal
    * as [[shuffledSplit]]'s seeded RNG, but a pure function of the key —
    * bit-identical across engines, retries, partitionings, and AQE
    * re-plans (and replayable by a SQL oracle), which is what a 100 TB
    * pipeline actually wants from a "random" split: re-running a failed
    * stage must not reshuffle rows between train and dev. The md5 gate is
    * the same construction [[graft.operators.CorpusPrep.mixtureSample]]
    * and the R3 edge-sample oracle use.
    */
  def hashSplit(df: DataFrame, keyCol: org.apache.spark.sql.Column,
      trainFraction: Double): (DataFrame, DataFrame) = {
    // A null key would make md5 null and the row satisfy NEITHER gate —
    // silently dropped from both halves, so the split would no longer
    // partition the input. Coalesce nulls to a sentinel instead: all
    // null-key rows travel together into whichever half the sentinel
    // hashes to, and train ∪ dev ≡ input holds for nullable keys too.
    val gate = conv(substring(md5(
      coalesce(keyCol.cast("string"), lit("\u0000__null_key__"))), 1, 4), 16, 10)
      .cast("int")
    val thresh = lit(trainFraction) * lit(65536)
    (df.where(gate < thresh), df.where(gate >= thresh))
  }

  /** K-fold assignment from the same deterministic md5 gate as
    * [[hashSplit]]: `fold = gate % k`, a pure function of the key —
    * every retry, engine, and partitioning assigns a row to the same
    * fold, and the folds partition the input exactly (nulls travel via
    * the same sentinel). The 16-bit gate's bias toward low folds is
    * ≤ k/65536 — negligible for any sane k.
    */
  def kfold(df: DataFrame, keyCol: org.apache.spark.sql.Column, k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2 folds; got $k")
    val gate = conv(substring(md5(
      coalesce(keyCol.cast("string"), lit("\u0000__null_key__"))), 1, 4), 16, 10)
      .cast("int")
    df.withColumn("fold", gate % k)
  }

  /** GROUPED k-fold: [[kfold]] gated on a group key instead of the row
    * key, so every row of a group lands in the SAME fold — the
    * leakage-safe CV split when rows within a group are correlated
    * (all of one user's events, all chunks of one document): a model
    * must never validate on a group it trained on. Pure hash of the
    * group value — no group list is ever collected or shuffled, so it
    * costs exactly one projected column at any scale.
    */
  def groupKfold(df: DataFrame, groupCol: org.apache.spark.sql.Column,
      k: Int): DataFrame = kfold(df, groupCol, k)

  /** R2 — sequential split by an ordering column. The reference slices
    * `.loc[:n]` / `.loc[n:]`, which puts row n in BOTH halves (quirk X1);
    * `overlapBoundary = true` reproduces that, the default gives an exact
    * trainLen/rest cut. Indexing is a range-partitioned sort +
    * zipWithIndex (DenseId) — no single-partition Window — and DenseId
    * materializes the indexed frame once (eager localCheckpoint), so the
    * row count and both halves read the same checkpointed blocks: no
    * extra cache to leak, and ties can't reorder between the train and
    * dev reads (DenseId also appends the remaining columns as a
    * deterministic tiebreaker).
    */
  def sequentialSplit(df: DataFrame, orderCol: String, trainFraction: Double,
      overlapBoundary: Boolean = false): (DataFrame, DataFrame) = {
    val indexed =
      graft.operators.DenseId.withOrderedId(df, "__idx", orderCol)
    val n = indexed.count()
    val trainLen = (trainFraction * n).toLong
    // X1 (`.loc[:n]`) includes boundary row n in train AND dev; the fixed
    // form puts exactly trainLen rows in train.
    val trainEnd = if (overlapBoundary) trainLen + 1 else trainLen
    val train = indexed.where(col("__idx") < trainEnd).drop("__idx")
    val dev = indexed.where(col("__idx") >= trainLen).drop("__idx")
    (train, dev)
  }
}
