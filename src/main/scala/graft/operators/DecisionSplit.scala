package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Best univariate threshold per feature by exact Gini impurity — one
  * decision-stump step, the screening tool that ranks engineered
  * features by how much a single cut on each one purifies a binary
  * label (the thresholded complement of [[Stats]]' chi²/MI relevance
  * scores, which see the feature as unordered categories and would
  * happily reward an uncuttable zigzag).
  *
  * Input is long format — `(feature, bin, label)` rows, one per
  * observation, bins integer-ordered (the caller's discretization:
  * raw integer values, [[Stats.discretize]] buckets, whatever) — so ONE
  * aggregate prices all features together, the winsorizeAll k-columns ≠
  * k-scans discipline.
  *
  * Arithmetic contract: a candidate split at bin t costs
  * nL·Gini(L) + nR·Gini(R), and nL·Gini(L) = (nL² − pos² − neg²)/nL
  * exactly; each side is ONE integral division at ppm scale and the
  * argmin key is (cost, bin) — deterministic, engine-replayable,
  * truncation bounded by 2/10⁶ per candidate (the per-term-div
  * discipline of the PSI family). Products widen to DECIMAL(38,0):
  * 10⁶·n² passes int64 at ~3·10⁶ rows per feature, decimal to ~10¹⁶.
  *
  * Scale shape: one (feature, bin) hash aggregate (data-sized →
  * bins-sized), ONE feature-partitioned window over the bins table,
  * one argmin aggregate. Features with a single bin emit a null split
  * (nothing to cut).
  */
object DecisionSplit {

  /** @param labelCol 0/1 integer column
    * @return per feature: (feature, n, base_gini_ppm, best_bin,
    *         split_gini_ppm, gain_ppm) — split columns null when the
    *         feature has only one bin; `best_bin` is the inclusive
    *         upper edge of the left side
    */
  def bestSplits(df: DataFrame, featureCol: String, binCol: String,
      labelCol: String): DataFrame = {
    val byBin = df.select(col(featureCol).as("__f"),
        col(binCol).cast("long").as("__b"),
        col(labelCol).cast("long").as("__y"))
      .groupBy(col("__f"), col("__b"))
      .agg(sum(col("__y")).as("__p"), (count(lit(1)) - sum(col("__y"))).as("__g"))
    val wCum = Window.partitionBy(col("__f")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("__f"))
    val cand = byBin
      .withColumn("__cp", sum(col("__p")).over(wCum))
      .withColumn("__cg", sum(col("__g")).over(wCum))
      .withColumn("__tp", sum(col("__p")).over(wAll))
      .withColumn("__tg", sum(col("__g")).over(wAll))
      .withColumn("__nl", col("__cp") + col("__cg"))
      .withColumn("__nr", col("__tp") + col("__tg") - col("__nl"))
      // last bin has an empty right side — not a split
      .where(col("__nr") > 0)
      .withColumn("__cost",
        expr("""(1000000 * (CAST(__nl AS DECIMAL(38,0)) * __nl
                 - CAST(__cp AS DECIMAL(38,0)) * __cp
                 - CAST(__cg AS DECIMAL(38,0)) * __cg)) div __nl""") +
        expr("""(1000000 * (CAST(__nr AS DECIMAL(38,0)) * __nr
                 - CAST(__tp - __cp AS DECIMAL(38,0)) * (__tp - __cp)
                 - CAST(__tg - __cg AS DECIMAL(38,0)) * (__tg - __cg)))
                div __nr"""))
    val best = cand.groupBy(col("__f"))
      .agg(min(struct(col("__cost").as("c"), col("__b").as("b"))).as("__m"))
      .select(col("__f"), col("__m.b").as("best_bin"),
        col("__m.c").as("__splitcost"))
    val base = byBin.groupBy(col("__f"))
      .agg((sum(col("__p")) + sum(col("__g"))).as("n"),
        sum(col("__p")).as("__tp"), sum(col("__g")).as("__tg"))
      .withColumn("base_gini_ppm",
        expr("""((1000000 * (CAST(n AS DECIMAL(38,0)) * n
                 - CAST(__tp AS DECIMAL(38,0)) * __tp
                 - CAST(__tg AS DECIMAL(38,0)) * __tg)) div n) div n"""))
    base.join(best, Seq("__f"), "left")
      .select(col("__f").as("feature"), col("n"), col("base_gini_ppm"),
        col("best_bin"),
        expr("__splitcost div n").as("split_gini_ppm"),
        (col("base_gini_ppm") - expr("__splitcost div n")).as("gain_ppm"))
  }
}
