package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification risk audits for a release/training corpus —
  * the privacy half of the data-quality report ([[DataQuality]]'s
  * sibling): before a table with quasi-identifiers (zip, age band,
  * segment, …) ships into a training set, measure how small its
  * equivalence classes are (k-anonymity, Sweeney) and how varied the
  * sensitive attribute is inside each class (ℓ-diversity, Machanavajjhala
  * et al.) — a class of size 1 is a direct re-identification, and a
  * class whose sensitive values are all equal leaks the attribute even
  * at large k.
  *
  * Both audits return SIZE-KEYED HISTOGRAMS, not per-class rows: the
  * per-class frame is as large as the data's distinct QI combinations,
  * but the decision surface ("how many rows sit in classes below k?")
  * is a handful of (size, count) rows — the report stays
  * driver-readable at any corpus size, and the minimum k / minimum ℓ
  * is simply the first row. Everything is two hash aggregates (row →
  * class, class → size histogram); exact integers throughout, so the
  * report hash-matches any engine.
  */
object Privacy {

  /** Equivalence-class size histogram over the quasi-identifier
    * columns: one row per distinct class SIZE with the number of
    * classes and rows at that size, plus each row's cumulative row
    * share in ppm (exact integral div) — "x % of rows live in classes
    * of size ≤ s". The k-anonymity level of the table is the first
    * row's `class_size`. Null QI values form their own class per the
    * standard grouping semantics (null == null for GROUP BY) — a null
    * zip is itself a quasi-identifier value.
    *
    * @return (class_size, n_classes, n_rows, cum_rows, cum_row_ppm)
    *         ordered by class_size
    */
  def kAnonymityHistogram(df: DataFrame, qiCols: Seq[String]): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
    val hist = classes.groupBy(col("__sz").as("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("__sz")).as("n_rows"))
    val tot = hist.agg(sum(col("n_rows")).as("__tot"))
    // running total via the two-pass PrefixSum, not a global-ORDER
    // window — Spark 4's EliminateWindowPartitions folds a literal
    // partition spec to a true partitionless Window, which the global
    // PlanSpec sweep (rightly) bans even on this histogram-sized frame
    PrefixSum.withRunningTotal(hist, "n_rows", "cum_rows", "class_size")
      .crossJoin(broadcast(tot))
      .select(col("class_size"), col("n_classes"), col("n_rows"),
        col("cum_rows"),
        expr("(1000000 * cum_rows) div __tot").as("cum_row_ppm"))
  }

  /** t-closeness histogram (Li et al., ICDE'07 — the third rung after
    * k-anonymity and ℓ-diversity): per equivalence class, the total
    * variation distance between the class's sensitive-value
    * distribution and the GLOBAL one, in exact ppm —
    * tvd = ½ Σ_v |p_class(v) − p_global(v)|, computed as the all-integer
    * (10⁶ · Σ_v |n_cv·N − n_v·n_c|) div (2·n_c·N) with DECIMAL(38,0)
    * products (n·N overflows int64 past ~3·10⁹ rows). A class can be
    * large (k fine) and varied (ℓ fine) yet still leak — e.g. 95%
    * one disease where the population has 10% — and tvd is what
    * catches it. Values absent from a class contribute |0 − n_v·n_c|,
    * so the value set must be broadcast-small (a sensitive attribute
    * with corpus-scale cardinality is a direct identifier, not a
    * distribution). Null sensitive values form their own category.
    *
    * Histogrammed by `bandPpm`-wide tvd bands (driver-readable at any
    * scale, like the siblings): the table's t level is the LAST row's
    * band upper edge.
    *
    * @return (tvd_band, n_classes, n_rows) ordered by tvd_band, where
    *         tvd_band = tvd_ppm div bandPpm
    */
  def tClosenessHistogram(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, bandPpm: Long = 50000L): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(bandPpm >= 1, s"bandPpm must be >= 1; got $bandPpm")
    val qi = qiCols.map(col)
    val cv = df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("n_cv"))
    val cls = cv.groupBy(qi: _*).agg(sum(col("n_cv")).as("n_c"))
    val vals = cv.groupBy(col(sensitiveCol)).agg(sum(col("n_cv")).as("n_v"))
    val tot = vals.agg(sum(col("n_v")).as("N"))
    val perClass = cls
      .crossJoin(broadcast(vals))
      .join(cv, qiCols :+ sensitiveCol, "left")
      .withColumn("n_cv", coalesce(col("n_cv"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("__num", abs(expr(
        "CAST(n_cv AS DECIMAL(38,0)) * N - CAST(n_v AS DECIMAL(38,0)) * n_c")))
      .groupBy(qi: _*)
      .agg(max(col("n_c")).as("n_c"), max(col("N")).as("N"),
        sum(col("__num")).as("__tvd_num"))
      .withColumn("tvd_ppm", expr(
        """CAST((1000000 * __tvd_num)
           div (2 * CAST(n_c AS DECIMAL(38,0)) * N) AS BIGINT)"""))
    perClass
      .groupBy(expr(s"tvd_ppm div ${bandPpm}L").as("tvd_band"))
      .agg(count(lit(1)).as("n_classes"), sum(col("n_c")).as("n_rows"))
  }

  /** ℓ-diversity histogram: per equivalence class (the QI grouping of
    * [[kAnonymityHistogram]]) count the DISTINCT sensitive values ℓ,
    * then histogram classes and rows by ℓ. A table is ℓ-diverse at the
    * first row's `l` level; `n_rows` at ℓ = 1 counts rows whose
    * sensitive attribute is fully disclosed by their class membership.
    * Null sensitive values do not count toward ℓ (count(DISTINCT)
    * skips nulls on every engine) — a class of only-null sensitives
    * has ℓ = 0 and surfaces as its own histogram row rather than
    * passing as diverse.
    *
    * @return (l, n_classes, n_rows) ordered by l
    */
  def lDiversityHistogram(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"),
        countDistinct(col(sensitiveCol)).as("__l"))
    classes.groupBy(col("__l").as("l"))
      .agg(count(lit(1)).as("n_classes"), sum(col("__sz")).as("n_rows"))
  }
}
