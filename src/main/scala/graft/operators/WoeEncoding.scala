package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weight-of-evidence encoding + information value — the credit-scoring
  * standard for categorical features against a binary label:
  * WOE(cat) = ln(P(cat|y=1)/P(cat|y=0)) turns each category into a
  * signed evidence score (the encoding [[graft.queries]]'
  * `target_encode` counterpart on the log-odds scale), and
  * IV = Σ_cat (P(cat|1) − P(cat|0))·WOE ranks whole features —
  * completing the relevance family (χ²/MI see association,
  * [[DecisionSplit]] sees one cut, IV sees the full evidence profile).
  *
  * Zero cells are handled by the standard half-count (Laplace ½)
  * smoothing, folded into EXACT integer ratios:
  * ratio = ((2·pos+1)·(N+1)) / ((2·neg+1)·(P+1)) — so the only
  * non-integer steps are one IEEE double division, one `ln`, and one
  * multiply, each SNAPPED to DECIMAL(20,8) before any data-sized
  * summation (the text_entropy discipline: libm ulp differences die at
  * the snap, double sums never see data order).
  *
  * Input is long format — `(feature, category, label)` rows, one per
  * observation — so ONE aggregate prices all features (the
  * winsorizeAll k-columns ≠ k-scans discipline). Scale shape: one
  * (feature, category) hash aggregate, one feature-keyed totals join,
  * one feature-keyed IV join back; everything past the first aggregate
  * is categories-sized.
  *
  * @return (feature, category, pos, neg, woe, iv) — woe at 4dp, iv the
  *         feature-level total repeated per category row
  */
object WoeEncoding {

  def woeTable(df: DataFrame, featureCol: String, categoryCol: String,
      labelCol: String): DataFrame = {
    val cats = df.select(col(featureCol).as("feature"),
        col(categoryCol).cast("string").as("category"),
        col(labelCol).cast("long").as("__y"))
      .groupBy(col("feature"), col("category"))
      .agg(sum(col("__y")).as("pos"),
        (count(lit(1)) - sum(col("__y"))).as("neg"))
    val tot = cats.groupBy(col("feature"))
      .agg(sum(col("pos")).as("__p"), sum(col("neg")).as("__n"))
    val scored = cats.join(tot, Seq("feature"))
      // count×count products widen to DECIMAL(38,0) before the double
      // division — plain int64 wraps past ~3e9 rows per feature
      .withColumn("__lnv", expr(
        """CAST(ln(CAST((2 * CAST(pos AS DECIMAL(38,0)) + 1) * (__n + 1) AS DOUBLE)
           / CAST((2 * CAST(neg AS DECIMAL(38,0)) + 1) * (__p + 1) AS DOUBLE)) AS DECIMAL(20,8))"""))
      .withColumn("__term", expr(
        """CAST((CAST(2 * pos + 1 AS DOUBLE) / CAST(2 * (__p + 1) AS DOUBLE)
            - CAST(2 * neg + 1 AS DOUBLE) / CAST(2 * (__n + 1) AS DOUBLE))
           * CAST(__lnv AS DOUBLE) AS DECIMAL(20,8))"""))
    val iv = scored.groupBy(col("feature"))
      .agg(round(sum(col("__term")).cast("double"), 4).as("iv"))
    scored.join(iv, Seq("feature"))
      .select(col("feature"), col("category"), col("pos"), col("neg"),
        round(col("__lnv").cast("double"), 4).as("woe"), col("iv"))
  }
}
