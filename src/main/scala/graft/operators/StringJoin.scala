package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join with lossless q-gram pruning —
  * the fuzzy-key counterpart of [[Dedup]]'s Jaccard family, for
  * record-linkage keys (names, model codes) where token overlap is the
  * wrong metric and Levenshtein is the contract.
  *
  * Scale shape: never all-pairs. Candidates come from an inverted
  * q-gram index (explode → equi-join on the gram → per-pair shared
  * count), using the count-filtering bound from Gravano et al.
  * (VLDB'01): one edit destroys at most q grams, so
  * `lev(a,b) ≤ d ⇒ |grams(a) ∩ grams(b)| ≥ max(g_a, g_b) − d·q`
  * (bag intersection — grams join on (gram, occurrence) so duplicate
  * grams count min-multiplicity, keeping the bound tight AND correct).
  * Strings too short to satisfy any gram bound (`g ≤ d·q`) fall back
  * to a length-banded block joined on rounded length — a tiny set by
  * construction (len < q·(d+1)). Survivors verify with Spark's
  * threshold Levenshtein (early-exits at d+1). Both stages are
  * equi-joins + hash aggregates; the hot-gram skew cap mirrors
  * `Dedup.shingleJaccardPairs`' df cap and is OFF by default because
  * dropping a gram would break losslessness.
  */
object StringJoin {

  /** All unordered pairs of DISTINCT values of `strCol` within edit
    * distance `maxDist`, as (a, b, dist) with a < b.
    */
  def editDistancePairs(df: DataFrame, strCol: String, maxDist: Int,
      q: Int = 2): DataFrame = {
    require(maxDist >= 0 && q >= 1, s"need maxDist >= 0, q >= 1; got d=$maxDist q=$q")
    val strs = df.select(col(strCol).cast("string").as("s")).where(col("s").isNotNull)
      .distinct()
      .withColumn("len", length(col("s")))
      .withColumn("g", greatest(lit(0), col("len") - lit(q - 1)))
    val budget = maxDist * q

    // inverted index side: strings with enough grams for the bound
    val indexed = strs.where(col("g") > budget)
    val grams = indexed
      .select(col("s"), col("g"), posexplode(
        // grams as substrings i..i+q-1, i in [0, g)
        expr(s"transform(sequence(0, g - 1), i -> substring(s, i + 1, $q))")).as(Seq("pos", "gram")))
      .withColumn("occ", row_number().over(
        Window.partitionBy(col("s"), col("gram")).orderBy(col("pos"))))
      .select(col("s"), col("g"), col("gram"), col("occ"))
    val pairs = grams.as("x").join(grams.as("y"),
        col("x.gram") === col("y.gram") && col("x.occ") === col("y.occ") &&
        col("x.s") < col("y.s"))
      .groupBy(col("x.s").as("a"), col("y.s").as("b"),
        col("x.g").as("ga"), col("y.g").as("gb"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= greatest(col("ga"), col("gb")) - lit(budget))
      .select(col("a"), col("b"))

    // short-string fallback: g ≤ d·q strings can share zero grams yet
    // match; block them against ALL strings within the length band
    val short = strs.where(col("g") <= budget)
      .select(col("s").as("a"), col("len").as("la"))
    val banded = short.join(
        strs.select(col("s").as("b"), col("len").as("lb")),
        col("a") =!= col("b") && abs(col("la") - col("lb")) <= maxDist)
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()

    pairs.unionByName(banded)
      .distinct()
      .withColumn("dist", levenshtein(col("a"), col("b"), maxDist))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
  }
}
