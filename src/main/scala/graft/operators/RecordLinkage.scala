package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Probabilistic record linkage (entity resolution), Fellegi-Sunter
  * form: candidate pairs from equi-join BLOCKING, a per-field
  * agreement vector, and a log-likelihood-ratio match score
  * Σᵢ wᵢ(agreeᵢ) where the field weights wᵃ = log₂(m/u),
  * wᵈ = log₂((1−m)/(1−u)) come from the caller's m/u probability
  * estimates. Two thresholds cut the score into
  * match / possible (clerical review) / non-match — the 1969
  * Fellegi-Sunter decision rule.
  *
  * Scale shape: the ONLY pair generator is the blocking equi-join —
  * a hash join keyed on the block, never a cross product; per-block
  * cost is Σ_b |A_b|·|B_b|, which is the caller's knob (pick blocks
  * like phonetic name keys or geo cells that bound the hot block).
  * Everything after candidate generation is row-local: the agreement
  * predicates and the weight sum compile into the join's projection,
  * so the whole operator is one shuffle. Weights are exact DECIMAL
  * literals and the score a row-local decimal sum — deterministic,
  * partition-invariant, SQL-oracle-reproducible.
  *
  * A hot-block guard (`maxBlockSize`) refuses degenerate blocking
  * (an all-NULL or constant key would quietly go quadratic at corpus
  * scale) rather than capping silently — blocking quality is a
  * modeling decision the caller must see.
  */
object RecordLinkage {

  /** One field comparison: `agree` evaluates over the pair frame's
    * `a_`/`b_`-prefixed columns; weights are exact decimals
    * (scale ≤ 6), positive for agreement evidence, negative for
    * disagreement.
    */
  final case class FieldComparison(name: String, agree: Column,
      agreeWeight: BigDecimal, disagreeWeight: BigDecimal)

  /** Score blocked candidate pairs of `a` × `b`.
    *
    * @param selfLink true when a and b are the SAME dataset deduping
    *                 against itself — emits each unordered pair once
    *                 (`id_a < id_b`) and never pairs a record with
    *                 itself
    * @param matchThreshold    score ≥ this ⇒ "match"
    * @param possibleThreshold score in [this, match) ⇒ "possible"
    * @return (id_a, id_b, block, agree_<field>… ∈ {0,1}, score,
    *         decision)
    */
  def linkScoredPairs(a: DataFrame, b: DataFrame, idCol: String,
      blockCol: String, comparisons: Seq[FieldComparison],
      matchThreshold: BigDecimal, possibleThreshold: BigDecimal,
      selfLink: Boolean = false, maxBlockSize: Long = 100000L): DataFrame = {
    require(comparisons.nonEmpty, "need >= 1 field comparison")
    require(matchThreshold >= possibleThreshold,
      s"matchThreshold $matchThreshold < possibleThreshold $possibleThreshold")
    def prefixed(df: DataFrame, p: String): DataFrame =
      df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$p$c"))
    val left = prefixed(a, "a_").where(col(s"a_$blockCol").isNotNull)
    val right = prefixed(b, "b_").where(col(s"b_$blockCol").isNotNull)
    // refuse degenerate blocking instead of silently going quadratic:
    // one bounded aggregate over each side's block histogram
    val hot = left.groupBy(col(s"a_$blockCol")).agg(count(lit(1)).as("n"))
      .unionAll(right.groupBy(col(s"b_$blockCol")).agg(count(lit(1)).as("n")))
      .where(col("n") > maxBlockSize).limit(1)
    require(hot.isEmpty,
      s"a '$blockCol' block exceeds $maxBlockSize rows — refine the " +
        "blocking key (hot blocks make candidate generation quadratic)")
    val joinCond = {
      val block = col(s"a_$blockCol") === col(s"b_$blockCol")
      if (selfLink) block && col(s"a_$idCol") < col(s"b_$idCol") else block
    }
    val pairs = left.join(right, joinCond)
    val dec = DecimalType(12, 6)
    val score = comparisons.map { c =>
      when(c.agree, lit(c.agreeWeight.underlying).cast(dec))
        .otherwise(lit(c.disagreeWeight.underlying).cast(dec))
    }.reduce(_ + _)
    val agreeCols = comparisons.map(c =>
      when(c.agree, 1L).otherwise(0L).as(s"agree_${c.name}"))
    pairs.select(Seq(
        col(s"a_$idCol").as("id_a"), col(s"b_$idCol").as("id_b"),
        col(s"a_$blockCol").as("block")) ++ agreeCols ++ Seq(
        score.cast(dec).as("score"),
        when(score >= lit(matchThreshold.underlying), "match")
          .when(score >= lit(possibleThreshold.underlying), "possible")
          .otherwise("non_match").as("decision")): _*)
  }
}
