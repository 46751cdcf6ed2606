package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the engine-side version of
  * the reference's ad-hoc sanity scans (analysis.py's null/sentinel
  * audits before modeling): a rule set evaluated into one violation
  * report, cheap enough to run on every ingest batch.
  *
  * Scale shape: all predicate rules over one table fold into a SINGLE
  * aggregate pass (k rules ≠ k scans — the [[Outliers.winsorizeAll]]
  * discipline), unpivoted to (rule, n_violations) rows by a zero-
  * shuffle Expand. Uniqueness is one hash aggregate; referential
  * integrity is one left-anti join (Bloom-prunable at 100 TB exactly
  * like [[Dedup.bloomOf]]).
  */
object DataQuality {

  /** A named expectation; `violation` is TRUE on rows that BREAK it. */
  case class Check(name: String, violation: Column)

  /** Evaluate every check in one aggregate pass over `df`.
    * @return (rule, n_violations) — one row per check
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.map(c =>
      sum(when(c.violation, lit(1L)).otherwise(lit(0L))).as(c.name))
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array.empty[Column], checks.map(c => col(c.name)).toArray,
        "rule", "n_violations")
  }

  /** Duplicate-key violation count: rows beyond the first per key. */
  def duplicates(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n") - lit(1L)).cast("long").as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))

  /** Referential-integrity violation count: child keys absent from the
    * parent (null child keys are counted by a null-check rule, not
    * here — they would vacuously anti-join as orphans).
    */
  def orphans(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String): DataFrame =
    child.where(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))
}
