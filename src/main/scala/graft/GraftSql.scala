package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SQL-only access to the operator library: each `register*` runs an
  * operator over TEMP VIEWS and publishes the result as a temp view, so
  * a user who only speaks `spark.sql` can compose the engine's
  * operators with plain SQL before/after — the "table-valued function"
  * role, spelled as view-producing wrappers (Spark has no public TVF
  * extension point; a view of a DataFrame is plan-identical).
  *
  * The compiled scalar expressions (vec_dot, simhash64, jaro_winkler, …)
  * are registered separately by
  * [[graft.functions.expressions.GraftExtensions]]; together the two
  * cover the scalar and table halves of the SQL surface.
  *
  * Nothing here executes eagerly: registering a view captures the
  * operator's LOGICAL plan, so Catalyst optimizes the user's downstream
  * SQL together with the operator's own plan (filters push into it,
  * unused columns prune out of it) exactly as if they had composed
  * DataFrames.
  */
object GraftSql {

  /** PageRank over an edge view → `outView(node, pr_fx)` — exact
    * fixed-point integers, directly composable in SQL.
    */
  def registerPageRank(s: SparkSession, edgesView: String, srcCol: String,
      dstCol: String, iters: Int, outView: String): Unit =
    graft.operators.PageRank.ranks(s.table(edgesView), srcCol, dstCol, iters)
      .createOrReplaceTempView(outView)

  /** Exact dedup over a document view → `outView(idCol, dup_count)`:
    * one surviving id (the minimum) per distinct content value, with
    * the group size. Groups on the 16-byte md5 of the content, never
    * the multi-KB text itself.
    */
  def registerDedupExact(s: SparkSession, docsView: String, idCol: String,
      textCol: String, outView: String): Unit =
    s.table(docsView)
      .groupBy(md5(col(textCol).cast("binary")).as("__fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(col(idCol), col("dup_count"))
      .createOrReplaceTempView(outView)

  /** As-of join of two keyed/timestamped views → `outView` with the
    * right payload columns suffixed `_asof` (see
    * [[graft.operators.AsofJoin.asofJoin]] for direction/tolerance
    * semantics; `timeCol` is a numeric epoch column on both sides).
    */
  def registerAsofJoin(s: SparkSession, leftView: String, rightView: String,
      keyCol: String, timeCol: String, payloadCols: Seq[String],
      outView: String, direction: String = "backward",
      tolerance: Option[Long] = None): Unit =
    graft.operators.AsofJoin.asofJoin(s.table(leftView), s.table(rightView),
        keyCol, timeCol, payloadCols, direction = direction,
        tolerance = tolerance)
      .createOrReplaceTempView(outView)
}
