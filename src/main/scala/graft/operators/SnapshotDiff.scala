package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff of two table snapshots — the inverse of the CDC-apply
  * direction ([[Scd.applyChanges]] consumes a change feed; this
  * derives one when all you have is yesterday's and today's full
  * snapshot, the common state of an ingested 100 TB upstream table).
  *
  * Shape: ONE full-outer equi-join on the key columns decides
  * inserted / deleted / updated / unchanged per key; row equality is
  * a single codegen'd `xxhash64` over the canonically-ordered non-key
  * columns computed map-side BEFORE the shuffle, so the join carries
  * (key, 8-byte hash) per side, not the full row width — at 100 TB
  * the exchange moves keys + hashes, and with both snapshots stored
  * bucketed by key ([[Layout.writeBucketed]]) it moves nothing.
  *
  * xxhash64 row-compare is exact for the change DECISION (collisions
  * would mark a changed row unchanged with probability ~2^-64 per
  * key); pipelines that must be collision-proof pass
  * `exact = true` to compare the struct of value columns directly
  * (wider shuffle, same plan shape).
  */
object SnapshotDiff {

  /** (key columns…, change) — `change` ∈ insert | delete | update;
    * unchanged keys are dropped (they are the bulk at scale and
    * carry no information — count them as `|new| - |inserts| -
    * |updates|`).
    */
  def changes(oldSnap: DataFrame, newSnap: DataFrame, keyCols: Seq[String],
      exact: Boolean = false): DataFrame = {
    val valueCols = {
      val o = oldSnap.columns.filterNot(keyCols.contains).sorted
      val n = newSnap.columns.filterNot(keyCols.contains).sorted
      require(o.sameElements(n),
        s"snapshots disagree on value columns: ${o.mkString(",")} vs ${n.mkString(",")}")
      o.toSeq
    }
    def sig(df: DataFrame, as: String) = {
      // xxhash64 skips null inputs (they leave the seed untouched), so
      // (null, x) and (x, null) could hash alike; a never-null isNull
      // flag per column keeps every position contributing
      val fp = if (exact) struct(valueCols.map(col): _*)
        else xxhash64(valueCols.flatMap(c =>
          Seq(col(c).isNull.cast("int"), col(c))): _*)
      df.select(keyCols.map(col) :+ fp.as(as): _*)
    }
    sig(oldSnap, "__old").join(sig(newSnap, "__new"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__old").isNull, lit("insert"))
          .when(col("__new").isNull, lit("delete"))
          .when(not(col("__old") <=> col("__new")), lit("update")))
      .where(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  /** One-row summary: inserted/deleted/updated/unchanged counts —
    * the drift monitor a scheduled ingest job alerts on.
    */
  def summary(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val ch = changes(oldSnap, newSnap, keyCols)
      .groupBy().pivot("change", Seq("insert", "delete", "update")).count()
      .select(coalesce(col("insert"), lit(0L)).as("n_insert"),
        coalesce(col("delete"), lit(0L)).as("n_delete"),
        coalesce(col("update"), lit(0L)).as("n_update"))
    ch.crossJoin(broadcast(newSnap.agg(count(lit(1)).as("__nn"))))
      .withColumn("n_unchanged",
        col("__nn") - col("n_insert") - col("n_update"))
      .drop("__nn")
  }
}
