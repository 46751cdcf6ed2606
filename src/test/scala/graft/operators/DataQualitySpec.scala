package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  import DataQuality.{Check, duplicates, orphans, report}

  private val df = Seq(
    (Some(1L), 10.0), (None, -5.0), (Some(3L), 0.0), (Some(3L), 7.5)
  ).toDF("k", "v")

  test("report evaluates every rule in one pass with exact counts") {
    val r = report(df, Seq(
      Check("null_k", col("k").isNull),
      Check("nonpositive_v", col("v") <= 0),
      Check("never", lit(false))))
      .as[(String, Long)].collect().toMap
    assert(r === Map("null_k" -> 1L, "nonpositive_v" -> 2L, "never" -> 0L))
  }

  test("report is a single aggregate: one row per rule, no extra scan nodes") {
    val r = report(df, Seq(Check("a", lit(true)), Check("b", lit(false))))
    // one Expand over one Aggregate over one scan — two scans would show
    // as two LocalTableScan/Scan leaves
    val leaves = r.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1, s"expected one scan leaf, got:\n${r.queryExecution.optimizedPlan}")
  }

  test("duplicates counts rows beyond the first per key") {
    val d = duplicates(df, "dup_k", Seq("k")).as[(String, Long)].collect().toSeq
    assert(d === Seq(("dup_k", 1L)))
  }

  test("orphans counts child keys missing from the parent, ignoring nulls") {
    val parent = Seq(1L, 2L).toDF("pk")
    val o = orphans(df, "k", parent, "pk", "orphan_k").as[(String, Long)].collect().toSeq
    assert(o === Seq(("orphan_k", 2L))) // the two k=3 rows; the null row is excluded
  }
}
