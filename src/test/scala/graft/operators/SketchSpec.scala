package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Error bounds for the sketch-based aggregates (the O(1)-memory paths
  * that replace exact distinct/quantile shuffles at 100 TB). The queries
  * themselves are rows-only in the driver gate (sketch values are
  * engine-specific); these tests pin their accuracy against the exact
  * answers on real TESTDATA.
  */
class SketchSpec extends SparkSpec {

  test("approx_percentile stays within 1% of exact per group (sf0.01 lineitem)") {
    val rows = graft.sources.Tables.lineitem(spark, sf("sf0.01"))
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"),
        expr("percentile(l_extendedprice, 0.5)").as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a - e) / e < 0.01, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }
}
