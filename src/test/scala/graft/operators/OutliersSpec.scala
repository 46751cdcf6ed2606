package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics of the outlier transforms on hand-computable frames; the
  * oracle gate covers the full-table forms (a19_winsorize, a20_robust_z).
  */
class OutliersSpec extends SparkSpec {

  import org.apache.spark.sql.Row

  private def frame = {
    import spark.implicits._
    // group a: 1..10 plus an outlier 1000; group b: constant
    ((1 to 10).map(i => ("a", i.toDouble)) :+ ("a", 1000.0))
      .++((1 to 5).map(_ => ("b", 7.0))).toDF("g", "x")
  }

  test("winsorize clamps both tails to the group quantiles and keeps row count") {
    val out = Outliers.winsorize(frame, "x", Seq("g"), lo = 0.1, hi = 0.9)
    assert(out.count() == 16)
    val a = out.where(col("g") === "a").select(col("x_w")).collect().map(_.getDouble(0))
    // both tails clamp to the group's own exact percentiles (taken from
    // the same aggregate the operator uses — the assertion is that the
    // clamp applied them, not a reimplementation of interpolation)
    val Row(p10: Double, p90: Double) = frame.where(col("g") === "a")
      .agg(expr("percentile(x, 0.1)"), expr("percentile(x, 0.9)")).head()
    assert(a.min == p10, s"lower tail clamps to p10=$p10, got ${a.min}")
    assert(a.max == p90 && a.max < 1000.0, s"outlier clamps to p90=$p90, got ${a.max}")
    // interior values pass through untouched
    assert(out.where(col("g") === "a" && col("x") === 5.0)
      .head().getAs[Double]("x_w") == 5.0)
    // constant group: lo == hi == the constant, everything maps to it
    assert(out.where(col("g") === "b").select(col("x_w"))
      .collect().forall(_.getDouble(0) == 7.0))
  }

  test("winsorizeAll ≡ per-column winsorize, in ONE aggregate exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val two = frame.withColumn("y", col("x") * 2 + 1)
    val all = Outliers.winsorizeAll(two, Seq("x", "y"), Seq("g"), lo = 0.1, hi = 0.9)
    val perCol = Outliers.winsorize(
      Outliers.winsorize(two, "x", Seq("g"), lo = 0.1, hi = 0.9),
      "y", Seq("g"), lo = 0.1, hi = 0.9)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("g"), r.getAs[Double]("x"), r.getAs[Double]("x_w"),
        r.getAs[Double]("y_w"))
    assert(all.collect().map(key).sorted.toSeq ==
      perCol.collect().map(key).sorted.toSeq)
    // the whole stats side is ONE aggregate pass regardless of column
    // count — per-column calls pay one scan + aggregate per feature. On
    // a real (multi-partition parquet) input: exactly one shuffle, and
    // one aggregate subtree feeding the broadcast.
    val li = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice"), col("l_quantity"))
    val wide = Outliers.winsorizeAll(li,
      Seq("l_extendedprice", "l_quantity"), Seq("l_returnflag"))
    wide.count() // materialize so AQE's final plan is inspectable
    val shuffles = wide.queryExecution.executedPlan.collectWithSubqueries {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.size <= 1, s"expected at most 1 shuffle, got ${shuffles.size}")
  }

  test("robustZScoreAll ≡ per-column robustZScore, in two aggregate passes total") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val two = frame.withColumn("y", col("x") * 3 - 2)
    val all = Outliers.robustZScoreAll(two, Seq("x", "y"), Seq("g"))
    val perCol = Outliers.robustZScore(
      Outliers.robustZScore(two, "x", Seq("g"), out = "x_rz"),
      "y", Seq("g"), out = "y_rz")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("g"), r.getAs[Double]("x"), r.getAs[Double]("x_rz"),
        r.getAs[Double]("y_rz"))
    assert(all.collect().map(key).sorted.toSeq ==
      perCol.collect().map(key).sorted.toSeq)
    // two stat aggregates total (median pass + MAD pass), never 2k
    val li = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice"), col("l_quantity"))
    val wide = Outliers.robustZScoreAll(li,
      Seq("l_extendedprice", "l_quantity"), Seq("l_returnflag"))
    wide.count()
    val shuffles = wide.queryExecution.executedPlan.collectWithSubqueries {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.size <= 2, s"expected at most 2 shuffles, got ${shuffles.size}")
  }

  test("robustZScore centers on the median, scales by MAD, and survives MAD=0") {
    val out = Outliers.robustZScore(frame, "x", Seq("g"))
    // group a: median 6, deviations [5,4,3,2,1,0,1,2,3,4,994] → MAD 3
    val at8 = out.where(col("g") === "a" && col("x") === 8.0).head().getAs[Double]("rz")
    assert(math.abs(at8 - (8.0 - 6.0) / 3.0) < 1e-12, s"got $at8")
    // the outlier lands far out but finite
    val atOut = out.where(col("x") === 1000.0).head().getAs[Double]("rz")
    assert(math.abs(atOut - (1000.0 - 6.0) / 3.0) < 1e-9)
    // constant group: MAD = 0 falls back to scale 1 → rz = 0, never NaN/inf
    val b = out.where(col("g") === "b").select(col("rz")).collect().map(_.getDouble(0))
    assert(b.forall(_ == 0.0), b.mkString(","))
  }
}
