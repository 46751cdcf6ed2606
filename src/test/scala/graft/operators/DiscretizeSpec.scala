package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DiscretizeSpec extends SparkSpec {

  test("equal-frequency bins: balanced counts on distinct values, all bins hit") {
    import spark.implicits._
    // 0..999 scrambled deterministically (multiplicative hash permutation)
    val df = (0 until 1000).map(i => math.floorMod(i * 387420489, 1000).toDouble)
      .toDF("v")
    val cuts = Discretize.fitQuantileBins(df, "v", k = 10)
    val counts = Discretize.assignBins(df, "v", cuts)
      .groupBy("bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 10).toSet)
    // percentile cuts on 1000 distinct uniform values: 100 ± 1 per bin
    assert(counts.values.forall(c => c >= 99 && c <= 101), counts.toString)
  }

  test("a value exactly on a cut belongs to the LOWER bin; nulls stay null") {
    import spark.implicits._
    // quartiles of 1..5 are 2, 3, 4 exactly (linear interpolation on ints)
    val fit = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val cuts = Discretize.fitQuantileBins(fit, "v", k = 4)
    assert(cuts.head().getSeq[Double](0) == Seq(2.0, 3.0, 4.0))
    val probe = Seq[(java.lang.Double, String)](
      (2.0, "on-cut"), (2.5, "mid"), (4.0, "on-top-cut"), (5.0, "above"),
      (null, "null")).toDF("v", "tag")
    val bins = Discretize.assignBins(probe, "v", cuts)
      .collect().map(r => r.getString(1) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(bins("on-cut") == Some(0))     // v == cut → lower bin
    assert(bins("mid") == Some(1))
    assert(bins("on-top-cut") == Some(2))
    assert(bins("above") == Some(3))
    assert(bins("null") == None)
  }

  test("cuts snap to statScale decimals") {
    import spark.implicits._
    val df = Seq(0.123456789, 0.987654321, 0.5555555555).toDF("v")
    val cuts = Discretize.fitQuantileBins(df, "v", k = 2, statScale = 3)
      .head().getSeq[Double](0)
    assert(cuts == Seq(0.556)) // median snapped to 3 decimals
  }

  test("rejects k < 2") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Discretize.fitQuantileBins(Seq(1.0).toDF("v"), "v", k = 1)
    }
  }

  test("literal-cuts assignment ≡ the plan-pure array fold, nulls included") {
    import spark.implicits._
    val df = ((0 until 500).map(i =>
      Some(math.floorMod(i * 2654435761L, 997L).toDouble)) :+ None)
      .toDF("v")
    val cuts = Discretize.fitQuantileBins(df, "v", k = 7)
    val hof = Discretize.assignBins(df, "v", cuts)
      .collect().map(r => if (r.isNullAt(1)) -1 else r.getInt(1)).toSeq
    val lit = Discretize.assignBinsLit(df, "v", Discretize.cutsOf(cuts))
      .collect().map(r => if (r.isNullAt(1)) -1 else r.getInt(1)).toSeq
    assert(lit == hof)
  }

  test("approx fit lands within one rank-error band of the exact cuts") {
    import spark.implicits._
    val df = (0 until 2000).map(i =>
      math.floorMod(i * 387420489L, 2000L).toDouble).toDF("v")
    val exact = Discretize.cutsOf(Discretize.fitQuantileBins(df, "v", 10))
    val approx = Discretize.cutsOf(
      Discretize.fitQuantileBinsApprox(df, "v", 10, accuracy = 10000))
    // 2000 distinct uniform values, accuracy 10000 → ≤ 1 rank off
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) <= 2.0, s"exact=$e approx=$a")
    }
  }
}
