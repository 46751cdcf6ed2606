package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("ols2: recovers an exact planted linear relation") {
    // y = 7 + 3·x1 − 2·x2 exactly → residuals 0, r2 = 1
    val pts = for (x1 <- 1L to 6L; x2 <- 1L to 5L)
      yield ("g", x1, x2, 7L + 3L * x1 - 2L * x2)
    val out = Regression.ols2(pts.toDF("g", "x1", "x2", "y"),
      Seq("g"), "y", "x1", "x2").head()
    assert(out.getLong(1) == 30L)
    assert(out.getDouble(2) == 7.0 && out.getDouble(3) == 3.0 &&
      out.getDouble(4) == -2.0 && out.getDouble(5) == 1.0)
  }

  test("ols2: matches a hand normal-equation solve with noise") {
    // planted slope + deterministic integer "noise" (i mod 3 - 1)
    val pts = (0L until 40L).map { i =>
      val x1 = i % 7; val x2 = (i * 3) % 5
      ("g", x1, x2, 10L + 2L * x1 + x2 + (i % 3) - 1L)
    }
    val df = pts.toDF("g", "x1", "x2", "y")
    val out = Regression.ols2(df, Seq("g"), "y", "x1", "x2").head()
    // reference solve in plain Scala doubles from exact integer moments
    val n = pts.size.toDouble
    val (sy, s1, s2) = (pts.map(_._4).sum.toDouble,
      pts.map(_._2).sum.toDouble, pts.map(_._3).sum.toDouble)
    val s11 = pts.map(p => p._2 * p._2).sum.toDouble
    val s22 = pts.map(p => p._3 * p._3).sum.toDouble
    val s12 = pts.map(p => p._2 * p._3).sum.toDouble
    val s1y = pts.map(p => p._2 * p._4).sum.toDouble
    val s2y = pts.map(p => p._3 * p._4).sum.toDouble
    val (c11, c22, c12) = (n * s11 - s1 * s1, n * s22 - s2 * s2,
      n * s12 - s1 * s2)
    val (c1y, c2y) = (n * s1y - s1 * sy, n * s2y - s2 * sy)
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c2y * c11 - c1y * c12) / det
    val b0 = (sy - b1 * s1 - b2 * s2) / n
    assert(math.abs(out.getDouble(2) - b0) < 1e-6)
    assert(math.abs(out.getDouble(3) - b1) < 1e-6)
    assert(math.abs(out.getDouble(4) - b2) < 1e-6)
    // exact moments make the fit partition-order invariant
    val again = Regression.ols2(df.repartition(11).orderBy(col("y").desc),
      Seq("g"), "y", "x1", "x2").head()
    assert(again == out)
  }

  test("ols2: singular (collinear) and tiny groups return null fits") {
    // x2 = 2·x1 → det 0; and a 2-row group is underdetermined
    val sing = (1L to 10L).map(i => ("s", i, 2 * i, 3 * i))
    val tiny = Seq(("t", 1L, 5L, 2L), ("t", 2L, 1L, 4L))
    val out = Regression.ols2((sing ++ tiny).toDF("g", "x1", "x2", "y"),
      Seq("g"), "y", "x1", "x2")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("s").isNullAt(2) && out("s").isNullAt(3) &&
      out("s").isNullAt(4))
    assert(out("t").isNullAt(3) && out("t").isNullAt(4))
  }
}
