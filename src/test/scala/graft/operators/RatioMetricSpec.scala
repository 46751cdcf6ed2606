package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RatioMetricSpec extends SparkSpec {
  import spark.implicits._

  test("ratioDelta: hand-checked ratios and delta variance") {
    // arm 0: users (y, x) = (10, 2), (20, 2) → R = 30/4 = 7.5
    // arm 1: (30, 2), (10, 2) → R = 40/4 = 10
    val df = Seq((0L, 10L, 2L), (0L, 20L, 2L), (1L, 30L, 2L), (1L, 10L, 2L))
      .toDF("arm", "y", "x")
    val out = RatioMetric.ratioDelta(df, "arm", "y", "x").head()
    assert(out.getLong(0) == 2L && out.getLong(1) == 2L)
    assert(out.getDouble(2) == 7.5 && out.getDouble(3) == 10.0)
    assert(out.getDouble(4) == 2.5)
    // constant x=2: the delta variance degenerates to Var(ȳ)/x̄²:
    // arm0 s_y²=50 → V = (50/2)/4 = 6.25; arm1 s_y²=200 → V = 25
    // output rounds at 6dp
    assert(math.abs(out.getDouble(5) - math.sqrt(31.25)) < 1e-6)
    assert(out.getDouble(6) == ((10.0 - 7.5) / math.sqrt(31.25) * 10000).round / 10000.0)
    // order invariance via exact moments
    val again = RatioMetric.ratioDelta(df.repartition(5).orderBy(col("y").desc),
      "arm", "y", "x").head()
    assert(again == out)
  }

  test("ratioDelta: degenerate arms yield null inference") {
    // arm 1 has one user → n < 2 → null ratio-side stats
    val df = Seq((0L, 10L, 2L), (0L, 20L, 2L), (1L, 30L, 2L))
      .toDF("arm", "y", "x")
    val out = RatioMetric.ratioDelta(df, "arm", "y", "x").head()
    assert(out.isNullAt(3) && out.isNullAt(6))
    // zero denominator arm
    val z = RatioMetric.ratioDelta(
      Seq((0L, 10L, 0L), (0L, 20L, 0L), (1L, 30L, 2L), (1L, 10L, 2L))
        .toDF("arm", "y", "x"), "arm", "y", "x").head()
    assert(z.isNullAt(2) && z.isNullAt(6))
  }
}
