package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CausalSpec extends SparkSpec {
  import spark.implicits._

  // A textbook Simpson's-paradox table: within each stratum the
  // treatment HELPS (+), but treated rows concentrate in the
  // low-outcome stratum, so the naive pooled difference flips sign.
  //   stratum L: treat 8/10 cured, ctrl 6/10  → ate +200000 ppm
  //   stratum H: treat 19/20 cured, ctrl 5/6  → ate +116666 ppm
  //   pooled: treat 27/30 = 0.9, ctrl 11/16 = 0.6875 → naive +212500
  // (here naive overstates; the classic flip needs other numbers, the
  // point is naive != stratified and both are exact)
  private def rows(strat: String, t: Int, y1: Int, y0: Int, n1: Int,
      n0: Int) =
    Seq.fill(y1)((strat, 1L, 1L)) ++ Seq.fill(n1 - y1)((strat, 1L, 0L)) ++
      Seq.fill(y0)((strat, 0L, 1L)) ++ Seq.fill(n0 - y0)((strat, 0L, 0L))

  private def df = (rows("L", 1, 8, 6, 10, 10) ++
    rows("H", 1, 19, 5, 20, 6)).toDF("s", "t", "y")

  test("strataEffects: exact per-stratum ppm differences") {
    val out = Causal.strataEffects(df, Seq("s"), "t", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(out("L") == ((10L, 10L, 8L, 6L, 200000L)))
    // 19/20 - 5/6 = (19·6 - 5·20)/(20·6) = 14/120 → 116666 ppm
    assert(out("H") == ((20L, 6L, 19L, 5L, 116666L)))
  }

  test("strataEffects: single-arm stratum yields null effect") {
    val d2 = (rows("L", 1, 1, 1, 2, 2) ++
      Seq(("X", 1L, 1L), ("X", 1L, 0L))).toDF("s", "t", "y")
    val x = Causal.strataEffects(d2, Seq("s"), "t", "y")
      .where(col("s") === "X").head()
    assert(x.getLong(2) == 0L && x.isNullAt(5))
  }

  test("stratifiedAte: size-weighted average, off-support excluded") {
    val out = Causal.stratifiedAte(df, Seq("s"), "t", "y").head()
    assert(out.getLong(0) == 46L && out.getLong(1) == 46L &&
      out.getLong(2) == 2L)
    // naive: (27·16 - 11·30)/(30·16) = 102/480 → 212500 ppm
    assert(out.getLong(3) == 212500L)
    // weighted: (20·200000 + 26·116666) div 46 = 152898
    assert(out.getLong(4) == (20L * 200000L + 26L * 116666L) / 46L)
    // adding an off-support stratum changes support counts, not the ate
    val d3 = df.unionAll(Seq(("Z", 1L, 1L), ("Z", 1L, 1L)).toDF("s", "t", "y"))
    val o3 = Causal.stratifiedAte(d3, Seq("s"), "t", "y").head()
    assert(o3.getLong(0) == 48L && o3.getLong(1) == 46L &&
      o3.getLong(2) == 3L && o3.getLong(4) == out.getLong(4))
  }

  test("stratifiedAte: partition-order invariant") {
    val a = Causal.stratifiedAte(df.repartition(7), Seq("s"), "t", "y").head()
    val b = Causal.stratifiedAte(df.orderBy(col("y").desc), Seq("s"), "t", "y")
      .head()
    assert(a == b)
  }
}
