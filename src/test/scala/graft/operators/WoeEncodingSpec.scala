package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WoeEncodingSpec extends SparkSpec {
  import spark.implicits._

  // feature f: category A (3 pos, 1 neg), category B (1 pos, 3 neg)
  private def df = (Seq.fill(3)(("f", "A", 1L)) ++ Seq(("f", "A", 0L)) ++
    Seq(("f", "B", 1L)) ++ Seq.fill(3)(("f", "B", 0L)))
    .toDF("feat", "cat", "y")

  test("woeTable: hand-computed smoothed WOE and IV") {
    val out = WoeEncoding.woeTable(df, "feat", "cat", "y")
      .collect().map(r => r.getString(1) -> r).toMap
    // woe_A = ln(((2·3+1)(4+1)) / ((2·1+1)(4+1))) = ln(7/3) = 0.8473
    assert(out("A").getLong(2) == 3L && out("A").getLong(3) == 1L)
    assert(out("A").getDouble(4) == 0.8473)
    assert(out("B").getDouble(4) == -0.8473)
    // iv = 2 · (0.7 − 0.3)·ln(7/3) = 0.6778, same on both rows
    assert(out("A").getDouble(5) == 0.6778 &&
      out("B").getDouble(5) == 0.6778)
  }

  test("woeTable: zero cell survives via half-count smoothing") {
    // category Z has no positives: woe must be finite and negative
    val d2 = df.unionAll(Seq.fill(4)(("f", "Z", 0L)).toDF("feat", "cat", "y"))
    val z = WoeEncoding.woeTable(d2, "feat", "cat", "y")
      .where(col("category") === "Z").head()
    assert(z.getLong(2) == 0L && z.getLong(3) == 4L)
    // ln((1·(8+1)) / (9·(4+1))) = ln(9/45) = ln(0.2) = -1.6094
    assert(z.getDouble(4) == -1.6094)
  }

  test("woeTable: multi-feature melt prices independently; order-invariant") {
    val two = df.unionAll(
      (Seq.fill(2)(("g", "X", 1L)) ++ Seq.fill(2)(("g", "Y", 0L)))
        .toDF("feat", "cat", "y"))
    val out = WoeEncoding.woeTable(two, "feat", "cat", "y")
    assert(out.select(col("feature")).distinct().count() == 2L)
    val a = out.collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val again = WoeEncoding.woeTable(two.repartition(7).orderBy(col("y")),
      "feat", "cat", "y")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(again == a)
    // within-feature totals: g has P=2, N=2 → X woe = ln((5·3)/(1·3)) =
    // ln 5 = 1.6094
    assert(a(("g", "X")).getDouble(4) == 1.6094)
  }
}
