package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecisionSplitSpec extends SparkSpec {
  import spark.implicits._

  test("bestSplits: finds the clean cut and prices it exactly") {
    // feature fA separates perfectly at bin <= 2; fB is pure noise
    val rows =
      Seq.tabulate(6)(i => ("fA", (i % 3 + 1).toLong, if (i % 3 < 2) 1L else 0L)) ++
      Seq.tabulate(8)(i => ("fB", (i % 2 + 1).toLong, (i % 2).toLong))
    // fA: bins 1,2 all pos (4 rows), bin 3 all neg (2) → cut at 2, gini 0
    // fB: bin1 neg×4, bin2 pos×4 → cut at 1 is also perfect
    val out = DecisionSplit.bestSplits(rows.toDF("f", "b", "y"),
      "f", "b", "y").collect().map(r => r.getString(0) -> r).toMap
    val fa = out("fA")
    assert(fa.getLong(1) == 6L)
    // base gini: (36 - 16 - 4)/6/6 → (1e6·16 div 6) div 6 = 444444
    assert(fa.getLong(2) == 444444L)
    assert(fa.getLong(3) == 2L && fa.getLong(4) == 0L &&
      fa.getLong(5) == 444444L)
    val fb = out("fB")
    assert(fb.getLong(3) == 1L && fb.getLong(4) == 0L)
  }

  test("bestSplits: argmin tie-break on smallest bin, exact mid costs") {
    // 2 bins, each mixed the same way: any cut leaves both sides at
    // gini 0.5 → cost ties; the LOWEST bin must win deterministically
    val rows = Seq(("f", 1L, 1L), ("f", 1L, 0L), ("f", 2L, 1L),
      ("f", 2L, 0L), ("f", 3L, 1L), ("f", 3L, 0L))
    val out = DecisionSplit.bestSplits(rows.toDF("f", "b", "y"),
      "f", "b", "y").head()
    assert(out.getLong(3) == 1L)
    // left {1 pos, 1 neg}: (4-1-1)·1e6 div 2 = 1000000; right 4 rows
    // {2,2}: (16-4-4)·1e6 div 4 = 2000000 → cost 3e6, /6 = 500000 ppm
    assert(out.getLong(4) == 500000L && out.getLong(2) == 500000L &&
      out.getLong(5) == 0L)
  }

  test("bestSplits: single-bin feature yields null split; order-invariant") {
    val rows = Seq(("one", 5L, 1L), ("one", 5L, 0L), ("two", 1L, 1L),
      ("two", 2L, 0L))
    val df = rows.toDF("f", "b", "y")
    val out = DecisionSplit.bestSplits(df, "f", "b", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("one").isNullAt(3) && out("one").isNullAt(4) &&
      out("one").isNullAt(5))
    assert(out("two").getLong(3) == 1L && out("two").getLong(4) == 0L)
    val again = DecisionSplit.bestSplits(df.repartition(5).orderBy(col("b").desc),
      "f", "b", "y").collect().map(r => r.getString(0) -> r).toMap
    assert(again == out)
  }
}
