package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TargetEncodeSpec extends SparkSpec {

  private def toy = {
    import spark.implicits._
    // cat A: fold 0 labels (10, 20), fold 1 label (40)
    // cat B: fold 0 label (100)            — B absent from fold 1
    Seq(("A", 0, 10.0), ("A", 0, 20.0), ("A", 1, 40.0), ("B", 0, 100.0))
      .toDF("cat", "fold", "y")
  }

  test("out-of-fold means match the hand-computed smoothed formula") {
    val m = 2.0
    val prior = (10.0 + 20.0 + 40.0 + 100.0) / 4 // 42.5
    val enc = TargetEncode.oofEncoding(toy, "cat", "y", "fold",
        smoothing = m, outScale = 6)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    def exp(oofSum: Double, oofN: Long): Double =
      BigDecimal((oofSum + m * prior) / (oofN + m))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(enc(("A", 0)) == exp(40.0, 1))  // other-fold A rows: just the 40
    assert(enc(("A", 1)) == exp(30.0, 2))  // other-fold A rows: 10+20
    assert(enc(("B", 0)) == exp(0.0, 0))   // no other-fold B rows → pure prior
  }

  test("leakage guard: a row's own fold labels do not move its encoding " +
      "(prior held fixed)") {
    import spark.implicits._
    // Same global sum/count (prior unchanged), but fold-0 A labels shifted
    // and fold-1 A label adjusted to compensate: enc(A, 1) — which only
    // reads fold-0 A rows and the prior — must move; enc over fold-0's own
    // perturbation must equal the original only through fold-1's label.
    val shifted = Seq(("A", 0, 15.0), ("A", 0, 15.0), ("A", 1, 40.0),
      ("B", 0, 100.0)).toDF("cat", "fold", "y")
    val e0 = TargetEncode.oofEncoding(toy, "cat", "y", "fold", 2.0, 6)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val e1 = TargetEncode.oofEncoding(shifted, "cat", "y", "fold", 2.0, 6)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    // fold-0's encoding reads only fold-1 labels + prior: both unchanged
    assert(e0(("A", 0)) == e1(("A", 0)))
    // fold-1's encoding reads fold-0 labels: sum unchanged (10+20 = 15+15)
    assert(e0(("A", 1)) == e1(("A", 1)))
  }

  test("applyEncoding broadcasts back and falls back to the prior for unseen cats") {
    import spark.implicits._
    val enc = TargetEncode.oofEncoding(toy, "cat", "y", "fold", 2.0, 6)
    val rows = Seq(("A", 0), ("B", 0), ("C", 1)).toDF("cat", "fold")
    val out = TargetEncode.applyEncoding(rows, enc, "cat", "fold",
        fallbackPrior = 42.5)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("C") == 42.5)
    assert(out("A") > 0 && out("B") > 0)
  }

  test("rejects non-positive smoothing") {
    intercept[IllegalArgumentException] {
      TargetEncode.oofEncoding(toy, "cat", "y", "fold", smoothing = 0.0)
    }
  }
}
