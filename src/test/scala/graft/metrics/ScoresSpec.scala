package graft.metrics

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A5-A10 against hand-computed values. */
class ScoresSpec extends SparkSpec {
  import Scores._

  private def tp = {
    import spark.implicits._
    // (target, pred): apes vs PRED = 0.1/1.1≈0.0909, 0, 0.5/2.5=0.2
    Seq((1.0, 1.1), (2.0, 2.0), (3.0, 2.5)).toDF("t", "p")
  }

  test("A5: MAPE uses the prediction as denominator (quirk X4)") {
    val m = tp.agg(mape(col("t"), col("p"))).head().getDouble(0)
    val expected = (0.1 / 1.1 + 0.0 + 0.5 / 2.5) / 3
    assert(math.abs(m - expected) < 1e-12)
  }

  test("A6: competition score = 0.2(1−MAPE) + 0.8 P(ape≤0.05), X3 fixed") {
    val s = tp.agg(competitionScore(col("t"), col("p"))).head().getDouble(0)
    val mapeV = (0.1 / 1.1 + 0.0 + 0.5 / 2.5) / 3
    val acc = 1.0 / 3 // only the exact prediction has ape ≤ 0.05
    assert(math.abs(s - (0.2 * (1 - mapeV) + 0.8 * acc)) < 1e-12)
  }

  test("A7: MAE (the reference's mis-named cal_mse)") {
    val m = tp.agg(mae(col("t"), col("p"))).head().getDouble(0)
    assert(math.abs(m - (0.1 + 0.0 + 0.5) / 3) < 1e-12)
  }

  test("A8: Pearson matches closed form") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("t", "p")
    val r = df.agg(corr(col("t"), col("p"))).head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("regressionReport computes everything in one pass") {
    val r = regressionReport(tp, "t", "p").head()
    assert(r.getAs[Long]("n") == 3)
    assert(r.getAs[Double]("accuracy") > 0.3 && r.getAs[Double]("accuracy") < 0.34)
  }

  test("A9: macro F1 on a hand-checked confusion matrix") {
    import spark.implicits._
    // labels: a a b c ; preds: a b b b
    // class a: P=1, R=1/2, F1=2/3; class b: P=1/3, R=1, F1=1/2; class c: F1=0
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("c", "b")).toDF("l", "p")
    val f1 = macroF1(df, "l", "p").head().getDouble(0)
    assert(math.abs(f1 - (2.0 / 3 + 0.5 + 0.0) / 3) < 1e-12)
  }

  test("A10: filtered MRR removes known-true competitors but keeps the target") {
    import spark.implicits._
    // One query (h=0, r=0, target=1). Candidates 1,2,3 with scores 1.0, 3.0, 2.0.
    // Unfiltered rank of target = 3. Triplet (0,0,2) is known-true → candidate 2
    // is filtered, leaving scores {1:1.0, 3:2.0} → target rank 2, MRR = 0.5.
    val valid = Seq((0L, 0L, 1L)).toDF("head_id", "relation_id", "tail_id")
    val allTrue = Seq((0L, 0L, 1L), (0L, 0L, 2L)).toDF("head_id", "relation_id", "tail_id")
    val scores = Seq((0L, 0L, 1L, 1.0), (0L, 0L, 2L, 3.0), (0L, 0L, 3L, 2.0))
      .toDF("head_id", "relation_id", "candidate_id", "score")
    val r = filteredMrr(valid, allTrue, scores).head()
    assert(math.abs(r.getAs[Double]("mrr") - 0.5) < 1e-12)
    assert(r.getAs[Double]("hits1") == 0.0)
    assert(r.getAs[Double]("hits3") == 1.0)
    assert(r.getAs[Long]("n_queries") == 1)
  }
}
