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

  test("X3 compat flag: as-coded accuracy is count/n², intended is count/n") {
    import spark.implicits._
    // APEs vs pred: |10.4-10|/10 = 0.04, |11-10|/10 = 0.1, |9.8-10|/10 = 0.02
    // → 2 of 3 within τ=0.05: intended 2/3; reference-as-coded 2/9
    val df = Seq((10.4, 10.0), (11.0, 10.0), (9.8, 10.0)).toDF("t", "p")
    val r = df.agg(
      thresholdedAccuracy(col("t"), col("p"), 0.05).as("intended"),
      thresholdedAccuracy(col("t"), col("p"), 0.05, compatX3 = true).as("ascoded"))
      .head()
    assert(math.abs(r.getAs[Double]("intended") - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("ascoded") - 2.0 / 9) < 1e-12)
  }

  test("filteredMrrAdditive: hand-computed ranks from one sorted sum table") {
    import spark.implicits._
    // entity sums: e0=0.0 e1=3.0 e2=1.0 e3=2.0 → candidate order
    // (esum ASC) = e0, e2, e3, e1. Query (h=0, r=0, target=1):
    // unfiltered grank(e1) = 4; true tails of (0,0) are {1, 2}; e2 sits
    // ahead of e1 → filtered rank 3, MRR = 1/3.
    val eSums = Seq((0L, 0.0), (1L, 3.0), (2L, 1.0), (3L, 2.0))
      .toDF("entity_id", "esum")
    val rSums = Seq((0L, 0.0)).toDF("relation_id", "rsum")
    val valid = Seq((0L, 0L, 1L)).toDF("head_id", "relation_id", "tail_id")
    val allTrue = Seq((0L, 0L, 1L), (0L, 0L, 2L))
      .toDF("head_id", "relation_id", "tail_id")
    val r = filteredMrrAdditive(valid, allTrue, eSums, rSums).head()
    assert(math.abs(r.getAs[Double]("mrr") - 1.0 / 3) < 1e-12)
    assert(r.getAs[Double]("hits1") == 0.0)
    assert(r.getAs[Double]("hits3") == 1.0)
    assert(r.getAs[Long]("n_queries") == 1)
  }

  test("filteredMrrAdditive ≡ filteredMrr over the Q×E candidate table") {
    import spark.implicits._
    import graft.car.EmbeddingTrainer
    // deterministic pseudo-random embeddings (12 entities, 3 relations)
    val entFlat = EmbeddingTrainer.initFlat(spark, 12, 4, seed = 7L)
    val relFlat = EmbeddingTrainer.initFlat(spark, 3, 4, seed = 8L)
    val ent = EmbeddingTrainer.assemble(entFlat, "entity_id")
    val rel = EmbeddingTrainer.assemble(relFlat, "relation_id")
    // duplicate query, multiple targets per (h, r), a query with an
    // unknown head (99 → dropped by both paths), an unknown true tail
    val valid = Seq((0L, 0L, 3L), (0L, 0L, 3L), (1L, 1L, 5L), (2L, 2L, 7L),
      (4L, 0L, 0L), (9L, 1L, 11L), (99L, 0L, 1L))
      .toDF("head_id", "relation_id", "tail_id")
    val allTrue = valid.unionAll(Seq((0L, 0L, 5L), (0L, 0L, 6L),
        (2L, 2L, 1L), (9L, 1L, 2L), (1L, 1L, 99L))
      .toDF("head_id", "relation_id", "tail_id")).distinct()
    val dense = filteredMrr(valid, allTrue,
      EmbeddingTrainer.scoreAllCandidates(valid, ent, rel)).head()
    // the additive path reads per-id sums; derive them the same way
    // scoreAllCandidates does so both paths see identical doubles
    val eSums = ent.select(col("entity_id"), explode(col("vector")).as("x"))
      .groupBy(col("entity_id")).agg(sum(col("x")).as("esum"))
    val rSums = rel.select(col("relation_id"), explode(col("vector")).as("x"))
      .groupBy(col("relation_id")).agg(sum(col("x")).as("rsum"))
    val sparse = filteredMrrAdditive(valid, allTrue, eSums, rSums).head()
    assert(sparse.getAs[Long]("n_queries") == 6)
    assert(sparse.getAs[Long]("n_queries") == dense.getAs[Long]("n_queries"))
    for (c <- Seq("mrr", "hits1", "hits3", "hits10"))
      assert(math.abs(sparse.getAs[Double](c) - dense.getAs[Double](c)) < 1e-12,
        s"$c: additive=${sparse.getAs[Double](c)} dense=${dense.getAs[Double](c)}")
  }

  test("aucRoc: hand value, tie averaging, degenerate groups null") {
    import spark.implicits._
    // group g1: scores 1,2,3,4 labels 0,0,1,1 → perfect separation, AUC 1
    // group g2: pos {3,1}, neg {2,1} — pairs: (3>2)=1, (3>1)=1,
    //   (1,2)=0, (1=1)=½ → AUC = 2.5/4 = 0.625, exercises tie averaging
    val df = Seq(
      ("g1", 1L, 0L), ("g1", 2L, 0L), ("g1", 3L, 1L), ("g1", 4L, 1L),
      ("g2", 3L, 1L), ("g2", 1L, 1L), ("g2", 2L, 0L), ("g2", 1L, 0L),
      ("g3", 5L, 1L), ("g3", 6L, 1L) // no negatives → undefined
    ).toDF("grp", "s", "y")
    val out = Scores.aucRoc(df, "s", "y", Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").getLong(3) == 1000000L && out("g1").getDouble(4) == 1.0)
    assert(out("g2").getLong(3) == 625000L && out("g2").getDouble(4) == 0.625)
    assert(out("g3").isNullAt(3) && out("g3").isNullAt(4))
    // invariant under row order/partitioning (pure aggregates)
    val again = Scores.aucRoc(df.repartition(7).orderBy(col("s").desc),
      "s", "y", Seq("grp")).collect()
      .filter(!_.isNullAt(3)).map(r => r.getString(0) -> r.getLong(3))
    assert(again.toMap.get("g2").contains(625000L))
  }

  test("averagePrecision: sklearn example, tie collapse, degenerate null") {
    import spark.implicits._
    // the sklearn docs example: y=[0,0,1,1], scores=[.1,.4,.35,.8]
    // → AP = 1·(1/2) + (2/3)·(1/2) = 0.8333…
    val df = Seq(
      ("g1", 10L, 0L), ("g1", 40L, 0L), ("g1", 35L, 1L), ("g1", 80L, 1L),
      // tied scores collapse to one threshold: P = 1/2 at the single cut
      ("g2", 7L, 1L), ("g2", 7L, 0L),
      ("g3", 1L, 0L), ("g3", 2L, 0L) // no positives → undefined
    ).toDF("grp", "s", "y")
    val out = Scores.averagePrecision(df, "s", "y", Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").getLong(1) == 2L && out("g1").getLong(2) == 2L)
    assert(out("g1").getLong(3) == 833333333L &&
      out("g1").getDouble(4) == 0.8333)
    assert(out("g2").getLong(3) == 500000000L)
    assert(out("g3").isNullAt(3) && out("g3").isNullAt(4))
    // all-positive group: AP = 1 exactly
    val ones = Scores.averagePrecision(
      Seq(("g", 1L, 1L), ("g", 2L, 1L)).toDF("grp", "s", "y"),
      "s", "y", Seq("grp")).head()
    assert(ones.getLong(3) == 1000000000L && ones.getDouble(4) == 1.0)
    // pure aggregates → partition/order invariant
    val again = Scores.averagePrecision(df.repartition(7).orderBy(col("s")),
      "s", "y", Seq("grp")).collect()
      .filter(!_.isNullAt(3)).map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(again.get("g1").contains(833333333L))
  }

  test("mannWhitney: hand-computed U, tie correction, z") {
    import spark.implicits._
    // g0 = {1,2,3}, g1 = {2,4}; avg ranks 1, 2.5, 2.5, 4, 5 →
    // R1 = 7.5, 2U1 = 15 − 2·3 = 9; ties: one pair → t³−t = 6
    // V = (6/12)·(6 − 6/20) = 2.85; z = 3 / (2·√2.85) = 0.8885
    val df = Seq((1L, 0L), (2L, 0L), (3L, 0L), (2L, 1L), (4L, 1L))
      .toDF("v", "g")
    val out = Scores.mannWhitney(df, "v", "g").head()
    assert(out.getLong(0) == 3L && out.getLong(1) == 2L)
    assert(out.getLong(2) == 9L && out.getLong(3) == 6L)
    assert(out.getDouble(4) == 0.8885)
    // order invariance (exact rank sums via PrefixSum)
    val again = Scores.mannWhitney(df.repartition(7).orderBy(col("v").desc),
      "v", "g").head()
    assert(again == out)
    // all values tied → variance 0 → null z, u_x2 = n0·n1 (all half-wins)
    val tied = Seq((5L, 0L), (5L, 0L), (5L, 1L)).toDF("v", "g")
    val t = Scores.mannWhitney(tied, "v", "g").head()
    assert(t.getLong(2) == 2L && t.isNullAt(4))
  }

  test("cohenKappa: textbook contingency, perfect and chance agreement") {
    import spark.implicits._
    // the classic 2×2 example: a=yes/b=yes 20, yes/no 5, no/yes 10,
    // no/no 15 → po = 0.7, pe = (25·30 + 25·20)/50² = 0.5, κ = 0.4
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val out = Scores.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(out.getLong(0) == 50L)
    assert(out.getLong(1) == 700000L && out.getLong(2) == 500000L)
    assert(out.getLong(3) == 400000L && out.getDouble(4) == 0.4)
    // perfect agreement → κ = 1; null rows excluded from n
    val perfect = Scores.cohenKappa(
      (Seq(("x", "x"), ("y", "y"), (null, "x")): Seq[(String, String)])
        .toDF("a", "b"), "a", "b").head()
    assert(perfect.getLong(0) == 2L && perfect.getDouble(4) == 1.0)
    // degenerate p_e = 1 (one identical category from both raters):
    // κ is undefined — null, not a division error / wrap
    val degen = Scores.cohenKappa(
      Seq(("x", "x"), ("x", "x")).toDF("a", "b"), "a", "b").head()
    assert(degen.getLong(0) == 2L && degen.isNullAt(3) && degen.isNullAt(4))
  }

  test("spearman: hand-computed rho with ties, perfect, inverse, degenerate") {
    import spark.implicits._
    // x = 1,2,3,4 vs y = 2,1,4,3: ranks swap within pairs →
    // d² = 1+1+1+1 = 4, ρ = 1 − 6·4/(4·15) = 0.6
    val df = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0)).toDF("a", "b")
    val r = Scores.spearman(df, "a", "b").head()
    assert(r.getLong(0) == 4L && r.getDouble(1) == 0.6)
    // ties on one side: x = 1,1,2 (avg ranks 1.5,1.5,3) vs y = 1,2,3
    // (ranks 1,2,3): Σxy-style Pearson over (3,3,6)/(2,4,6) = cov 1.5·√...
    // → ρ = 0.866 (textbook tie-corrected value √3/2)
    val ties = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0)).toDF("a", "b")
    val rt = Scores.spearman(ties, "a", "b").head()
    assert(rt.getDouble(1) == 0.866)
    // perfect monotone → 1; inverse → −1; constant side → null
    assert(Scores.spearman(
      Seq((1.0, 10.0), (2.0, 20.0), (3.0, 21.0)).toDF("a", "b"),
      "a", "b").head().getDouble(1) == 1.0)
    assert(Scores.spearman(
      Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("a", "b"),
      "a", "b").head().getDouble(1) == -1.0)
    assert(Scores.spearman(
      Seq((1.0, 5.0), (2.0, 5.0)).toDF("a", "b"), "a", "b").head().isNullAt(1))
  }

  test("krippendorffAlpha: hand-computed nominal alpha, exclusions, degenerate") {
    import spark.implicits._
    // u1 [a,a], u2 [a,a], u3 [b] (unpairable — excluded), u4 [b,b,a]:
    // Do terms 0 + 0 + (9−5)/2 = 2; n = 7, n_a = 5, n_b = 2 →
    // α = 1 − 6·2/(49−29) = 0.4
    val df = Seq(
      (1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"), (3L, "b"),
      (4L, "b"), (4L, "b"), (4L, "a"),
      (5L, Option.empty[String].orNull)).toDF("u", "v")
    val r = Scores.krippendorffAlpha(df, "u", "v").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 7L)
    assert(r.getLong(2) == 400000L && r.getDouble(3) == 0.4)
    // perfect agreement within every unit → α = 1
    val perfect = Scores.krippendorffAlpha(
      Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y")).toDF("u", "v"),
      "u", "v").head()
    assert(perfect.getLong(2) == 1000000L)
    // one category everywhere → De = 0, α undefined → null
    val degen = Scores.krippendorffAlpha(
      Seq((1L, "x"), (1L, "x")).toDF("u", "v"), "u", "v").head()
    assert(degen.isNullAt(2) && degen.isNullAt(3))
  }
}
