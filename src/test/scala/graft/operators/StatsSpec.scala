package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StatsSpec extends SparkSpec {

  test("corrMatrix: exact hand values, one row per unordered pair") {
    import spark.implicits._
    // y = 2x (corr 1), z = -x (corr -1), w uncorrelated-by-construction
    val df = Seq(
      (1L, 2L, -1L, 1L),
      (2L, 4L, -2L, -1L),
      (3L, 6L, -3L, -1L),
      (4L, 8L, -4L, 1L)
    ).toDF("x", "y", "z", "w")
    val m = Stats.corrMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(m.size == 6)
    assert(m(("x", "y")) == (4L, 1.0))
    assert(m(("x", "z")) == (4L, -1.0))
    assert(m(("y", "z")) == (4L, -1.0))
    assert(math.abs(m(("x", "w"))._2) < 1e-12) // balanced: exactly 0
  }

  test("corrMatrix: zero-variance column yields null corr; listwise null drop") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(2L), Some(5L)),
      (Some(2L), Some(4L), Some(5L)),
      (Some(3L), None, Some(5L)), // null y: row excluded everywhere
      (Some(4L), Some(8L), Some(5L))
    ).toDF("x", "y", "c")
    val rows = Stats.corrMatrix(df, Seq("x", "y", "c")).collect()
    assert(rows.forall(_.getLong(2) == 3L)) // same n for every pair
    val m = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(m(("x", "y")).getDouble(3) == 1.0)
    assert(m(("x", "c")).isNullAt(3) && m(("y", "c")).isNullAt(3))
  }

  test("groupMomentsState merge ≡ full rebuild; hand-checked variance") {
    import spark.implicits._
    val df = Seq(("a", 2L), ("a", 4L), ("a", 6L), ("b", 10L), ("b", 10L),
      ("c", 7L)).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    val full = Stats.momentsReport(
      Stats.groupMomentsState(df, Seq("g"), "v"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.toString).toMap
    // a: mean 4, sample variance 4; b: var 0; c: n=1 → null var
    val a = Stats.momentsReport(Stats.groupMomentsState(df, Seq("g"), "v"), Seq("g"))
      .where(col("g") === "a").head()
    assert(a.getDouble(2) == 4.0 && a.getDouble(3) == 4.0 && a.getDouble(4) == 2.0)
    assert(Stats.momentsReport(Stats.groupMomentsState(df, Seq("g"), "v"), Seq("g"))
      .where(col("g") === "c").head().isNullAt(3))
    for (mod <- Seq(2, 3)) {
      val m = Stats.momentsReport(Stats.mergeGroupMoments(
        Stats.groupMomentsState(df.where(col("id") % mod === 0), Seq("g"), "v")
          .unionByName(
            Stats.groupMomentsState(df.where(col("id") % mod =!= 0), Seq("g"), "v")),
        Seq("g")), Seq("g"))
        .collect().map(r => r.getString(0) -> r.toString).toMap
      assert(m == full, s"mod=$mod merged diverged from rebuild")
    }
  }

  test("corrState merge ≡ full rebuild, bit-exact, on any shard split") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "x", "y", "z")
    val cols = Seq("x", "y", "z")
    val full = Stats.corrMatrix(df, cols)
      .collect().map(_.toString).sorted.toSeq
    for (mod <- Seq(2, 7)) {
      val a = Stats.corrState(df.where(col("id") % mod === 0), cols)
      val b = Stats.corrState(df.where(col("id") % mod =!= 0), cols)
      val merged = Stats.corrFromState(
        Stats.mergeCorrStates(a.unionByName(b), cols), cols)
        .collect().map(_.toString).sorted.toSeq
      assert(merged == full, s"mod=$mod: merged state diverged from rebuild")
    }
  }

  test("chiSquareRelevance: perfect association V=1, independence chi2=0") {
    import spark.implicits._
    // f1 == label (perfect); f2 balanced-independent of label
    val df = (0 until 40).map { i =>
      val lbl = if (i % 2 == 0) "pos" else "neg"
      (lbl, lbl, if (i % 4 < 2) "a" else "b")
    }.toDF("label", "f1", "f2")
    val m = Stats.chiSquareRelevance(df, Seq("f1", "f2"), "label")
      .collect().map(r => r.getString(0) -> r).toMap
    val f1 = m("f1")
    assert(f1.getAs[Long]("n") == 40 && f1.getAs[Long]("dof") == 1)
    assert(math.abs(f1.getAs[Double]("chi2") - 40.0) < 1e-6) // chi2 = n
    assert(math.abs(f1.getAs[Double]("cramers_v") - 1.0) < 1e-9)
    val f2 = m("f2")
    assert(math.abs(f2.getAs[Double]("chi2")) < 1e-9)
    assert(math.abs(f2.getAs[Double]("cramers_v")) < 1e-9)
  }

  test("chiSquareRelevance: per-feature null exclusion and level counts") {
    import spark.implicits._
    val df = Seq(
      ("pos", Some("x"), "m"), ("neg", Some("y"), "m"),
      ("pos", None, "n"), ("neg", Some("y"), "n")
    ).toDF("label", "f1", "f2")
    val m = Stats.chiSquareRelevance(df, Seq("f1", "f2"), "label")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("f1").getAs[Long]("n") == 3) // null f1 row excluded
    assert(m("f2").getAs[Long]("n") == 4)
    assert(m("f1").getAs[Long]("r_levels") == 2)
    assert(m("f2").getAs[Long]("c_levels") == 2)
  }

  test("weightedQuantiles ≡ expanded-multiset type-1 quantiles, per group") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val data = for (g <- Seq("a", "b"); _ <- 1 to 60)
      yield (g, rnd.nextInt(500).toLong, rnd.nextInt(5).toLong) // weight 0..4
    val pcts = Seq(25, 50, 90)
    val expect = data.groupBy(_._1).map { case (g, rows) =>
      val expanded = rows.flatMap(r => Seq.fill(r._3.toInt)(r._2)).sorted
      g -> pcts.map { p =>
        // smallest v with cumulative count >= p% of total
        val need = (expanded.size * p + 99) / 100 // ceil
        expanded((need - 1).max(0))
      }
    }
    val got = Stats.weightedQuantiles(data.toDF("g", "v", "w").repartition(5),
        Seq("g"), "v", "w", pcts)
      .collect().map(r => r.getString(0) ->
        pcts.indices.map(i => r.getLong(2 + i)).toSeq).toMap
    expect.foreach { case (g, e) => assert(got(g) == e, s"$g: ${got(g)} vs $e") }
    // uniform weights reduce to the plain discrete quantile
    val uni = Stats.weightedQuantiles(
      data.toDF("g", "v", "w").withColumn("w", lit(1L)), Seq("g"), "v", "w", Seq(50))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val s = rows.map(_._2).sorted
      assert(uni(g) == s((s.size * 50 + 99) / 100 - 1))
    }
  }

  test("topPrincipalComponent recovers a planted dominant direction") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val d = 8
    // planted direction along (1,1,0,...)/√2 with big variance; small
    // isotropic noise elsewhere; a nonzero mean to exercise centering
    val dir = Array.tabulate(d)(i => if (i < 2) 1.0 / math.sqrt(2) else 0.0)
    val rows = (1 to 800).map { _ =>
      val t = rnd.nextGaussian() * 10.0
      Array.tabulate(d)(i => 5.0 + t * dir(i) + rnd.nextGaussian() * 0.5)
    }
    val got = Stats.topPrincipalComponent(rows.map(Tuple1(_)).toDF("v"), "v")
      .collect().sortBy(_.getLong(0))
    val loading = got.map(_.getDouble(1))
    val cos = math.abs(loading.zip(dir).map { case (a, b) => a * b }.sum)
    assert(cos > 0.995, s"|cos(found, planted)| = $cos")
    val lambda = got.head.getDouble(2)
    assert(lambda > 80 && lambda < 120, s"eigenvalue $lambda vs planted ~100")
    val share = got.head.getDouble(3)
    assert(share > 0.95, s"variance share $share — noise dims are tiny")
    // unit loading
    assert(math.abs(loading.map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("liftTable: exact integer bands, rates, and lift on a hand example") {
    import spark.implicits._
    // 20 rows, score descending with id; positives: ids 1..5 and 6
    val df = (1 to 20).map(i =>
      (i.toLong, 1000L - i, if (i <= 6) 1L else 0L)).toDF("id", "score", "y")
    val got = Stats.liftTable(df, "score", "y", "id", buckets = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    assert(got(0L) == ((5L, 5L, 1000000L, 3333333L))) // all positive
    assert(got(1L) == ((5L, 1L, 200000L, 666666L)))
    assert(got(2L) == ((5L, 0L, 0L, 0L)))
    assert(got(3L) == ((5L, 0L, 0L, 0L)))
  }

  test("bootstrapMeanCI: deterministic, ordered bounds, covers the true mean") {
    import spark.implicits._
    val df = (1 to 400).map(i => (i.toLong, "g", (1000L + (i % 21) - 10)))
      .toDF("id", "grp", "v") // values 990..1010, mean 1000-ish
    val run = () => Stats.bootstrapMeanCI(df, "v", "id", Seq("grp"),
      replicates = 50).collect().head
    val r1 = run(); val r2 = run()
    assert(r1.toString == r2.toString) // md5 draws: bit-identical reruns
    val (lo, mid, hi) = (r1.getAs[Double]("ci_lo"),
      r1.getAs[Double]("ci_mid"), r1.getAs[Double]("ci_hi"))
    val mean = r1.getAs[Double]("mean_micro")
    assert(lo <= mid && mid <= hi)
    assert(lo <= mean && mean <= hi, s"CI [$lo,$hi] misses mean $mean")
    assert(hi - lo < 5.0, s"CI width ${hi - lo} implausibly wide for n=400")
    assert(r1.getAs[Long]("n_rows") == 400)
  }

  test("bootstrapMeanCI: per-group isolation (one group's values don't leak)") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, "a", 10L)) ++
      (101 to 200).map(i => (i.toLong, "b", 2000000L))).toDF("id", "grp", "v")
    val m = Stats.bootstrapMeanCI(df, "v", "id", Seq("grp"), replicates = 30)
      .collect().map(r => r.getString(0) -> r).toMap
    // constant values: every replicate mean is exactly the constant
    assert(m("a").getAs[Double]("ci_lo") == 10.0 &&
      m("a").getAs[Double]("ci_hi") == 10.0)
    assert(m("b").getAs[Double]("ci_lo") == 2000000.0 &&
      m("b").getAs[Double]("ci_hi") == 2000000.0)
  }

  test("mutualInformation: perfect association = H(label), independence = 0") {
    import spark.implicits._
    // deterministic mapping f→lbl with a uniform label: I = H = ln 2
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("f", "lbl")
    val mp = Stats.mutualInformation(perfect, Seq("f"), "lbl").head
    assert(mp.getAs[Long]("n") == 4)
    assert(math.abs(mp.getAs[Double]("mi_nats") - math.log(2)) < 1e-3, mp)
    // the full product grid, uniform: knowing f buys nothing
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("f", "lbl")
    val mi = Stats.mutualInformation(indep, Seq("f"), "lbl").head
    assert(mi.getAs[Double]("mi_nats") == 0.0, mi)
  }

  test("clusteringAgreement: hand contingency and the identity partition") {
    import spark.implicits._
    // A = {x,x,y,y}, B = {p,q,p,q}: all four cells singletons → TP 0;
    // each side has 2 co-pairs → FP 2, FN 2; C(4,2)=6 → TN 2, Rand 2/6
    val d = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val r = Stats.clusteringAgreement(d, "a", "b").head
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("tp") == 0 &&
      r.getAs[Long]("fp") == 2 && r.getAs[Long]("fn") == 2 &&
      r.getAs[Long]("tn") == 2)
    assert(r.getAs[Long]("rand_ppm") == 333333L)
    assert(r.getAs[Long]("precision_ppm") == 0L &&
      r.getAs[Long]("recall_ppm") == 0L)
    // a partition compared to itself: no disagreeing pairs, Rand = 1
    val same = Seq(("x", "x"), ("x", "x"), ("y", "y")).toDF("a", "b")
    val s2 = Stats.clusteringAgreement(same, "a", "b").head
    assert(s2.getAs[Long]("fp") == 0 && s2.getAs[Long]("fn") == 0 &&
      s2.getAs[Long]("rand_ppm") == 1000000L &&
      s2.getAs[Long]("precision_ppm") == 1000000L)
  }

  test("calibrationTable: perfect and inverted calibration bracket the gap") {
    import spark.implicits._
    // 10 confident-positive rows (pred 1e6, y 1) + 10 confident-negative
    // (pred 0, y 0): perfectly calibrated → gap 0 in both bands
    val good = ((0L until 10L).map(i => (i, 1000000L, 1L)) ++
      (10L until 20L).map(i => (i, 0L, 0L))).toDF("id", "p", "y")
    val g = Stats.calibrationTable(good, "p", "y", "id", buckets = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(g(0L).getAs[Long]("mean_pred_ppm") == 1000000L &&
      g(0L).getAs[Long]("response_ppm") == 1000000L &&
      g(0L).getAs[Long]("gap_ppm") == 0L)
    assert(g(1L).getAs[Long]("gap_ppm") == 0L)
    // flip the labels: confidently wrong → gap 1e6 in both bands
    val bad = good.withColumn("y", lit(1L) - col("y"))
    val b = Stats.calibrationTable(bad, "p", "y", "id", buckets = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("gap_ppm")).toMap
    assert(b == Map(0L -> 1000000L, 1L -> 1000000L), b)
  }

  test("quantileNormalize: shifted sources map onto the same pooled values") {
    import spark.implicits._
    // source a = {1..4}, source b = {101..104}: same shape, shifted.
    // After normalization both sources draw from the pooled order
    // statistics at matching ranks — rank i of a and rank i of b get
    // pooled positions ceil(i·8/4) = 2i, i.e. {1,3,101,103} ranks → the
    // SAME normalized sequence for both sources.
    val rows = (Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), (4L, "a", 4L),
      (5L, "b", 101L), (6L, "b", 102L), (7L, "b", 103L), (8L, "b", 104L)))
      .toDF("id", "src", "v")
    val out = Stats.quantileNormalize(rows, "v", "src", "id")
    val byRank = out.orderBy(col("src"), col("v"))
      .select(col("src"), col("v_qnorm")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    assert(byRank("a") == byRank("b"), byRank)
    // pooled order is (1,2,3,4,101,...): rank 1→pos 2 (=2), rank 2→pos 4
    // (=4), rank 3→pos 6 (=102), rank 4→pos 8 (=104)
    assert(byRank("a") == Seq(2L, 4L, 102L, 104L), byRank("a"))
  }

  test("quantileNormalize: a single source is mapped onto itself") {
    import spark.implicits._
    val rows = (0L until 20L).map(i => (i, "only", i * 3 % 17)).toDF("id", "src", "v")
    val out = Stats.quantileNormalize(rows, "v", "src", "id")
    // n_g = N → position ceil(r·N/N) = r: identity on the sorted values
    assert(out.where(col("v") =!= col("v_qnorm")).isEmpty)
    assert(out.count() == 20)
  }

  test("medianCi: order-statistic endpoints, odd/even medians, clamping") {
    import spark.implicits._
    // odd group: values 10..90 by 10 (n=9) → median rank 5 both, value
    // 50; ranks l = floor((9-1.96·3)/2) = 1, u = ceil((9+1.96·3)/2+1) = 9
    val odd = (1L to 9L).map(i => ("o", i * 10L)).toDF("g", "v")
    val o = Stats.medianCi(odd, Seq("g"), "v").head()
    assert(o.getLong(1) == 9L)
    assert(o.getLong(2) == 50L && o.getLong(3) == 50L)
    assert(o.getLong(4) == 10L && o.getLong(5) == 90L)
    // even group: n=4 → middle pair ranks 2,3; tiny n clamps to [1, n]
    val even = Seq(("e", 1L), ("e", 3L), ("e", 7L), ("e", 9L)).toDF("g", "v")
    val e = Stats.medianCi(even, Seq("g"), "v").head()
    assert(e.getLong(2) == 3L && e.getLong(3) == 7L)
    assert(e.getLong(4) == 1L && e.getLong(5) == 9L)
    // every output is an input value; order invariance
    val again = Stats.medianCi(odd.repartition(5).orderBy(col("v").desc),
      Seq("g"), "v").head()
    assert(again == o)
    // nulls are excluded BEFORE ranking — they must not consume ranks
    // and shift the order statistics (the quantilesWeighted convention)
    val withNulls = odd.select(col("g"), col("v").cast("long").as("v"))
      .unionAll(Seq(("o", Option.empty[Long]), ("o", Option.empty[Long]))
        .toDF("g", "v"))
    val nn = Stats.medianCi(withNulls, Seq("g"), "v").head()
    assert(nn == o)
  }
}
