package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Error bounds for the sketch-based aggregates (the O(1)-memory paths
  * that replace exact distinct/quantile shuffles at 100 TB). The queries
  * themselves are rows-only in the driver gate (sketch values are
  * engine-specific); these tests pin their accuracy against the exact
  * answers on real TESTDATA.
  */
class SketchSpec extends SparkSpec {

  test("approx_percentile stays within 1% of exact per group (sf0.01 lineitem)") {
    val rows = graft.sources.Tables.lineitem(spark, sf("sf0.01"))
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"),
        expr("percentile(l_extendedprice, 0.5)").as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a - e) / e < 0.01, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("hllRollup: merged __all row equals a direct global sketch, within 5% of exact") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.01"))
    // hll_sketch_estimate returns BIGINT
    val rollup = Sketches.hllRollup(docs, "text", "source").collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    // mergeability: the union sees every register the per-group sketches
    // saw, but DataSketches' union operator runs in HLL_8 mode while a
    // small direct sketch may still be in exact coupon mode — so at low
    // cardinality the two estimates are close, not bit-identical
    val direct = docs
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(text, 12))")).head().getLong(0).toDouble
    assert(math.abs(rollup("__all") - direct) / direct < 0.05,
      s"merged ${rollup("__all")} vs direct-global $direct")
    val exact = docs.select(col("text")).distinct().count().toDouble
    assert(math.abs(rollup("__all") - exact) / exact < 0.05,
      s"merged estimate ${rollup("__all")} vs exact $exact")
    // per-group rows estimate each group's own distinct count
    val exactPer = docs.groupBy(col("source"))
      .agg(countDistinct(col("text")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    exactPer.foreach { case (g, e) =>
      assert(math.abs(rollup(g) - e) / e < 0.05, s"$g: ${rollup(g)} vs $e")
    }
  }

  test("CMS: estimate >= exact always; equals exact when width dwarfs the vocabulary") {
    import spark.implicits._
    // skewed synthetic counts through a DELIBERATELY colliding sketch
    val terms = (1 to 40).flatMap(i => Seq.fill(i)(s"t$i")).toDF("term")
    val exact = terms.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tight = Sketches.cmsEstimate(terms,
      Sketches.cmsFit(terms, "term", width = 8, depth = 3), "term",
      width = 8, depth = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tight.keySet == exact.keySet)
    // the one-sided CMS guarantee is deterministic: collisions only ADD
    exact.foreach { case (t, e) =>
      assert(tight(t) >= e, s"$t: est ${tight(t)} < exact $e")
    }
    assert(tight.exists { case (t, v) => v > exact(t) },
      "width=8 over 40 terms must collide somewhere")
    // a wide sketch (2048 ≫ 40 terms) should be collision-free per row
    val wide = Sketches.cmsEstimate(terms,
      Sketches.cmsFit(terms, "term", width = 2048, depth = 4), "term",
      width = 2048, depth = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, e) => assert(wide(t) == e, s"$t: ${wide(t)} != $e") }
  }

  test("CMS heavy hitters surface the true top terms and merge additively across shards") {
    import spark.implicits._
    val terms = (1 to 30).flatMap(i => Seq.fill(i * i)(s"w$i")).toDF("term")
    val top = Sketches.cmsHeavyHitters(terms, "term", k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.map(_._1).toSeq == Seq("w30", "w29", "w28", "w27", "w26"))
    assert(top.head._2 == 900L) // exact at this width — no collisions
    // additivity: summing two half-corpus counter tables ≡ one full fit
    val (h1, h2) = (terms.limit(4000), terms.exceptAll(terms.limit(4000)))
    val mergedCounters = Sketches.cmsFit(h1, "term", 64, 3)
      .unionByName(Sketches.cmsFit(h2, "term", 64, 3))
      .groupBy(col("d"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val merged = Sketches.cmsEstimate(terms, mergedCounters, "term", 64, 3)
    val full = Sketches.cmsEstimate(terms,
      Sketches.cmsFit(terms, "term", 64, 3), "term", 64, 3)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("hllTrailingDistinct: sliding union estimate within 5% of the exact " +
      "trailing distinct; window=1 degenerates to per-slot") {
    import spark.implicits._
    // (group, slot, user): users overlap across slots so trailing
    // distinct < sum of per-slot distinct
    val rows = for {
      g <- Seq("a", "b"); slot <- 0L until 8L; i <- 0 until 120
    } yield (g, slot, math.floorMod(i * 31 + slot * 40, 300L))
    val df = rows.toDF("g", "slot", "u")
    val est = Sketches.hllTrailingDistinct(df, "u", "g", "slot", window = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val exact = rows.groupBy(_._1).flatMap { case (g, rs) =>
      (0L until 8L).map { s =>
        val win = rs.filter(r => r._2 <= s && r._2 > s - 3).map(_._3).distinct.size
        (g, s) -> win
      }
    }
    exact.foreach { case (k, ex) =>
      val e = est(k)
      assert(math.abs(e - ex) <= math.max(1, ex / 20), s"$k est=$e exact=$ex")
    }
    // window = 1 reduces to the plain per-slot estimate
    val w1 = Sketches.hllTrailingDistinct(df, "u", "g", "slot", window = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val perSlot = rows.groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.map(_._3).distinct.size }
    perSlot.foreach { case (k, ex) =>
      assert(math.abs(w1(k) - ex) <= math.max(1, ex / 20), s"$k")
    }
  }

  test("cmsJoinSizeEstimate: >= exact always, == exact when width dwarfs the vocabulary") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    // skewed multiplicities: the case join planning cares about
    val aRows = (1 to 2000).map(_ => s"k${rnd.nextInt(50)}").toDF("k")
    val bRows = (1 to 3000).map(_ => s"k${rnd.nextInt(80)}").toDF("k")
    val ca = aRows.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cb = bRows.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
    def est(width: Int): Long = Sketches.cmsJoinSizeEstimate(
      Sketches.cmsFit(aRows, "k", width, 4),
      Sketches.cmsFit(bRows, "k", width, 4), depth = 4)
      .collect().head.getLong(0)
    val wide = est(4096)
    assert(wide == exact, s"wide-sketch estimate $wide != exact $exact")
    val narrow = est(16)
    assert(narrow >= exact, s"CMS inner product must over-count: $narrow < $exact")
    // and the error bound: + (e/width)·|A|·|B| with margin
    assert(narrow <= exact + 3 * 2000L * 3000L / 16,
      s"narrow estimate $narrow implausibly far above $exact")
  }

  test("hllOverlapMatrix: intersection estimates track exact overlaps") {
    import spark.implicits._
    // three overlapping cohorts: a = 1..2000, b = 1001..3000 (1000
    // shared with a), c = 10001..12000 (disjoint from both)
    val rows =
      (1L to 2000L).map(("a", _)) ++ (1001L to 3000L).map(("b", _)) ++
        (10001L to 12000L).map(("c", _))
    val df = rows.toDF("g", "u")
    val m = Sketches.hllOverlapMatrix(df, "u", "g")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("intersect_est"), r.getAs[Long]("union_est")))).toMap
    assert(m.size == 3)
    val (iAB, uAB) = m(("a", "b"))
    assert(math.abs(iAB - 1000L) <= 150, s"a∩b est $iAB vs exact 1000")
    assert(math.abs(uAB - 3000L) <= 150, s"a∪b est $uAB vs exact 3000")
    // disjoint pairs: inclusion-exclusion noise stays near zero and the
    // clamp keeps it non-negative
    val iAC = m(("a", "c"))._1
    val iBC = m(("b", "c"))._1
    assert(iAC >= 0 && iAC <= 200, s"a∩c est $iAC vs exact 0")
    assert(iBC >= 0 && iBC <= 200, s"b∩c est $iBC vs exact 0")
    // deterministic on re-run; across PARTITIONINGS the DataSketches
    // HIP estimator is insertion-order-sensitive at the margin, so
    // equality is only within the sketch's error band — document,
    // don't over-pin
    val rerun = Sketches.hllOverlapMatrix(df, "u", "g")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("intersect_est")).toMap
    assert(m.keySet.forall(k => rerun(k) == m(k)._1))
    val m2 = Sketches.hllOverlapMatrix(df.repartition(13), "u", "g")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("intersect_est")).toMap
    assert(m.keySet.forall(k => math.abs(m2(k) - m(k)._1) <= 150),
      s"partitioning drift beyond the error band: $m2 vs $m")
  }

  test("own-HLL overlap matrix tracks exact overlaps at p=8") {
    import spark.implicits._
    val rows =
      (1L to 2000L).map(("a", _)) ++ (1001L to 3000L).map(("b", _)) ++
        (10001L to 12000L).map(("c", _))
    val m = Sketches.hllLongOverlapMatrix(rows.toDF("g", "u"), "u", "g", p = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Double]("intersect_est"), r.getAs[Double]("union_est")))).toMap
    assert(m.size == 3)
    val (iAB, uAB) = m(("a", "b"))
    // p=8 ⇒ ~6.5% RSE; inclusion-exclusion compounds three estimates
    assert(math.abs(iAB - 1000.0) <= 500, s"a∩b est $iAB vs exact 1000")
    assert(math.abs(uAB - 3000.0) <= 600, s"a∪b est $uAB vs exact 3000")
    assert(m(("a", "c"))._1 >= 0 && m(("b", "c"))._1 >= 0)
    // unlike the HIP blobs, the OWN registers are pure max-lattice
    // state: the matrix is bit-identical across partitionings
    val rerun = Sketches.hllLongOverlapMatrix(
      rows.toDF("g", "u").repartition(13), "u", "g", p = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Double]("intersect_est"), r.getAs[Double]("union_est")))).toMap
    assert(rerun == m)
  }

  test("own-HLL: estimate tracks exact within the p=6 error band") {
    import spark.implicits._
    // m=64 → RSE ≈ 1.04/√64 = 13%; allow 4σ
    val df = (1L to 2000L).map(i => ("g", i * 7919L)).toDF("g", "k")
    val est = Sketches.hllLongEstimate(
      Sketches.hllLongFit(df, "k", "g", p = 6), "g", p = 6)
      .head().getAs[Double]("est")
    assert(math.abs(est - 2000.0) < 2000.0 * 0.52, s"est $est vs 2000")
  }

  test("own-HLL: registers merge by max (shard law) and dedup duplicates") {
    import spark.implicits._
    val df = (1L to 500L).map(i => ("g", i)).toDF("g", "k")
    val whole = Sketches.hllLongFit(df, "k", "g", p = 4)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val merged = Sketches.hllLongFit(df.where(col("k") <= 250), "k", "g", 4)
      .unionByName(Sketches.hllLongFit(df.where(col("k") > 200), "k", "g", 4))
      .groupBy(col("g"), col("bucket")).agg(max(col("rho_max")).as("rho_max"))
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(merged == whole)
  }

  test("own-HLL: small groups take the linear-counting branch exactly") {
    import spark.implicits._
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L)).toDF("g", "k")
    val row = Sketches.hllLongEstimate(
      Sketches.hllLongFit(df, "k", "g", p = 4), "g", p = 4).head()
    val nObs = row.getAs[Long]("n_obs")
    assert(nObs <= 3)
    val expected = math.rint(16.0 * math.log(16.0 / (16 - nObs)) * 1e4) / 1e4
    assert(row.getAs[Double]("est") == expected)
  }
}
