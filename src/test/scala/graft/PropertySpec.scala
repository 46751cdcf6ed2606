package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.car.{Normalize, Triplets, Vocab}

/** Property-based invariants (SURVEY.md §5) over seeded ScalaCheck
  * generators: normalize∘denormalize ≈ id, triplet-dedup idempotence,
  * vocabulary encode totality, negative-sampling label balance.
  * (Raw Gen + fixed seeds — each case runs Spark jobs, so a handful of
  * deterministic samples beats hundreds of random ones.)
  */
class PropertySpec extends SparkSpec {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default.withSize(12), Seed(i.toLong)))

  test("normalize ∘ denormalize ≈ id for both methods") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.choose(-1e4, 1e4)).suchThat(_.length >= 2)
    samples(gen, 5).foreach { xs =>
      val df = xs.toDF("x")
      Seq(Normalize.ZScore, Normalize.MinMax).foreach { m =>
        val (norm, stats) = Normalize.fitTransform(df, Seq("x"), m)
        val back = stats.denormalize(norm, Seq("x"))
          .select("x").collect().map(_.getDouble(0)).sorted
        back.zip(xs.sorted).foreach { case (a, b) =>
          assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
            s"method=$m xs=$xs")
        }
      }
    }
  }

  test("triplet expansion is idempotent under duplication and bounded by k(k-1)·rows") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 5L), Gen.choose(0L, 5L)))
    samples(gen, 4).foreach { rows =>
      val df = rows.toDF("a", "b", "c")
      val once = Triplets.fromRows(df, Seq("a", "b", "c")).collect().toSet
      val twice = Triplets.fromRows(df.union(df), Seq("a", "b", "c")).collect().toSet
      assert(once == twice)
      assert(once.size <= rows.distinct.size * 6)
    }
  }

  test("vocabulary encode is total over its build inputs") {
    import spark.implicits._
    samples(Gen.nonEmptyListOf(Gen.choose(0L, 20L)), 4).foreach { vs =>
      val df = vs.toDF("v")
      val vocab = Vocab.build(Seq(df), Seq("v"))
      val encoded = Vocab.encode(df, vocab, Seq("v"))
      assert(encoded.where(col("vId").isNull).count() == 0)
      assert(vocab.count() == vs.distinct.size)
    }
  }

  test("as-of join ≡ brute-force θ-join + per-left argmax on random data") {
    import spark.implicits._
    import graft.operators.AsofJoin
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L))),
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L),
        Gen.choose(0.0, 9.0))))
    samples(gen, 4).foreach { case (leftRaw, rightRaw) =>
      // unique (key, t) per side keeps the expected answer unambiguous
      val left = leftRaw.distinct.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
      val right = rightRaw.map(r => (r._1, r._2)).distinct
        .zip(rightRaw).map { case ((k, t), (_, _, v)) => (k, t, v) }
      val l = left.toDF("lid", "k", "t")
      val r = right.toDF("k", "t", "v")
      val got = AsofJoin.asofJoin(l, r, "k", "t", Seq("v"))
        .collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(3)) None else Some(x.getDouble(3))))
        .toMap
      val expected = left.map { case (lid, k, t) =>
        val matches = right.filter(q => q._1 == k && q._2 <= t)
        lid -> (if (matches.isEmpty) None
                else Some(matches.maxBy(q => (q._2, q._3))._3))
      }.toMap
      assert(got == expected)
    }
  }

  test("sequence packing: partition of the input, bounded overflow, order-free") {
    import spark.implicits._
    import graft.operators.CorpusPrep
    val gen = Gen.nonEmptyListOf(Gen.choose(1L, 400L))
    samples(gen, 4).foreach { toks =>
      val rows = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = rows.toDF("id", "toks")
      val packed = CorpusPrep.packByTokenBudget(df, "id", "toks", 256L, 4)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"),
          r.getAs[Long]("pack_id"), r.getAs[Long]("toks")))
      assert(packed.map(_._1).sorted.toSeq == rows.map(_._1)) // partition
      packed.groupBy(p => (p._2, p._3)).values.foreach { pk =>
        val total = pk.map(_._4).sum
        assert(total < 256L + pk.map(_._4).max) // ≤ one straddling doc
      }
      // input row order must not matter (the window orders by id)
      val shuffled = scala.util.Random.shuffle(rows).toDF("id", "toks")
      val again = CorpusPrep.packByTokenBudget(shuffled, "id", "toks", 256L, 4)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("pack_id"))).toSet
      assert(again == packed.map(p => (p._1, p._3)).toSet)
    }
  }

  test("mixture sampling: monotone in weight, subset semantics, exact at bounds") {
    import spark.implicits._
    import graft.operators.CorpusPrep
    samples(Gen.nonEmptyListOf(Gen.choose(0L, 500L)), 4).foreach { idsRaw =>
      val ids = idsRaw.distinct
      val df = ids.map(i => (i, "s")).toDF("id", "src")
      def kept(w: Double): Set[Long] =
        CorpusPrep.mixtureSample(df, "id", "src", Map("s" -> w))
          .select("id").collect().map(_.getLong(0)).toSet
      val k25 = kept(0.25); val k50 = kept(0.5); val k100 = kept(1.0)
      assert(k25.subsetOf(k50) && k50.subsetOf(k100)) // hash gate is nested
      assert(k100 == ids.toSet)
      assert(kept(0.0).isEmpty)
    }
  }

  test("winsorizeAll: row-preserving, clamped values stay inside the data's range") {
    import spark.implicits._
    import graft.operators.Outliers
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("a", "b"), Gen.choose(-1e4, 1e4), Gen.choose(-1e3, 1e3)))
      .suchThat(_.length >= 4)
    samples(gen, 4).foreach { rows =>
      val df = rows.toDF("g", "x", "y")
      val out = Outliers.winsorizeAll(df, Seq("x", "y"), Seq("g"),
        lo = 0.1, hi = 0.9)
      assert(out.count() == rows.length.toLong) // clamp never drops/dups rows
      // clamped values are bounded by the group's own extremes, and the
      // clamp is monotone: order of x_w follows order of x within a group
      val byG = out.collect().groupBy(_.getAs[String]("g"))
      byG.foreach { case (_, rs) =>
        val xs = rs.map(_.getAs[Double]("x")); val ws = rs.map(_.getAs[Double]("x_w"))
        // boundary tolerance 1e-6, not ulp-level: the fitted percentiles
        // snap to statScale=6 decimals (the cross-engine quantile-
        // interpolation discipline), so a clamp boundary may sit up to
        // 5e-7 outside the group's true range — invisible at the
        // oracle's 4-dp rounding, visible to an exact range check
        assert(ws.min >= xs.min - 1e-6 && ws.max <= xs.max + 1e-6)
        val sorted = rs.sortBy(_.getAs[Double]("x"))
        sorted.map(_.getAs[Double]("x_w")).sliding(2).foreach {
          case Array(a, b) => assert(a <= b + 1e-12)
          case _ =>
        }
      }
    }
  }

  test("robustZScoreAll: zero for constant columns, sign follows deviation from the median") {
    import spark.implicits._
    import graft.operators.Outliers
    val gen = Gen.nonEmptyListOf(Gen.choose(-1e3, 1e3)).suchThat(_.length >= 5)
    samples(gen, 4).foreach { xs =>
      val df = xs.map(x => ("g", x, 7.0)).toDF("g", "x", "c")
      val out = Outliers.robustZScoreAll(df, Seq("x", "c"), Seq("g")).collect()
      assert(out.length == xs.length)
      // constant column: MAD=0 falls back to scale 1 → rz exactly 0
      assert(out.forall(_.getAs[Double]("c_rz") == 0.0))
      // x_rz is a positive affine map of x (median/MAD snap included):
      // strictly order-preserving, centered near the median
      val pairs = out.map(r => (r.getAs[Double]("x"), r.getAs[Double]("x_rz")))
        .sortBy(_._1)
      pairs.map(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a <= b + 1e-12)
        case _ =>
      }
    }
  }

  test("corrMatrix: |corr| ≤ 1, shared n, column-order invariance") {
    import spark.implicits._
    import graft.operators.Stats
    val gen = Gen.listOfN(40,
      Gen.zip(Gen.choose(-500L, 500L), Gen.choose(-500L, 500L),
        Gen.choose(-500L, 500L)))
    samples(gen, 3).foreach { rows =>
      val df = rows.toDF("x", "y", "z")
      val m = Stats.corrMatrix(df, Seq("x", "y", "z")).collect()
      assert(m.forall(r => r.isNullAt(3) || math.abs(r.getDouble(3)) <= 1 + 1e-12))
      assert(m.map(_.getLong(2)).distinct.length == 1) // one shared n
      // reversing the column list permutes pair labels, not values
      val rev = Stats.corrMatrix(df, Seq("z", "y", "x")).collect()
        .map(r => Set(r.getString(0), r.getString(1)) ->
          (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
      m.foreach { r =>
        val k = Set(r.getString(0), r.getString(1))
        val v = if (r.isNullAt(3)) Double.NaN else r.getDouble(3)
        assert(v.isNaN && rev(k).isNaN || math.abs(v - rev(k)) < 1e-12, s"$k")
      }
    }
  }

  test("weightedQuantiles: monotone in p, values drawn from the data") {
    import spark.implicits._
    import graft.operators.Stats
    val gen = Gen.listOfN(50,
      Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 300L), Gen.choose(0L, 6L)))
    samples(gen, 3).foreach { rows =>
      val withW = rows.filter(_._3 > 0)
      if (withW.map(_._1).distinct.size == 2) {
        val got = Stats.weightedQuantiles(rows.toDF("g", "v", "w"),
          Seq("g"), "v", "w", Seq(10, 50, 90)).collect()
        got.foreach { r =>
          val (q10, q50, q90) = (r.getLong(2), r.getLong(3), r.getLong(4))
          assert(q10 <= q50 && q50 <= q90, s"non-monotone: $q10 $q50 $q90")
          val vals = withW.filter(_._1 == r.getString(0)).map(_._2).toSet
          assert(Seq(q10, q50, q90).forall(vals.contains),
            "quantile not an observed (weighted) value")
        }
      }
    }
  }

  test("cusum: scores non-negative, constant in-tolerance series never alarms") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val gen = Gen.listOfN(60, Gen.choose(-20L, 20L))
    samples(gen, 3).foreach { xs =>
      val df = xs.zipWithIndex.map { case (x, t) => ("k", t.toLong, x) }
        .toDF("g", "t", "x")
      val out = TimeSeries.cusum(df, Seq("g"), "t", "x",
        driftK = 25L, threshold = 100L).collect()
      assert(out.forall(r => r.getAs[Long]("cusum_up") >= 0 &&
        r.getAs[Long]("cusum_down") >= 0))
      // |x| ≤ 20 < k = 25: neither side can ever accumulate
      assert(out.forall(r => r.getAs[Long]("cusum_up") == 0 &&
        r.getAs[Long]("cusum_down") == 0))
    }
  }

  test("attribution: linear credits sum to exactly 1e6 per conversion") {
    import spark.implicits._
    import graft.operators.Attribution
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(1L, 5L),
      Gen.choose(0L, 1000L), Gen.oneOf("view", "click", "purchase")))
    samples(gen, 3).foreach { evs =>
      val df = evs.zipWithIndex.map { case ((u, ts, ty), i) =>
        (i.toLong, u, ts, ty) }.toDF("event_id", "user_id", "ts", "event_type")
      val credits = Attribution.creditTouches(df, "user_id", "ts",
        "event_type", "event_id", Seq("view", "click"), "purchase",
        "linear", lookbackUs = 500L)
      val perConv = credits.groupBy("user", "conv_id")
        .agg(sum("credit_ppm").as("s")).collect()
      assert(perConv.forall(_.getLong(2) == 1000000L),
        "a conversion's credits did not sum to 1e6")
    }
  }

  test("negative sampling: rate·|pos| negatives, ids within vocabulary") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 2L), Gen.choose(0L, 9L)))
    samples(gen.flatMap(e => Gen.choose(1, 4).map(e -> _)), 4)
      .foreach { case (edges, rate) =>
        val df = edges.distinct.toDF("head_id", "relation_id", "tail_id")
        val out = Triplets.negativeSample(df, numEntities = 10, rate = rate)
        assert(out.where(col("label") === 1).count() == edges.distinct.size)
        assert(out.where(col("label") === 0).count() == edges.distinct.size.toLong * rate)
        val ids = out.select("head_id").union(out.select("tail_id"))
          .collect().map(_.getLong(0))
        assert(ids.forall(id => id >= 0 && id < 10))
      }
  }

  test("universe sampling: join of gated sides ≡ gate applied to the join") {
    import spark.implicits._
    // both sides gated on the SAME md5 draw over the JOIN key — the
    // correlated-sampling identity that makes the sampled join an
    // unbiased universe sample (independent gates would keep p² of
    // join rows, not p)
    val left = (0L until 300L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (0L until 900L).map(i => (i % 300L, i)).toDF("k", "rv")
    def gate(df: org.apache.spark.sql.DataFrame) = df.where(
      conv(substring(md5(col("k").cast("string")), 1, 4), 16, 10)
        .cast("long") < 6554)
    val joinOfSamples = gate(left).join(gate(right), Seq("k"))
    val sampleOfJoin = gate(left.join(right, Seq("k")))
    assert(joinOfSamples.exceptAll(sampleOfJoin).isEmpty &&
      sampleOfJoin.exceptAll(joinOfSamples).isEmpty)
    assert(joinOfSamples.count() > 0) // the identity isn't vacuous
  }
}
