package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPrepSpec extends SparkSpec {

  test("packByTokenBudget: every doc packed once, packs overflow by at most one doc") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, 10L + i % 90)).toDF("id", "toks")
    val packed = CorpusPrep.packByTokenBudget(docs, "id", "toks",
      budget = 256L, shards = 4)
    assert(packed.count() == 200) // partition-wise assignment, no loss/dup
    assert(packed.select("id").distinct().count() == 200)
    // within a (shard, pack), total tokens < budget + the last doc's own
    // size (block packing: only the straddling doc overflows)
    val over = packed.groupBy(col("shard"), col("pack_id"))
      .agg(sum(col("toks")).as("total"), max(col("toks")).as("biggest"))
      .where(col("total") >= lit(256L) + col("biggest"))
    assert(over.isEmpty)
    // deterministic: same input → identical assignment
    val again = CorpusPrep.packByTokenBudget(docs, "id", "toks", 256L, 4)
    assert(packed.exceptAll(again).isEmpty && again.exceptAll(packed).isEmpty)
  }

  test("packByTokenBudget: tied ids still pack as a running prefix (ROWS frame)") {
    import spark.implicits._
    // 8 rows sharing ONE id (same shard, all window peers) of 40 tokens
    // each against a 100-token budget. Under the default RANGE frame every
    // row is a peer of every other, sees the full 320-token sum, and all
    // 8 land in pack 2; the explicit ROWS frame keeps a strict running
    // prefix (offsets 0,40,…,280 → packs 0,0,0,1,1,2,2,2).
    val docs = Seq.fill(8)((7L, 40L)).toDF("id", "toks")
    val byPack = CorpusPrep.packByTokenBudget(docs, "id", "toks",
        budget = 100L, shards = 4)
      .groupBy(col("pack_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byPack == Map(0L -> 3L, 1L -> 2L, 2L -> 3L), byPack)
  }

  test("packByTokenBudget: duplicate ids with UNEQUAL sizes keep packs bounded; mapping needs unique ids") {
    import spark.implicits._
    // duplicate ids with different token counts: WHICH tied row takes
    // which running-prefix slot is tie-order dependent (unique idCol is
    // the documented precondition for a deterministic row→pack mapping),
    // but the ROWS frame still guarantees the INVARIANTS: nothing lost
    // or duplicated, and no pack overflows by more than its straddler
    val docs = Seq((3L, 60L), (3L, 10L), (3L, 80L), (3L, 25L), (3L, 45L),
      (7L, 90L), (7L, 90L), (7L, 30L)).toDF("id", "toks")
    val packed = CorpusPrep.packByTokenBudget(docs, "id", "toks",
      budget = 100L, shards = 4)
    assert(packed.count() == 8)
    assert(packed.agg(sum(col("toks"))).head().getLong(0) == 430L)
    val over = packed.groupBy(col("shard"), col("pack_id"))
      .agg(sum(col("toks")).as("total"), max(col("toks")).as("biggest"))
      .where(col("total") >= lit(100L) + col("biggest"))
    assert(over.isEmpty)
  }

  test("packByTokenBudget plan: the running-sum window is shard-partitioned") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, 5L)).toDF("id", "toks")
    val plan = CorpusPrep.packByTokenBudget(docs, "id", "toks", 64L, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") || !plan.contains("windowspecdefinition()"),
      plan) // no partitionless window anywhere
    assert(plan.contains("hashpartitioning(shard"), plan)
  }

  test("mixtureSample: w=1 keeps all, w=0 keeps none, gate is deterministic") {
    import spark.implicits._
    val rows = (0L until 1000L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val sampled = CorpusPrep.mixtureSample(rows, "id", "src",
      Map("s0" -> 1.0, "s1" -> 0.0, "s2" -> 0.5, "s3" -> 0.2))
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled("s0") == 250)       // weight 1 keeps every row
    assert(!sampled.contains("s1"))    // weight 0 keeps nothing
    // uniform 16-bit gate: expected 125 ± a loose binomial bound
    assert(sampled("s2") > 85 && sampled("s2") < 165, sampled)
    assert(sampled("s3") > 25 && sampled("s3") < 80, sampled)
    val again = CorpusPrep.mixtureSample(rows, "id", "src",
      Map("s2" -> 0.5)).select("id").collect().map(_.getLong(0)).toSet
    val first = CorpusPrep.mixtureSample(rows, "id", "src",
      Map("s2" -> 0.5)).select("id").collect().map(_.getLong(0)).toSet
    assert(again == first && again.nonEmpty)
  }

  test("mixtureSample: sources absent from the weight map are dropped") {
    import spark.implicits._
    val rows = Seq((1L, "keep"), (2L, "unknown")).toDF("id", "src")
    val out = CorpusPrep.mixtureSample(rows, "id", "src", Map("keep" -> 1.0))
    assert(out.select("src").collect().map(_.getString(0)).toSeq == Seq("keep"))
  }

  test("weightedSample: deterministic, size-exact, and weight-proportional") {
    import spark.implicits._
    // 2000 heavy (w=10) + 2000 light (w=1) rows; in a Gumbel-top-k draw
    // of 400, each slot picks heavy with p ≈ 10/11 — the md5 draw is
    // fixed, so the exact count is stable, and it must sit far above
    // what unweighted sampling (p = 1/2) could produce
    val rows = (1L to 4000L)
      .map(i => (i, if (i <= 2000) 10L else 1L)).toDF("id", "w")
    val got = CorpusPrep.weightedSample(rows, "id", "w", n = 400)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got.length == 400)
    assert(got.toSet.size == 400) // without replacement
    val heavy = got.count(_ <= 2000L)
    assert(heavy > 320, s"heavy=$heavy of 400 — not weight-proportional")
    // deterministic across runs and partitionings
    val again = CorpusPrep.weightedSample(rows.repartition(7), "id", "w", n = 400)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(again.sorted == got.sorted)
    // zero/negative weights are never drawn; n larger than the pool
    // returns the whole positive-weight pool
    val tiny = Seq((1L, 5L), (2L, 0L), (3L, -1L)).toDF("id", "w")
    assert(CorpusPrep.weightedSample(tiny, "id", "w", n = 10)
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("oversampleToMax: every class lands at EXACTLY the majority size") {
    import spark.implicits._
    // classes of size 7, 3, 1 → targets all 7
    val rows = ((0L until 7L).map(i => (i, "a")) ++
      (10L until 13L).map(i => (i, "b")) ++ Seq((20L, "c"))).toDF("id", "cls")
    val out = CorpusPrep.oversampleToMax(rows, "id", "cls")
    val byClass = out.groupBy(col("cls")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byClass == Map("a" -> 7L, "b" -> 7L, "c" -> 7L), byClass)
    // copy = 1 slice is exactly the original multiset (nothing lost)
    val originals = out.where(col("copy") === 1).select("id", "cls")
    assert(originals.exceptAll(rows).isEmpty && rows.exceptAll(originals).isEmpty)
    // class b (3 rows → 7): base 2 each + exactly one row with a 3rd copy
    val bCopies = out.where(col("cls") === "b").groupBy(col("id"))
      .agg(max(col("copy")).as("m")).collect().map(_.getLong(1)).sorted.toSeq
    assert(bCopies == Seq(2L, 2L, 3L), bCopies)
    // deterministic: rerun is bit-identical
    val again = CorpusPrep.oversampleToMax(rows, "id", "cls")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("lengthBucketBatches: batches never mix buckets and fill to size") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, 10L + (i % 5) * 100)).toDF("id", "len")
    val out = CorpusPrep.lengthBucketBatches(docs, "id", "len",
      bucketWidth = 100L, batchSize = 8)
    assert(out.count() == 100)
    // bucket is len div 100 — no assignment crosses a bucket
    assert(out.where(col("bucket") =!= expr("len div 100")).isEmpty)
    // within a bucket (20 rows, batch 8): batches 0,1 full (8), batch 2 has 4
    val sizes = out.groupBy(col("bucket"), col("batch_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (b <- 0L until 5L)
      assert(sizes((b, 0L)) == 8 && sizes((b, 1L)) == 8 && sizes((b, 2L)) == 4,
        sizes.filter(_._1._1 == b))
    // deterministic
    val again = CorpusPrep.lengthBucketBatches(docs, "id", "len", 100L, 8)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("snakeShards: hand-checked placement and the ≤-one-document balance bound") {
    import spark.implicits._
    // weights 16..1 over 4 shards: ranks 1-4 → shards 0,1,2,3; ranks
    // 5-8 (odd round) → 3,2,1,0; etc. Totals: 16+9+8+1 = 15+10+7+2 =
    // 14+11+6+3 = 13+12+5+4 = 34 — the snake balances EXACTLY here
    val docs = (1L to 16L).map(i => (i, 17L - i)).toDF("id", "w")
    val out = CorpusPrep.snakeShards(docs, "id", "w", nShards = 4)
    assert(out.count() == 16)
    val shardOf = out.collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("shard"))).toMap
    // id 1 has the biggest weight → rank 1 → shard 0; id 5 → rank 5 →
    // round 1 (odd) pos 0 → shard 3
    assert(shardOf(1L) == 0L && shardOf(4L) == 3L &&
      shardOf(5L) == 3L && shardOf(8L) == 0L, shardOf)
    val totals = out.groupBy(col("shard")).agg(sum(col("w")))
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(totals == Seq(34L, 34L, 34L, 34L), totals)
  }

  test("snakeShards: deterministic across partitionings, balance within max weight") {
    import spark.implicits._
    val docs = (0L until 303L).map(i => (i, 1L + (i * 37) % 97)).toDF("id", "w")
    val out = CorpusPrep.snakeShards(docs, "id", "w", nShards = 8)
    val totals = out.groupBy(col("shard")).agg(sum(col("w")).as("t"))
      .collect().map(_.getLong(1))
    assert(totals.length == 8)
    assert(totals.max - totals.min <= 97L,
      s"snake spread ${totals.max - totals.min} exceeds the max weight")
    val again = CorpusPrep.snakeShards(docs.repartition(7), "id", "w", 8)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("leakageSafeSplit: cluster members never straddle the split; singletons split too") {
    import spark.implicits._
    // (id, cluster): three multi-member clusters + singletons
    val clustered = ((1L to 30L).map(i => (i, i % 3 + 1L)) ++
      (100L to 140L).map(i => (i, i))).toDF("id", "cluster")
    val out = CorpusPrep.leakageSafeSplit(clustered, "id", "cluster", 0.3)
    assert(out.count() == clustered.count()) // partition, nothing dropped
    val sides = out.groupBy(col("cluster"))
      .agg(countDistinct(col("split")).as("k"))
    assert(sides.where(col("k") =!= 1L).isEmpty,
      "a cluster straddles the train/test boundary")
    // singleton draws land on both sides at a sane rate for 41 draws
    val single = out.where(col("cluster") >= 100L)
      .groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(single.getOrElse("test", 0L) > 0L && single("train") > 0L, single)
  }

  test("epochOrder: every (epoch, id) placed once; epochs really reshuffle") {
    import spark.implicits._
    val docs = (0L until 200L).map(Tuple1(_)).toDF("id")
    val out = CorpusPrep.epochOrder(docs, "id", epochs = 3, shards = 4)
    assert(out.count() == 600)
    assert(out.select("epoch", "id").distinct().count() == 600)
    // within each (epoch, shard): ord is 1..n dense
    val bad = out.groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n"), max(col("ord")).as("mx"), min(col("ord")).as("mn"))
      .where(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(bad.isEmpty)
    // different epochs produce different orders (the reshuffle claim):
    // the same id's (shard, ord) must differ somewhere between epochs
    val e0 = out.where(col("epoch") === 0).select(col("id"), col("shard"), col("ord"))
    val e1 = out.where(col("epoch") === 1).select(col("id"), col("shard"), col("ord"))
    assert(e0.intersect(e1).count() < 200, "epoch 1 replayed epoch 0's order")
    // deterministic across partitionings
    val again = CorpusPrep.epochOrder(docs.repartition(7), "id", 3, 4)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("contrastiveTriplets: cluster-mate positive, first CROSS-cluster hit as negative") {
    import spark.implicits._
    val clustered = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L),
      (5L, 5L), (6L, 5L)).toDF("id", "cluster")
    val knn = Seq(
      (1L, 2L, 1L, 0.99), (1L, 3L, 2L, 0.80), // same-cluster hit skipped
      (2L, 3L, 1L, 0.70),
      (5L, 6L, 1L, 0.95))                     // ONLY same-cluster → drops
      .toDF("query_id", "neighbor_id", "rank", "cosine")
    val t = CorpusPrep.contrastiveTriplets(clustered, knn).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(t == Map(
      1L -> ((2L, 3L, 2L)),  // positive = mate 2; negative = rank-2 hit 3
      2L -> ((1L, 3L, 1L))), t)
  }

  test("oversampleToMax: balanced input passes through with copy = 1") {
    import spark.implicits._
    val rows = (0L until 10L).map(i => (i, (i % 2).toString)).toDF("id", "cls")
    val out = CorpusPrep.oversampleToMax(rows, "id", "cls")
    assert(out.agg(max(col("copy"))).head.getLong(0) == 1L)
    assert(out.count() == 10)
  }

  test("stratifiedExactSplit: every stratum lands within one row of 80/10/10") {
    import spark.implicits._
    // deliberately awkward stratum sizes
    val rows = (1L to 203L).map((_, "a")) ++ (1000L to 1011L).map((_, "b")) ++
      (2000L to 2004L).map((_, "c"))
    val out = CorpusPrep.stratifiedExactSplit(rows.toDF("id", "s"), "id", "s")
    val sizes = out.groupBy("s", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def check(s: String, n: Long): Unit = {
      val tr = sizes.getOrElse((s, "train"), 0L)
      val va = sizes.getOrElse((s, "val"), 0L)
      val te = sizes.getOrElse((s, "test"), 0L)
      assert(tr + va + te == n)
      assert(tr == n * 8 / 10, s"$s train $tr of $n")
      assert(tr + va == n * 9 / 10, s"$s train+val ${tr + va} of $n")
    }
    check("a", 203); check("b", 12); check("c", 5)
    // deterministic across partitionings
    val again = CorpusPrep.stratifiedExactSplit(
      rows.toDF("id", "s").repartition(7), "id", "s")
      .orderBy("id").collect().toSeq
    assert(again == out.orderBy("id").collect().toSeq)
  }

  test("doremiWeights: upweights excess-loss domains, smooths toward uniform, sums to ~1e6") {
    import spark.implicits._
    // three domains: "hard" carries 1.0 nat of excess, "mid" 0.25,
    // "easy" none (proxy below reference clamps to 0)
    val perDoc = (
      (1L to 10L).map(i => (i, "hard", 4.0, 3.0)) ++
      (11L to 20L).map(i => (i, "mid", 3.25, 3.0)) ++
      (21L to 40L).map(i => (i, "easy", 2.8, 3.0))
    ).toDF("doc_id", "domain", "loss", "ref")
    val out = CorpusPrep.doremiWeights(perDoc, "domain", "loss", "ref")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("excess"), r.getAs[Long]("weight_ppm"))).toMap
    assert(out("hard")._1 == 1.0 && out("mid")._1 == 0.25 && out("easy")._1 == 0.0)
    // monotone in excess, and the exact multiplicative-weights value:
    // w = 0.9 * exp(eta*x) / sum + 0.1/3
    // mirror the operator's DECIMAL(18,8) snap of exp(eta*x)
    val es = Seq(1.0, 0.25, 0.0)
      .map(x => math.rint(math.exp(x) * 1e8) / 1e8)
    val expect = es.map(e => math.round(0.9 * e / es.sum * 1e6 + 1e5 / 3))
    assert(out("hard")._2 == expect(0), out)
    assert(out("mid")._2 == expect(1))
    assert(out("easy")._2 == expect(2))
    assert(math.abs(out.values.map(_._2).sum - 1000000L) <= 3)
    // smoothing floor: even a zero-weight domain keeps >= c/k of the mass
    assert(out("easy")._2 >= 100000L / 3)
    // degenerate: all-equal losses -> exactly uniform
    val flat = CorpusPrep.doremiWeights(
      (1L to 9L).map(i => (i, s"d${i % 3}", 3.0, 3.0))
        .toDF("doc_id", "domain", "loss", "ref"),
      "domain", "loss", "ref")
      .collect().map(_.getAs[Long]("weight_ppm")).toSeq
    assert(flat.forall(w => math.abs(w - 333333L) <= 1), flat)
  }

  test("doremiIterate: round 1 equals the single MW update; reweighting feeds back") {
    import spark.implicits._
    // domain "hard": every doc all-distinct words -> count-1 bigrams,
    // large KN-vs-MLE excess; domain "easy": one repeated phrase ->
    // heavy counts, near-zero excess
    val docs = (
      (1L to 5L).map(i => (i, "hard", (0 to 9).map(j => s"h${i}_$j").mkString(" "))) ++
      (6L to 10L).map(i => (i, "easy", Seq.fill(5)("b0 b1").mkString(" ")))
    ).toDF("doc_id", "source", "text")
    val traj = CorpusPrep.doremiIterate(docs, "text", "doc_id", "source",
      rounds = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getAs[Double]("loss"), r.getAs[Long]("weight_ppm"))).toMap
    assert(traj.size == 6)
    // every round's ppm simplex sums to ~1e6
    for (r <- 1L to 3L)
      assert(math.abs(traj((r, "hard"))._2 + traj((r, "easy"))._2 - 1000000L) <= 2)
    // round 1 IS mixture_doremi's single update (uniform scale 10^6
    // makes the weighted fit the unweighted fit in exact arithmetic)
    val single = CorpusPrep.doremiWeights(
      CorpusLm.bigramBothNll(docs, "text", "doc_id")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id")),
      "source", "kn_score", "lm_score")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("weight_ppm")).toMap
    assert(traj((1L, "hard"))._2 == single("hard"), (traj, single))
    assert(traj((1L, "easy"))._2 == single("easy"))
    // the hard domain carries the excess and gets upweighted
    assert(traj((1L, "hard"))._2 > traj((1L, "easy"))._2)
    // feedback: upweighting hard's counts supports its bigrams better,
    // so its refitted KN loss is non-increasing round over round
    assert(traj((2L, "hard"))._1 <= traj((1L, "hard"))._1)
    assert(traj((3L, "hard"))._1 <= traj((2L, "hard"))._1)
  }

  test("contrastiveBatches: no batch ever holds two members of one cluster") {
    import spark.implicits._
    // skewed clusters: one of 40, several small, many singletons
    val rows = ((1L to 40L).map(i => (i, 1000L)) ++
      (41L to 60L).map(i => (i, 1000L + i % 5)) ++
      (61L to 200L).map(i => (i, i))).toDF("id", "cluster")
    val out = CorpusPrep.contrastiveBatches(rows, "id", "cluster", 16)
    assert(out.count() == 200)
    val collisions = out.groupBy(col("batch_id"), col("cluster"))
      .count().where(col("count") > 1).count()
    assert(collisions == 0, "same-cluster pair shared a batch")
    // stratum arithmetic: rank-r members live in batch range [r*16, r*16+16)
    val bad = out
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
          .orderBy(col("id"))) - 1)
      .where(col("batch_id") < col("rk") * 16 ||
        col("batch_id") >= (col("rk") + 1) * 16)
      .count()
    assert(bad == 0)
  }
}
