package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  private val Scale = 1000000000000L

  /** Double-precision reference on a collected graph (same dangling-mass
    * and damping conventions).
    */
  private def reference(edges: Seq[(String, String)], iters: Int): Map[String, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    val in = e.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var r = nodes.map(_ -> 1.0 / nodes.size).toMap
    for (_ <- 1 to iters) {
      r = nodes.map { v =>
        v -> (0.15 / nodes.size +
          0.85 * in.getOrElse(v, Nil).map(u => r(u) / out(u)).sum)
      }.toMap
    }
    r
  }

  test("matches a double-precision reference within fixed-point truncation error") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("d", "c"), ("d", "a"), ("e", "d")) // e dangles into d; nothing points at e
    val got = PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = reference(edges, 5)
    assert(got.keySet == want.keySet)
    // each integer div truncates < 1 ulp of the fixed point; 5 rounds
    // over ≤ depth-5 paths stay well under 1e-9 of rank mass
    got.foreach { case (n, fx) =>
      assert(math.abs(fx.toDouble / Scale - want(n)) < 1e-9, s"$n: $fx vs ${want(n)}")
    }
    // structural sanity: a receives c's ENTIRE rank (outdeg-1 edge) plus
    // half of d's — top of the graph; e, with no in-edges, is the floor
    assert(got("a") == got.values.max)
    assert(got("e") == got.values.min)
  }

  test("bit-identical under repartitioning and across runs (integer determinism)") {
    import spark.implicits._
    val edges = (1 to 200).map(i => (s"n${i % 50}", s"n${(i * 7) % 50}"))
      .filter(p => p._1 != p._2)
    def run(parts: Int): Map[String, Long] =
      PageRank.ranks(edges.toDF("src", "dst").repartition(parts),
          "src", "dst", iters = 5)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = run(1)
    assert(a == run(8))
    assert(a == run(3))
  }

  test("total mass never exceeds the fixed-point scale (overflow-free by induction)") {
    import spark.implicits._
    val edges = Seq(("x", "y"), ("y", "x"), ("z", "x"))
    val total = PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters = 10)
      .agg(sum(col("pr_fx"))).head().getLong(0)
    assert(total <= Scale)
    assert(total > Scale / 2) // and the decay from dangling mass is bounded too
  }

  test("personalized: seeding every node reproduces uniform PageRank exactly") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val allNodes = edges.select(col("src").as("n"))
      .unionAll(edges.select(col("dst"))).distinct()
    val uniform = PageRank.ranks(edges, "src", "dst", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ppr = PageRank.personalizedRanks(edges, "src", "dst", allNodes, iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ppr == uniform)
  }

  test("personalized: mass stays in the seed's component; unknown seeds rejected") {
    import spark.implicits._
    // two disconnected cycles
    val edges = Seq(("a", "b"), ("b", "a"), ("x", "y"), ("y", "x"))
      .toDF("src", "dst")
    val ppr = PageRank.personalizedRanks(edges, "src", "dst",
        Seq("a").toDF("node"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ppr("a") > 0 && ppr("b") > 0)
    assert(ppr("x") == 0 && ppr("y") == 0)
    // seed ranks dominate: proximity, not global importance
    assert(ppr("a") > ppr("x"))
    intercept[IllegalArgumentException] {
      PageRank.personalizedRanks(edges, "src", "dst",
        Seq("nope").toDF("node"), iters = 2)
    }
  }

  test("weightedRanks: uniform weights ≡ unweighted; heavy edges route more mass") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"))
      .toDF("src", "dst")
    val uniform = edges.withColumn("w", org.apache.spark.sql.functions.lit(7L))
    val wOut = PageRank.weightedRanks(uniform, "src", "dst", "w", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = PageRank.ranks(edges, "src", "dst", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wOut == plain)
    // skew a's mass toward b (w 9 vs 1): b must gain, c must lose
    val skew = Seq(("a", "b", 9L), ("a", "c", 1L), ("b", "c", 7L),
      ("c", "a", 7L)).toDF("src", "dst", "w")
    val sk = PageRank.weightedRanks(skew, "src", "dst", "w", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk("b") > wOut("b") && sk("c") < wOut("c"))
    // zero/negative-weight edges drop; determinism under repartition
    val withZero = skew.unionAll(Seq(("a", "z", 0L)).toDF("src", "dst", "w"))
    val z = PageRank.weightedRanks(withZero.repartition(5), "src", "dst",
      "w", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!z.contains("z") && z == sk)
    // parallel edges merge weights: (a,b,4)+(a,b,5) ≡ (a,b,9)
    val par = Seq(("a", "b", 4L), ("a", "b", 5L), ("a", "c", 1L),
      ("b", "c", 7L), ("c", "a", 7L)).toDF("src", "dst", "w")
    val p = PageRank.weightedRanks(par, "src", "dst", "w", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p == sk)
  }

  test("prepared-input paths are bit-identical to the raw-edge paths") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("c", "d"), ("d", "a")).toDF("src", "dst")
    // the stored-artifact shape: distinct edges + out-degree + weights
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    val ann = edges.distinct()
      .withColumn("od", count(lit(1)).over(w))
      .withColumn("w", lit(3L))
      .withColumn("wout", sum(col("w")).over(w))
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst"))).distinct()
    val raw = PageRank.ranks(edges, "src", "dst", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val prep = PageRank.ranksFromPrepared(ann, nodes, iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prep == raw)
    val wRaw = PageRank.weightedRanks(ann.select(col("src"), col("dst"),
        col("w")), "src", "dst", "w", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wPrep = PageRank.weightedRanksFromPrepared(ann, nodes, iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wPrep == wRaw)
    val seeds = Seq("a").toDF("node")
    val pRaw = PageRank.personalizedRanks(edges, "src", "dst", seeds, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pPrep = PageRank.personalizedRanksFromPrepared(ann, nodes, seeds,
        iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pPrep == pRaw)
  }

  test("continueRanks: k more rounds from a stored state ≡ (n+k) rounds") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("c", "d"), ("d", "a")).toDF("src", "dst")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    val ann = edges.distinct().withColumn("od", count(lit(1)).over(w))
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst"))).distinct()
    val r5 = PageRank.ranksFromPrepared(ann, nodes, iters = 5)
    val warm = PageRank.continueRanks(ann, nodes, r5, moreIters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cold = PageRank.ranks(edges, "src", "dst", iters = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(warm == cold)
  }
}
