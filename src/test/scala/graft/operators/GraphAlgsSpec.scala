package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class GraphAlgsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic random graph on n nodes (undirected, no self-loops). */
  private def randomEdges(n: Int, m: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    (1 to m).flatMap { _ =>
      val a = rnd.nextInt(n).toLong
      val b = rnd.nextInt(n).toLong
      if (a == b) None else Some((a, b))
    }.distinct
  }

  private def bruteTriangles(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).toSet
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      x <- nodes; y <- nodes if y > x && canon((x, y))
      z <- nodes if z > y && canon((x, z)) && canon((y, z))
    } yield (x, y, z)).toSet
  }

  test("triangles ≡ brute force on a random graph (messy input orientations)") {
    val edges = randomEdges(40, 300, seed = 7)
    // feed duplicates, reversed orientations, and a self-loop
    val messy = (edges ++ edges.map(_.swap) ++ Seq((5L, 5L))).toDF("a", "b")
    val got = GraphAlgs.triangles(messy)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === bruteTriangles(edges))
    assert(got.nonEmpty, "degenerate fixture: no triangles to check")
  }

  test("triangles are emitted exactly once each") {
    val edges = randomEdges(30, 200, seed = 11).toDF("a", "b")
    val t = GraphAlgs.triangles(edges)
    assert(t.count() == t.distinct().count())
  }

  test("triangleCounts sums per-vertex participation") {
    // one triangle + a pendant edge
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val counts = GraphAlgs.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  private def bruteBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
      maxHops: Int): Map[Long, Int] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (d <- 1 to maxHops) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist ++= frontier.map(_ -> d)
    }
    dist
  }

  test("bfs ≡ brute force on a random directed graph") {
    val raw = randomEdges(60, 150, seed = 23)
    val seeds = Set(0L, 1L, 2L)
    val got = GraphAlgs.bfs(raw.toDF("src", "dst"),
        seeds.toSeq.toDF("node"), maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === bruteBfs(raw.distinct, seeds, 3))
  }

  test("ssspBounded ≡ brute-force Bellman-Ford rounds (parallel edges keep cheapest)") {
    val rnd = new Random(31)
    val raw = (1 to 200).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong, (1 + rnd.nextInt(9)).toLong)
    }.filter(e => e._1 != e._2)
    val seeds = Set(0L, 5L)
    val rounds = 3
    // brute force: dist over exactly <= rounds edge relaxations
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val relaxed = raw.flatMap { case (s, d, w) =>
        dist.get(s).map(c => d -> (c + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).min }
    }
    val got = GraphAlgs.ssspBounded(raw.toDF("src", "dst", "w"),
        seeds.toSeq.toDF("node"), rounds)
      .as[(Long, Long)].collect().toMap
    assert(got === dist)
    assert(got.values.exists(_ > 0), "degenerate fixture")
  }

  test("bfs at maxHops = 0 returns exactly the seeds") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val got = GraphAlgs.bfs(e, Seq(1L).toDF("node"), maxHops = 0)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0))
  }

  test("kCoreBounded ≡ brute-force peel; triangle survives k=2, tendrils go") {
    // triangle 1-2-3 with tendril 3-4-5
    val kite = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val core = GraphAlgs.kCoreBounded(kite, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))

    // brute force on a layered graph: K6 hub (0..5, degree 5 inside),
    // a middle ring 6..11 with exactly 3 links each (2 ring + 1 hub —
    // peels once its hub support thins), and degree-1 fringe 12..17 —
    // so the 3-core keeps the hub and the peel has real work per round
    val hub = for { a <- 0L until 6L; b <- (a + 1) until 6L } yield (a, b)
    val ring = (0 until 6).flatMap { i =>
      Seq((6L + i, 6L + (i + 1) % 6), (6L + i, i.toLong % 3))
    }
    val fringe = (0 until 6).map(i => (12L + i, (6L + i)))
    val raw = (hub ++ ring ++ fringe)
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val rounds = 4
    var es = raw.toSet
    for (_ <- 1 to rounds) {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= 3).keySet
      es = es.filter(e => keep(e._1) && keep(e._2))
    }
    val expect = es.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val got = GraphAlgs.kCoreBounded(raw.toDF("a", "b"), k = 3, rounds = rounds)
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
    assert(expect.nonEmpty && expect.size < 22, "degenerate fixture")
  }

  test("earliestArrival ≡ brute force; time-ordering blocks static-BFS paths") {
    // hand case first: a →(t=5) b →(t=3) c is NOT time-respecting
    val hand = Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 4L, 7L))
      .toDF("src", "dst", "t")
    val got = GraphAlgs.earliestArrival(hand, Seq(1L).toDF("node"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 4L -> 7L)) // c unreachable in time

    // brute force on a deterministic random temporal graph
    val edges = (0 until 60).map { i =>
      (math.floorMod(i * 7 + 3, 12).toLong,
        math.floorMod(i * 11 + 5, 12).toLong,
        math.floorMod(i * 2654435761L, 50L))
    }.filter(e => e._1 != e._2).distinct
    val seeds = Seq(0L, 1L)
    val rounds = 3
    var best = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val stepped = for {
        (n, a) <- best.toSeq
        (s, d, t) <- edges if s == n && t >= a
      } yield d -> t
      best = (best.toSeq ++ stepped).groupBy(_._1)
        .map { case (n, as) => n -> as.map(_._2).min }
    }
    val spark0 = GraphAlgs.earliestArrival(edges.toDF("src", "dst", "t"),
        seeds.toDF("node"), rounds)
      .as[(Long, Long)].collect().toMap
    assert(spark0 == best)
    assert(best.size > seeds.size, "degenerate fixture")
  }

  test("clusteringCoefficients: known values on a kite graph, zero for leaves") {
    // triangle 1-2-3 plus edge 3-4 (a leaf) and chain 4-5
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = GraphAlgs.clusteringCoefficients(e)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 1L, 1.0)))  // both neighbors connected
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, round4(2.0 / 6))))  // 1 of 3 possible wedges
    assert(got(4L) == ((2L, 0L, 0.0)))  // neighbors 3,5 not adjacent
    assert(got(5L) == ((1L, 0L, 0.0)))  // degree-1: no wedge, no div-zero
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("neighborhoodFunction: exact ball sizes on a path graph") {
    // undirected path 1-2-3-4 (both orientations passed explicitly)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L)).flatMap { case (a, b) =>
      Seq((a, b), (b, a))
    }.toDF("src", "dst")
    val got = GraphAlgs.neighborhoodFunction(und, maxHops = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size == 16) // 4 nodes × 4 hop slots, densified
    for (n <- 1L to 4L) assert(got((n, 0L)) == 1L)
    assert(got((1L, 1L)) == 2L && got((2L, 1L)) == 3L &&
      got((3L, 1L)) == 3L && got((4L, 1L)) == 2L)
    assert(got((1L, 2L)) == 3L && got((2L, 2L)) == 4L &&
      got((3L, 2L)) == 4L && got((4L, 2L)) == 3L)
    for (n <- 1L to 4L) assert(got((n, 3L)) == 4L) // whole graph reached
  }

  test("neighborhoodFunction ≡ brute force on a random directed graph") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(140)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).distinct
    val maxHops = 3
    // brute force: iterate reachable sets
    var balls: Map[Long, Set[Long]] =
      edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> Set(n)).toMap
    val expect = scala.collection.mutable.Map[(Long, Long), Long]()
    for ((n, s) <- balls) expect((n, 0L)) = s.size.toLong
    for (hop <- 1 to maxHops) {
      balls = balls.map { case (n, s) =>
        n -> (s ++ s.flatMap(r => edges.collect { case (`r`, d) => d }))
      }
      for ((n, s) <- balls) expect((n, hop.toLong)) = s.size.toLong
    }
    val got = GraphAlgs.neighborhoodFunction(edges.toDF("src", "dst"), maxHops)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expect.toMap)
  }

  test("neighborhoodFunctionHll tracks the exact neighborhood function") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(900)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter(e => e._1 != e._2).distinct.toDF("src", "dst")
      .persist()
    val exact = GraphAlgs.neighborhoodFunction(edges, maxHops = 2)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val est = GraphAlgs.neighborhoodFunctionHll(edges, maxHops = 2)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(est.keySet == exact.keySet)
    // lgConfigK=12 ⇒ ~1.6% RSE; allow 10% per-node, 3% on the mean
    val ratios = exact.toSeq.map { case (k, v) =>
      est(k).toDouble / math.max(v, 1L).toDouble }
    assert(ratios.forall(r => r > 0.9 && r < 1.1),
      s"worst ratios: ${ratios.sortBy(r => math.abs(r - 1)).takeRight(3)}")
    val meanErr = ratios.map(r => math.abs(r - 1)).sum / ratios.size
    assert(meanErr < 0.03, s"mean relative error $meanErr")
    edges.unpersist()
  }

  test("neighborhoodFunctionHllOwn: balls grow monotonically and track exact at p=8") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(700)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(e => e._1 != e._2).distinct.toDF("src", "dst").persist()
    val exact = GraphAlgs.neighborhoodFunction(edges, maxHops = 2)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val est = GraphAlgs.neighborhoodFunctionHllOwn(edges, maxHops = 2, p = 8)
      .select("node", "hop", "est")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(est.keySet == exact.keySet)
    // p=8 ⇒ m=256, RSE ≈ 6.5% — but the RAW estimator (no HLL++ bias
    // table) runs biased in the 2.5m..5m transition zone, so pin the
    // tail loosely and the MEAN tightly (correctness is the oracle
    // hash; this pin is estimator quality)
    val ratios = exact.toSeq.map { case (k, v) =>
      est(k) / math.max(v, 1L).toDouble }
    assert(ratios.forall(r => r > 0.6 && r < 1.4),
      s"worst: ${ratios.sortBy(r => math.abs(r - 1)).takeRight(3)}")
    val meanErr = ratios.map(r => math.abs(r - 1)).sum / ratios.size
    assert(meanErr < 0.08, s"mean relative error $meanErr")
    // a register only grows hop to hop, so the estimate never shrinks
    val byNode = est.groupBy(_._1._1)
    byNode.foreach { case (n, hops) =>
      val ordered = hops.toSeq.sortBy(_._1._2).map(_._2)
      assert(ordered == ordered.sorted, s"node $n ball shrank: $ordered")
    }
    edges.unpersist()
  }

  test("markovStationary: two-state chain hits the hand-computed fixed point") {
    import spark.implicits._
    // A: half self-loop, half to B; B: always back to A. True stationary
    // distribution is (2/3, 1/3); the halving recurrence is exact in
    // binary so 8 integer rounds give EXACTLY 0.666015625 — bit-pinned.
    val t = Seq(("A", "A", 1L), ("A", "B", 1L), ("B", "A", 1L))
      .toDF("src", "dst", "n")
    val pi = GraphAlgs.markovStationary(t, "src", "dst", "n", iters = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pi("A") + pi("B") == 1000000000000L) // exact mass conservation
    assert(pi("A") == 666015625000L && pi("B") == 333984375000L, pi)
  }

  test("hits: one round on a bipartite star matches hand integers") {
    import spark.implicits._
    // s1→{p1,p2}, s2→{p1}: a1 = (2e6, 1e6)/3e6 → p1 666666, p2 333333;
    // h1 raw = (999999, 666666), total 1666665 → s1 600000 EXACTLY
    // (1666665·600000 = 999999·10⁶), s2 400000 (floor)
    val e = Seq(("s1", "p1"), ("s1", "p2"), ("s2", "p1")).toDF("src", "dst")
    val m = GraphAlgs.hits(e, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("s1") == (600000L, 0L) && m("s2") == (400000L, 0L), m)
    assert(m("p1") == (0L, 666666L) && m("p2") == (0L, 333333L), m)
  }

  test("hits: three rounds keep the mutual-reinforcement order, deterministically") {
    import spark.implicits._
    val e = Seq(("s1", "p1"), ("s1", "p2"), ("s2", "p1")).toDF("src", "dst")
    val out = GraphAlgs.hits(e, "src", "dst", iters = 3)
    val m = out.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("s1")._1 > m("s2")._1) // broader supplier = stronger hub
    assert(m("p1")._2 > m("p2")._2) // better-endorsed part = stronger authority
    val again = GraphAlgs.hits(e, "src", "dst", iters = 3)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("absorptionProbability: hand chain incl. absorbing-as-sink and dead ends") {
    import spark.implicits._
    // B → A → {purchase | C} 50/50; C and purchase are sinks.
    // p(A) = 1/2, p(B) = 1/2 (after ≥ 2 rounds), p(purchase) pinned 1.
    val t = Seq(("B", "A", 2L), ("A", "purchase", 1L), ("A", "C", 1L))
      .toDF("src", "dst", "n")
    val m = GraphAlgs.absorptionProbability(t, "src", "dst", "n",
        absorbing = "purchase", iters = 8)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // purchase is in the output even though it is never a source
    assert(m == Map("A" -> 500000L, "B" -> 500000L, "purchase" -> 1000000L), m)
  }

  test("kTrussBounded: K4 survives at k=4, a hanging triangle peels off") {
    import spark.implicits._
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    // K4 on {1..4} (every edge in 2 triangles) + triangle {4,5,6}
    // (support 1 each) + pendant edge 6-7 (support 0)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(4L, 5L, 6L)) :+ ((6L, 7L))).toDF("a", "b")
    val out = GraphAlgs.kTrussBounded(edges, "a", "b", k = 4, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet == clique(Seq(1L, 2L, 3L, 4L)).toSet)
    assert(out.values.forall(_ == 2L), out)
    // k=3 keeps both triangle structures, drops only the pendant
    val loose = GraphAlgs.kTrussBounded(edges, "a", "b", k = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(4L, 5L, 6L))).toSet)
    // determinism under repartition (exact integer supports)
    val again = GraphAlgs.kTrussBounded(edges.repartition(5), "a", "b",
      k = 4, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again == out)
  }

  test("betweennessFromSeeds: diamond dependencies, multi-seed sums") {
    import spark.implicits._
    // diamond 1-2-4, 1-3-4: from seed 1, both middles carry δ = σ/σ(4)
    // = 1/2 → 500000 ppm; the far end carries 0
    val edges = Seq(("1", "2"), ("1", "3"), ("2", "4"), ("3", "4"))
      .toDF("a", "b")
    val one = GraphAlgs.betweennessFromSeeds(edges, "a", "b",
        Seq("1").toDF("seed"), "seed", maxHops = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == Map("2" -> 500000L, "3" -> 500000L, "4" -> 0L))
    // two opposite seeds: middle dependencies add up symmetrically
    val two = GraphAlgs.betweennessFromSeeds(edges, "a", "b",
        Seq("1", "4").toDF("seed"), "seed", maxHops = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(two("2") == 1000000L && two("3") == 1000000L)
    assert(two("1") == 0L && two("4") == 0L)
    // path 1-2-3: the cut vertex carries the full unit
    val path = GraphAlgs.betweennessFromSeeds(
        Seq(("1", "2"), ("2", "3")).toDF("a", "b"),
        "a", "b", Seq("1").toDF("seed"), "seed", maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(path == Map("2" -> 1000000L, "3" -> 0L))
    // deterministic under repartition
    val again = GraphAlgs.betweennessFromSeeds(edges.repartition(5), "a", "b",
        Seq("1", "4").toDF("seed"), "seed", maxHops = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == two)
  }

  test("node2vecWalks: exact replay of the weighted second-order draw") {
    import spark.implicits._
    // triangle 1-2-3 with pendant 4 on 2; undirected (both orientations)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L))
      .flatMap { case (a, b) => Seq((a.toString, b.toString),
        (b.toString, a.toString)) }
    val edges = und.toDF("src", "dst")
    val starts = Seq("1", "2", "3", "4").toDF("start")
    val (p, q) = (2L, 3L)
    val got = GraphAlgs.node2vecWalks(edges, "src", "dst", starts, "start",
        steps = 3, p = p, q = q)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2))
      .toMap
    // independent replay: same md5 draw, same weight triple
    val adj = und.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).sorted }.toMap
    def draw48(key: String): BigInt = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      BigInt(d.take(6).map("%02x".format(_)).mkString, 16)
    }
    def step(start: String, prev: String, cur: String, t: Int): Option[String] = {
      val nbrs = adj.getOrElse(cur, Nil)
      if (nbrs.isEmpty) return None
      val ws = nbrs.map { x =>
        if (x == prev) q
        else if (adj.getOrElse(prev, Nil).contains(x)) p * q
        else p
      }
      val tot = ws.sum
      val r = (draw48(s"$start:$prev:$cur:$t") mod BigInt(tot)).toLong
      val cum = ws.scanLeft(0L)(_ + _).tail
      Some(nbrs(cum.indexWhere(_ > r)))
    }
    for (s0 <- Seq("1", "2", "3", "4")) {
      var (prev, cur) = ("-", s0)
      assert(got((s0, 0L)) == s0)
      for (t <- 1 to 3) {
        val nxt = step(s0, prev, cur, t).get // no sinks in this graph
        assert(got((s0, t.toLong)) == nxt,
          s"start=$s0 step=$t: got ${got((s0, t.toLong))}, replay $nxt")
        prev = cur; cur = nxt
      }
    }
    // deterministic under repartition
    val again = GraphAlgs.node2vecWalks(edges.repartition(5), "src", "dst",
        starts, "start", steps = 3, p = p, q = q)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2))
      .toMap
    assert(again == got)
  }

  test("node2vecWalks: a walk reaching a sink ends there") {
    import spark.implicits._
    // directed path 1→2→3 with NO edges out of 3
    val edges = Seq(("1", "2"), ("2", "3")).toDF("src", "dst")
    val starts = Seq("1").toDF("start")
    val out = GraphAlgs.node2vecWalks(edges, "src", "dst", starts, "start",
        steps = 4, p = 1L, q = 1L)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(out == Map(0L -> "1", 1L -> "2", 2L -> "3"))
  }

  test("linkPrediction: common neighbors, Jaccard ppm, hub cap, adjacency excluded") {
    import spark.implicits._
    // square 1-2-3-4-1: diagonals (1,3) and (2,4) each share BOTH
    // square neighbors; plus node 5 hanging off 1 (degree 1)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 5L))
      .toDF("a", "b")
    val out = GraphAlgs.linkPrediction(edges, "a", "b", minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // adjacent pairs never appear; (1,3): common {2,4}, deg 3 and 2 →
    // 2/(3+2-2) = 666666 ppm; (2,4): common {1,3}, deg 2,2 → 2/2 = 1e6
    assert(out.keySet == Set((1L, 3L), (2L, 4L)))
    assert(out((1L, 3L)) == ((2L, 3L, 2L, 666666L)))
    assert(out((2L, 4L)) == ((2L, 2L, 2L, 1000000L)))
    // minCommon 1 admits the degree-1 wedges through node 1
    val loose = GraphAlgs.linkPrediction(edges, "a", "b", minCommon = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.contains((2L, 5L)) && loose.contains((4L, 5L)) &&
      loose.contains((3L, 5L)) == false)
    // capping out node 1 (degree 3) removes every wedge through it:
    // (2,4) survives via node 3 only, with common dropping to 1
    val capped = GraphAlgs.linkPrediction(edges, "a", "b", minCommon = 1L,
        maxDegree = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(!capped.keySet.exists(p => p._1 == 5L || p._2 == 5L))
    assert(capped((2L, 4L)) == 1L && capped((1L, 3L)) == 2L)
  }

  test("labelPropagation: two cliques with a bridge resolve to two communities") {
    import spark.implicits._
    // K4 on {1..4}, K4 on {11..14}, one bridge 4-11
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(11L, 12L, 13L, 14L)) :+ ((4L, 11L))).toDF("a", "b")
    val out = GraphAlgs.labelPropagation(edges, "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 8)
    // each clique converges to its own min label; the bridge does not
    // merge them (votes inside the clique dominate)
    assert(Seq(1L, 2L, 3L, 4L).map(out).toSet.size == 1)
    assert(Seq(11L, 12L, 13L, 14L).map(out).toSet.size == 1)
    assert(out(1L) != out(11L), s"bridge merged the cliques: $out")
    // deterministic: same edges -> same labels on any partitioning
    val again = GraphAlgs.labelPropagation(edges.repartition(5), "a", "b",
      rounds = 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("randomWalks: walks follow real edges, full length, deterministic") {
    import spark.implicits._
    // 4-cycle plus a chord — every node has out-edges, so all walks
    // run the full 3 hops
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"))
      .flatMap { case (x, y) => Seq((x, y), (y, x)) }.toDF("src", "dst")
    val starts = Seq("a", "b", "c", "d").toDF("start")
    val walks = GraphAlgs.randomWalks(edges, "src", "dst", starts, "start", 3)
    // steps+1 positions per start
    val perStart = walks.groupBy(col("start")).count()
      .collect().map(_.getLong(1)).toSeq
    assert(perStart == Seq(4L, 4L, 4L, 4L), perStart)
    // every consecutive (node, next) pair is a real edge
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("start")).orderBy(col("step"))
    val hops = walks.withColumn("next", lead(col("node"), 1).over(w))
      .where(col("next").isNotNull)
    assert(hops.join(edges, hops("node") === edges("src")
      && hops("next") === edges("dst"), "left_anti").isEmpty)
    // bit-identical rerun
    val again = GraphAlgs.randomWalks(edges, "src", "dst", starts, "start", 3)
    assert(walks.exceptAll(again).isEmpty && again.exceptAll(walks).isEmpty)
  }

  test("randomWalks: a walk reaching a sink ends there") {
    import spark.implicits._
    val edges = Seq(("a", "z")).toDF("src", "dst") // z has no out-edges
    val walks = GraphAlgs.randomWalks(edges, "src", "dst",
      Seq("a").toDF("start"), "start", 5)
    val nodes = walks.orderBy(col("step")).collect()
      .map(r => r.getLong(1) -> r.getString(2)).toSeq
    assert(nodes == Seq(0L -> "a", 1L -> "z"), nodes) // then silence
  }

  test("markovStationary: sink states drop; inbound mass floors away") {
    import spark.implicits._
    // C never occurs as a source → not a state; A's total out-count
    // still includes the A→C transition, so each round halves A's mass
    val t = Seq(("A", "A", 1L), ("A", "C", 1L)).toDF("src", "dst", "n")
    val m = GraphAlgs.markovStationary(t, "src", "dst", "n", iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet == Set("A"), m)
    assert(m("A") == 250000000000L, m)
  }
}
