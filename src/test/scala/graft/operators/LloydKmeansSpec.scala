package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LloydKmeansSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) =
    (1L to n.toLong).map(i =>
      (i, Seq.tabulate(4)(d => ((i * 7 + d * 3) % 13).toFloat / 13f)))
      .toDF("id", "v")

  test("fitIvfOwn is invariant to input partitioning") {
    val df = vecs(60)
    val a = LloydKmeans.fitIvfOwn(df.repartition(1), "v", "id",
      k = 4, rounds = 3)
    val b = LloydKmeans.fitIvfOwn(df.repartition(7, col("id")), "v", "id",
      k = 4, rounds = 3)
    // decimal-summed means + hash-ranked seeds: bit-identical however
    // the rows were partitioned (the property the SQL replay relies on)
    assert(a == b)
    assert(a.size == 4 && a.forall(_._2.size == 4))
  }

  test("fitIvfOwn: an emptied cell keeps its previous centroid") {
    // two far clusters and k=3: the third hash-ranked seed lands inside
    // one of them, and once Lloyd reassigns its members the emptied
    // cell must carry its last centroid forward, not NaN out
    val df = ((1L to 20L).map(i => (i, Seq(0.0f, 0.0f, 0.0f, 0.0f))) ++
      (21L to 40L).map(i => (i, Seq(9.0f, 9.0f, 9.0f, 9.0f))))
      .toDF("id", "v")
    val cents = LloydKmeans.fitIvfOwn(df, "v", "id", k = 3, rounds = 3)
    assert(cents.size == 3)
    assert(cents.forall(_._2.forall(x => !x.isNaN)))
    // the two real clusters are recovered exactly by some pair of cells
    val set = cents.map(_._2.map(math.round).toSeq).toSet
    assert(set.contains(Seq(0L, 0L, 0L, 0L)) && set.contains(Seq(9L, 9L, 9L, 9L)))
  }

  test("fitIvfOwn with rounds = 0 returns the hash-ranked seeds verbatim") {
    val df = vecs(10)
    val seeds = LloydKmeans.fitIvfOwn(df, "v", "id", k = 3, rounds = 0)
    val ranked = df.orderBy(xxhash64(col("id")), col("id")).limit(3)
      .collect().map(_.getSeq[Float](1).map(_.toDouble))
    seeds.zip(ranked).foreach { case ((_, c), r) =>
      c.zip(r).foreach { case (a, b) => assert(math.abs(a - b) < 1e-10) }
    }
  }

  test("fitPqOwn: duplicate vectors never seed duplicate codes; partition-invariant") {
    // 8 distinct subvector values duplicated many times: each
    // subspace's init must take DISTINCT subvectors in first-seen hash
    // order, so no two codes start equal
    val df = (1L to 64L).map(i =>
      (i, Seq.tabulate(8)(d => ((i % 8) + d).toFloat / 10f)))
      .toDF("id", "v")
    val a = LloydKmeans.fitPqOwn(df.repartition(1),
      "v", "id", dim = 8, m = 2, codesPerSub = 4, rounds = 2)
    val b = LloydKmeans.fitPqOwn(df.repartition(5, col("id")),
      "v", "id", dim = 8, m = 2, codesPerSub = 4, rounds = 2)
    assert(a == b)
    a.foreach { cb =>
      val starts = cb.map(_._2)
      assert(starts.distinct.size == starts.size,
        s"duplicate codebook entries: $cb")
    }
  }

  test("snapVec is idempotent and lands on the 1e-10 grid") {
    val df = Seq((1L, Seq(0.123456789012345f, 1.0f / 3.0f))).toDF("id", "v")
    val once = df.select(LloydKmeans.snapVec(col("v")).as("s"))
    val twice = once.select(LloydKmeans.snapVec(col("s")).as("s"))
    assert(once.head.getSeq[Double](0) == twice.head.getSeq[Double](0))
    once.head.getSeq[Double](0).foreach { x =>
      val scaled = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
      assert((scaled.toDouble - x).abs < 1e-15)
    }
  }
}
