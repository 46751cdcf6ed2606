package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch + estimate: small sets are exact, duplicates collapse") {
    val df = (Seq.fill(5)(("a", 1L)) ++ Seq(("a", 2L), ("a", 3L)) ++
      (1L to 10L).map(("b", _))).toDF("g", "v")
    val est = KmvSketch.estimate(
      KmvSketch.sketch(df, Seq("g"), "v", k = 64), Seq("g"), k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(est("a") == 3L && est("b") == 10L)
  }

  test("estimate: saturated sketch lands within the KMV error envelope") {
    val n = 20000L
    val df = (1L to n).map(("g", _)).toDF("g", "v")
    val k = 256
    val est = KmvSketch.estimate(
      KmvSketch.sketch(df, Seq("g"), "v", k), Seq("g"), k)
      .head().getLong(2)
    // standard error ~ n/sqrt(k-2) ≈ 1255; allow 4 sigma
    assert(math.abs(est - n) < 4 * n / math.sqrt(k - 2.0),
      s"est=$est for n=$n")
  }

  test("pairOps: exact on small sets, sound estimates on overlapping big sets") {
    // small: A={1..6}, B={4..9} → union 9, inter 3, J=333333 (exact path)
    val small = ((1L to 6L).map(("A", _)) ++ (4L to 9L).map(("B", _)))
      .toDF("g", "v")
    val sp = KmvSketch.pairOps(
      KmvSketch.sketch(small, Seq("g"), "v", k = 64), "g", k = 64).head()
    assert(sp.getString(0) == "A" && sp.getString(1) == "B")
    assert(sp.getLong(2) == 6L && sp.getLong(3) == 6L)
    assert(sp.getLong(4) == 9L && sp.getLong(5) == 3L &&
      sp.getLong(6) == 333333L)
    // big: |A|=12000, |B|=12000, |A∩B|=6000 → J = 1/3
    val big = ((1L to 12000L).map(("A", _)) ++
      (6001L to 18000L).map(("B", _))).toDF("g", "v")
    val bp = KmvSketch.pairOps(
      KmvSketch.sketch(big, Seq("g"), "v", k = 256), "g", k = 256).head()
    val (eu, ei, j) = (bp.getLong(4), bp.getLong(5), bp.getLong(6))
    assert(math.abs(eu - 18000L) < 4500, s"union est $eu")
    assert(math.abs(ei - 6000L) < 2500, s"inter est $ei")
    assert(j > 200000L && j < 480000L, s"jaccard ppm $j")
  }

  test("mergeability: the sketch of a union equals re-ranking the concat") {
    val a = (1L to 5000L).map(("x", _)).toDF("g", "v")
    val b = (3000L to 8000L).map(("x", _)).toDF("g", "v")
    val direct = KmvSketch.sketch(a.unionAll(b), Seq("g"), "v", k = 128)
      .collect().map(r => (r.getLong(1), r.getInt(2))).sortBy(_._2)
    // merge = dedup the two sketches' hashes, re-rank, cut at k
    val merged = KmvSketch.sketch(a, Seq("g"), "v", k = 128)
      .unionAll(KmvSketch.sketch(b, Seq("g"), "v", k = 128))
      .select(col("g"), col("h")).distinct()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
          .orderBy(col("h"))))
      .where(col("rk") <= 128)
      .collect().map(r => (r.getLong(1), r.getInt(2))).sortBy(_._2)
    assert(direct.toSeq == merged.toSeq)
  }
}
