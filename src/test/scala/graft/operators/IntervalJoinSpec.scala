package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {

  // deterministic pseudo-random longs without Random: multiplicative hash
  private def h(i: Long, m: Long): Long = math.floorMod(i * 2654435761L, m)

  private def points = {
    import spark.implicits._
    (0L until 200L).map(i => (i, h(i, 1000L))).toDF("pid", "pt")
  }

  private def intervals(seed: Long, n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val s = h(i + seed, 950L)
      (seed * 1000 + i, s, s + h(i * 7 + seed, 120L))
    }.toDF("iid", "s", "e")
  }

  test("pointInInterval ≡ brute-force range join, across bin widths") {
    val iv = intervals(1L, 60)
    val naive = points.join(iv, col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(naive.nonEmpty && naive.length < 200 * 60) // non-trivial fixture
    for (w <- Seq(1L, 7L, 64L, 1000L, 5000L)) {
      val binned = IntervalJoin.pointInInterval(points, "pt", iv, "s", "e", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(binned.toSeq == naive.toSeq, s"binWidth=$w")
    }
  }

  test("intervalOverlap ≡ brute force and emits each pair exactly once") {
    val a = intervals(1L, 50)
      .select(col("iid").as("a_id"), col("s").as("as_"), col("e").as("ae"))
    val b = intervals(2L, 40)
      .select(col("iid").as("b_id"), col("s").as("bs"), col("e").as("be"))
    val naive = a.join(b, col("as_") <= col("be") && col("bs") <= col("ae"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(naive.nonEmpty)
    for (w <- Seq(1L, 13L, 100L, 4096L)) {
      val binned = IntervalJoin.intervalOverlap(a, "as_", "ae", b, "bs", "be", w)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(binned.length == binned.distinct.length, s"dup pair at binWidth=$w")
      assert(binned.sorted.toSeq == naive.toSeq, s"binWidth=$w")
    }
  }

  test("boundary semantics: inclusive ends, point on a bin edge, negative epochs") {
    import spark.implicits._
    val pts = Seq((1L, -10L), (2L, 0L), (3L, 10L), (4L, 20L), (5L, 21L))
      .toDF("pid", "pt")
    val iv = Seq((100L, -10L, 0L), (200L, 10L, 20L)).toDF("iid", "s", "e")
    val got = IntervalJoin.pointInInterval(pts, "pt", iv, "s", "e", 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // inclusive both ends; 21 is outside; negative values floor-bin correctly
    assert(got.toSeq == Seq((1L, 100L), (2L, 100L), (3L, 200L), (4L, 200L)))
  }

  test("bucketed-by-bin storage: the stored join is exchange-free and ≡ inline") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val iv = intervals(1L, 60)
    val inline = IntervalJoin.pointInInterval(points, "pt", iv, "s", "e", 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.writeBucketed(IntervalJoin.binPoints(points, "pt", 64L),
        "ij_pts_bkt", "__bin", 4, sortCols = Seq("__bin"))
      Layout.writeBucketed(IntervalJoin.binIntervals(iv, "s", "e", 64L),
        "ij_iv_bkt", "__bin", 4, sortCols = Seq("__bin"))
      val stored = IntervalJoin.joinBinned(spark.table("ij_pts_bkt"), "pt",
        spark.table("ij_iv_bkt"), "s", "e")
      val exchanges = stored.queryExecution.executedPlan.collectWithSubqueries {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed interval join still shuffles:\n${stored.queryExecution.executedPlan}")
      val got = stored.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == inline.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ij_pts_bkt")
      spark.sql("DROP TABLE IF EXISTS ij_iv_bkt")
    }
  }

  test("corrupt interval (end < start) fails loudly, not silently empty") {
    import spark.implicits._
    val pts = Seq((1L, 5L)).toDF("pid", "pt")
    val bad = Seq((1L, 10L, 3L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      IntervalJoin.pointInInterval(pts, "pt", bad, "s", "e", 10L).collect()
    }
    assert(ex.getMessage.contains("end < start")
      || ex.getCause != null && ex.getCause.getMessage.contains("end < start"))
  }
}
