package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SprtStreamSpec extends SparkSpec {
  import spark.implicits._

  private def arrivals = Seq(
    ("A", 1L, 1L), ("A", 1L, 0L), ("A", 2L, 1L), ("A", 3L, 0L),
    ("B", 1L, 0L), ("B", 2L, 0L), ("B", 2L, 1L), ("B", 3L, 1L)
  ).toDF("arm", "hour", "conv")

  private def curveOf(dir: String) =
    SprtStream.curve(spark, dir, p0 = 0.4, p1 = 0.5, bound = 2.94443898)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getString(5)))
      .toSortedMapLike

  implicit private class M(rows: Array[((String, Long), (Long, Long, Double, String))]) {
    def toSortedMapLike = rows.sortBy(_._1).toSeq
  }

  test("batch packing never changes the maintained curve") {
    val d1 = java.nio.file.Files.createTempDirectory("sprt1").toString
    SprtStream.applyBatch(arrivals, s"$d1/c", 0)
    val one = curveOf(s"$d1/c")
    val d2 = java.nio.file.Files.createTempDirectory("sprt2").toString
    SprtStream.applyBatch(arrivals.where(col("hour") === 1), s"$d2/c", 0)
    SprtStream.applyBatch(arrivals.where(col("hour") === 2), s"$d2/c", 1)
    SprtStream.applyBatch(arrivals.where(col("hour") === 3), s"$d2/c", 2)
    val three = curveOf(s"$d2/c")
    assert(one == three)
    // cumulative sanity: arm A at hour 3 has 4 arrivals, 2 conversions
    val a3 = one.toMap.apply(("A", 3L))
    assert(a3._1 == 4L && a3._2 == 2L)
  }

  test("crash-retried batch does not double-count (exactly-once)") {
    val d = java.nio.file.Files.createTempDirectory("sprt3").toString
    SprtStream.applyBatch(arrivals.where(col("hour") <= 2), s"$d/c", 0)
    SprtStream.applyBatch(arrivals.where(col("hour") === 3), s"$d/c", 1)
    val once = curveOf(s"$d/c")
    // the stream engine re-delivers batch 1 after a crash: same id,
    // same rows — the versioned overwrite must absorb it
    SprtStream.applyBatch(arrivals.where(col("hour") === 3), s"$d/c", 1)
    assert(curveOf(s"$d/c") == once)
  }

  test("decision flips at the bound; llr matches the closed form") {
    // 10 conversions, 0 misses: llr = 10·ln(1.25) = 2.2314 → continue;
    // 14 straight conversions: 14·ln(1.25) = 3.1240 → reject_h0
    val d = java.nio.file.Files.createTempDirectory("sprt4").toString
    val wins = (1 to 14).map(i => ("A", i.toLong, 1L)).toDF("arm", "hour", "conv")
    SprtStream.applyBatch(wins, s"$d/c", 0)
    val m = curveOf(s"$d/c").toMap
    assert(m.apply(("A", 10L))._3 == 2.2314 && m(("A", 10L))._4 == "continue")
    assert(m(("A", 14L))._3 == 3.124 && m(("A", 14L))._4 == "reject_h0")
  }
}
