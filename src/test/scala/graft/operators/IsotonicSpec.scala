package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def obs(bin: Long, pos: Int, neg: Int) =
    Seq.fill(pos)((bin, 1L)) ++ Seq.fill(neg)((bin, 0L))

  test("pavCalibrate: textbook pooling of a single violation") {
    // rates by bin: 0.2, 0.6, 0.4, 0.8 — bins 2 and 3 violate and pool
    // to (3+2)/(5+5) = 0.5; ends stay
    val df = (obs(1, 1, 4) ++ obs(2, 3, 2) ++ obs(3, 2, 3) ++ obs(4, 4, 1))
      .toDF("bin", "y")
    val out = Isotonic.pavCalibrate(df, "bin", "y")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(3) == 200000L)
    assert(out(2L).getLong(3) == 500000L && out(3L).getLong(3) == 500000L)
    assert(out(4L).getLong(3) == 800000L)
    // per-bin counts pass through
    assert(out(2L).getLong(1) == 5L && out(2L).getLong(2) == 3L)
  }

  test("pavCalibrate: cascading merges reach the global pool") {
    // strictly decreasing rates 1.0, 0.5, 0.0 → one block at 3/6
    val df = (obs(1, 2, 0) ++ obs(2, 1, 1) ++ obs(3, 0, 2)).toDF("bin", "y")
    val out = Isotonic.pavCalibrate(df, "bin", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 500000L, 2L -> 500000L, 3L -> 500000L))
  }

  test("pavCalibrate: monotone output, block-sum preservation, weights matter") {
    // weighted violation: heavy low-rate bin drags the pool below the
    // light bin's rate — (1·10 + 9·0? ) use: bin1 1/10, bin2 9/10 ok…
    // exercise weights: bin1 (9 of 10), bin2 (1 of 10) → pool 10/20
    val df = (obs(1, 9, 1) ++ obs(2, 1, 9)).toDF("bin", "y")
    val out = Isotonic.pavCalibrate(df, "bin", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 500000L && out(2L) == 500000L)
    // already-monotone input is untouched
    val mono = Isotonic.pavCalibrate(
      (obs(1, 1, 9) ++ obs(2, 5, 5) ++ obs(3, 9, 1)).toDF("bin", "y"),
      "bin", "y").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(mono == Map(1L -> 100000L, 2L -> 500000L, 3L -> 900000L))
    // output is always non-decreasing in bin (PAV invariant) on a
    // zigzag input, and pooled blocks preserve positives
    val zig = (obs(1, 3, 7) ++ obs(2, 8, 2) ++ obs(3, 1, 9) ++
      obs(4, 6, 4) ++ obs(5, 2, 8)).toDF("bin", "y")
    val rows = Isotonic.pavCalibrate(zig, "bin", "y")
      .orderBy(col("bin")).collect()
    val cal = rows.map(_.getLong(3))
    assert(cal.zip(cal.tail).forall { case (a, b) => a <= b }, cal.toSeq)
  }
}
