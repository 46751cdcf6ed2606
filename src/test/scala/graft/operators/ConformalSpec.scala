package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("splitConformal: exact order statistic, coverage, tiny-calibration null") {
    // calibration residuals (pred = 0): |y| = 1..10; alpha=20% →
    // k = ceil(11·0.8) = 9 → qhat = 9
    val calib = (1L to 10L).map(i => ("g", i, 0L)).toDF("grp", "y", "p")
    // test residuals 1..20: covered = r <= 9 → 9 of 20
    val test = (1L to 20L).map(i => ("g", i, 0L)).toDF("grp", "y", "p")
    val out = Conformal.splitConformal(calib, test, Seq("grp"), "y", "p",
      alphaPct = 20).head()
    assert(out.getLong(1) == 10L) // n_calib
    assert(out.getLong(2) == 9L) // qhat
    assert(out.getLong(3) == 20L && out.getLong(4) == 9L)
    assert(out.getLong(5) == 450000L) // exact ppm
    // a 2-row calibration at alpha=10%: k = ceil(3·0.9) = 3 > n → null
    // qhat (infinite interval), every test row covered
    val tiny = Seq(("g", 1L, 0L), ("g", 2L, 0L)).toDF("grp", "y", "p")
    val inf = Conformal.splitConformal(tiny, test, Seq("grp"), "y", "p",
      alphaPct = 10).head()
    assert(inf.isNullAt(2) && inf.getLong(4) == 20L &&
      inf.getLong(5) == 1000000L)
  }

  test("splitConformal: the 1-alpha guarantee holds empirically on an exchangeable split") {
    // one pool of deterministic pseudo-residuals split in half by id
    // hash: coverage on the held-out half must be close to 90%
    // (finite-sample: >= 1-alpha in expectation over splits; this
    // fixed split is pinned, the value is deterministic)
    val pool = spark.range(2000).select(lit("g").as("grp"),
      (pmod(xxhash64(col("id")), lit(1000))).as("y"), lit(0L).as("p"),
      pmod(xxhash64(col("id"), lit(7)), lit(2)).as("gate"))
    val out = Conformal.splitConformal(pool.where(col("gate") === 0),
      pool.where(col("gate") === 1), Seq("grp"), "y", "p", alphaPct = 10)
      .head()
    val cov = out.getLong(5) / 1e6
    assert(cov >= 0.87 && cov <= 0.93, s"coverage $cov far from 0.9")
  }
}
