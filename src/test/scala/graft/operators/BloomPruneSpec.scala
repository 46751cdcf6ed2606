package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private val m = 256

  test("no false negatives: every build key probes as a hit") {
    val build = (1 to 300).map(i => s"key$i").toDF("k")
    val bits = BloomPrune.buildBits(build, "k", m)
    val probed = BloomPrune.probe(build, "k", bits, m)
    assert(probed.where(!col("bloom_hit")).count() == 0)
  }

  test("bits frame is bounded by m regardless of build size") {
    val build = (1 to 5000).map(i => s"key$i").toDF("k")
    val bits = BloomPrune.buildBits(build, "k", m)
    assert(bits.count() <= m)
    val range = bits.agg(min(col("bit")), max(col("bit"))).head()
    assert(range.getLong(0) >= 0 && range.getLong(1) < m)
  }

  test("probe preserves probe-side rows and columns") {
    val build = (1 to 50).map(i => s"key$i").toDF("k")
    val probe = (25 to 75).map(i => (i.toLong, s"key$i")).toDF("id", "k")
    val out = BloomPrune.probe(probe, "k",
      BloomPrune.buildBits(build, "k", m), m)
    assert(out.count() == probe.count())
    assert(out.columns.toSeq == Seq("id", "k", "bloom_hit"))
    // all 25..50 are true members → must be hits
    assert(out.where(col("id") <= 50 && !col("bloom_hit")).count() == 0)
  }

  test("false-positive rate of a lightly loaded filter stays small") {
    // 40 keys × 2 draws into 256 bits → load ≤ 80/256; fp ≈ load² < 0.10
    val build = (1 to 40).map(i => s"member$i").toDF("k")
    val bits = BloomPrune.buildBits(build, "k", m)
    val strangers = (1 to 1000).map(i => s"stranger$i").toDF("k")
    val fp = BloomPrune.probe(strangers, "k", bits, m)
      .where(col("bloom_hit")).count()
    assert(fp < 150, s"fp rate ${fp / 1000.0} too high for load ≤ 0.31")
  }

  test("sizeFor: smallest power of two >= 19n, and the fp it buys is ~1%") {
    for (n <- Seq(1L, 10L, 54L, 1000L, 123456L)) {
      val mz = BloomPrune.sizeFor(n)
      assert((mz & (mz - 1)) == 0, s"m=$mz not a power of two")
      assert(mz >= 19 * n && mz / 2 < 19 * n, s"m=$mz not minimal for n=$n")
      // the 19n rule lands m in [19n, 38n) → expected fp in ~[0.3%, 1%]
      val fp = BloomPrune.expectedFp(n, mz)
      assert(fp <= 0.0105, s"expected fp $fp above the 1% target at n=$n")
    }
    // the DuckDB replay 2^ceil(log2(19n)) agrees with the integer loop
    for (n <- Seq(1L, 7L, 54L, 999L, 123456L, 98765432L)) {
      val viaLog = math.pow(2, math.ceil(math.log(19.0 * n) / math.log(2))).toLong
      assert(viaLog == BloomPrune.sizeFor(n), s"log2 replay diverges at n=$n")
    }
  }

  test("measured fp rate tracks (1 - e^(-kn/m))^k at the sizeFor m") {
    val n = 500L
    val mz = BloomPrune.sizeFor(n) // 16384: expected fp ≈ (1-e^{-1000/16384})² ≈ 0.35%
    val build = (1L to n).map(i => s"member$i").toDF("k")
    val bits = BloomPrune.buildBits(build, "k", mz)
    val trials = 20000
    val strangers = (1 to trials).map(i => s"stranger$i").toDF("k")
    val hits = BloomPrune.probe(strangers, "k", bits, mz)
      .where(col("bloom_hit")).count()
    val measured = hits.toDouble / trials
    val expected = BloomPrune.expectedFp(n, mz)
    // 20k Bernoulli trials at p≈0.0035: 4σ ≈ 0.0017 — pin within ±0.004
    assert(math.abs(measured - expected) < 0.004,
      s"measured fp $measured vs expected $expected (m=$mz, n=$n)")
  }

  test("probe plan broadcasts the bits side (the batch never shuffles)") {
    val build = (1 to 100).map(i => s"key$i").toDF("k")
    val probe = (1 to 500).map(i => (i.toLong, s"x$i")).toDF("id", "k")
    val plan = BloomPrune.probe(probe, "k",
        BloomPrune.buildBits(build, "k", m), m)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }
}
