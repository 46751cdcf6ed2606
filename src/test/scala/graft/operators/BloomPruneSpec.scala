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
