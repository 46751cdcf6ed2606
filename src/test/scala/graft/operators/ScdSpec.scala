package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    // (key, ts, tie, state)
    (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"),
    (1L, 40L, 4L, "b"), (1L, 50L, 5L, "a"),
    (2L, 15L, 6L, "x"),
    (3L, 10L, 7L, "p"), (3L, 10L, 8L, "q") // same-ts tie broken by tie col
  ).toDF("k", "ts", "tie", "st")

  test("buildHistory collapses runs and sets interval bounds") {
    val h = Scd.buildHistory(log, "k", "ts", "tie", "st")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(h.toSeq === Seq(
      (1L, "a", 10L, 30L, false),
      (1L, "b", 30L, 50L, false),
      (1L, "a", 50L, -1L, true),
      (2L, "x", 15L, -1L, true),
      (3L, "p", 10L, 10L, false),
      (3L, "q", 10L, -1L, true)))
  }

  test("exactly one current row per key") {
    val h = Scd.buildHistory(log, "k", "ts", "tie", "st")
    val perKey = h.where(col("is_current")).groupBy(col("k")).count().collect()
    assert(perKey.forall(_.getLong(1) == 1L))
    assert(perKey.length == 3)
  }

  test("applyChanges ≡ buildHistory over the concatenated log") {
    // random-ish larger log, split at several boundaries
    val big = (1 to 400).map { i =>
      val k = i % 7
      (k.toLong, (i * 3 + k).toLong, i.toLong, s"s${(i * 2654435761L) % 3}")
    }.toDF("k", "ts", "tie", "st")
    for (cut <- Seq(100L, 600L, 1100L)) {
      val base = big.where(col("ts") < cut)
      val batch = big.where(col("ts") >= cut)
      val merged = Scd.applyChanges(
        Scd.buildHistory(base, "k", "ts", "tie", "st"),
        batch, "k", "ts", "tie", "st")
      val rebuilt = Scd.buildHistory(big, "k", "ts", "tie", "st")
      assert(merged.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(merged).isEmpty,
        s"merge at cut=$cut diverged from full rebuild")
    }
  }

  test("applyChanges handles keys new in the batch") {
    val base = Seq((1L, 10L, 1L, "a")).toDF("k", "ts", "tie", "st")
    val batch = Seq((9L, 20L, 2L, "z"), (9L, 30L, 3L, "y")).toDF("k", "ts", "tie", "st")
    val merged = Scd.applyChanges(Scd.buildHistory(base, "k", "ts", "tie", "st"),
      batch, "k", "ts", "tie", "st")
    val rebuilt = Scd.buildHistory(base.unionAll(batch), "k", "ts", "tie", "st")
    assert(merged.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(merged).isEmpty)
  }

  test("asOf returns each key's state at the probe instant") {
    val h = Scd.buildHistory(log, "k", "ts", "tie", "st")
    val at35 = Scd.asOf(h, lit(35L)).select(col("k"), col("st")).as[(Long, String)]
      .collect().toSet
    assert(at35 === Set((1L, "b"), (2L, "x"), (3L, "q")))
    // before key 2 is born: absent
    val at12 = Scd.asOf(h, lit(12L)).select(col("k"), col("st")).as[(Long, String)]
      .collect().toSet
    assert(at12 === Set((1L, "a"), (3L, "q")))
  }
}
