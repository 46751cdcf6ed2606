package graft.operators

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {

  private def snaps = {
    import spark.implicits._
    val old = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val neu = Seq(
      (1L, "a", 10.0),   // unchanged
      (2L, "B", 20.0),   // updated (s)
      (3L, "c", 31.0),   // updated (v)
      (5L, "e", 50.0))   // inserted; 4 deleted
      .toDF("k", "s", "v")
    (old, neu)
  }

  test("changes classifies insert/delete/update; unchanged rows dropped") {
    val (old, neu) = snaps
    val got = SnapshotDiff.changes(old, neu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "update", 3L -> "update", 4L -> "delete",
      5L -> "insert"))
    // exact mode agrees on this fixture
    val exact = SnapshotDiff.changes(old, neu, Seq("k"), exact = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(exact == got)
  }

  test("null value-swap across columns is a change, not a hash wash") {
    import spark.implicits._
    val old = Seq((1L, Some("x"), None: Option[String]))
      .toDF("k", "c1", "c2")
    val neu = Seq((1L, None: Option[String], Some("x")))
      .toDF("k", "c1", "c2")
    assert(SnapshotDiff.changes(old, neu, Seq("k"))
      .collect().map(r => r.getString(1)).toSeq == Seq("update"))
    // and a genuinely identical null layout is unchanged
    assert(SnapshotDiff.changes(old, old, Seq("k")).count() == 0)
  }

  test("value-column order does not matter; disagreeing schemas are rejected") {
    import spark.implicits._
    val (old, neu) = snaps
    val shuffled = neu.select("v", "k", "s")
    val a = SnapshotDiff.changes(old, neu, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val b = SnapshotDiff.changes(old, shuffled, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      SnapshotDiff.changes(old, neu.withColumnRenamed("s", "t"), Seq("k"))
    }
  }

  test("summary counts reconcile with the new snapshot size") {
    val (old, neu) = snaps
    val r = SnapshotDiff.summary(old, neu, Seq("k")).head()
    assert(r.getAs[Long]("n_insert") == 1L)
    assert(r.getAs[Long]("n_delete") == 1L)
    assert(r.getAs[Long]("n_update") == 2L)
    assert(r.getAs[Long]("n_unchanged") == 1L)
  }
}
