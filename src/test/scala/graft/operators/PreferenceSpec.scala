package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(rows: Seq[(String, Long, Double)],
      topM: Int = 3, bottomM: Int = 3, minMargin: Double = 0.0) =
    Preference.pairs(rows.toDF("grp", "id", "score"),
      "grp", "id", "score", topM, bottomM, minMargin)

  test("strict preference: equal scores never pair, no self pairs") {
    val out = pairsOf(Seq(("g", 1L, 2.0), ("g", 2L, 2.0), ("g", 3L, 2.0)))
    assert(out.count() == 0)
  }

  test("top×bottom caps bound the fan-out") {
    val rows = (1 to 50).map(i => ("g", i.toLong, i.toDouble))
    val out = pairsOf(rows, topM = 3, bottomM = 3).collect()
    assert(out.length == 9)
    val chosen = out.map(_.getAs[Long]("chosen_id")).toSet
    val rejected = out.map(_.getAs[Long]("rejected_id")).toSet
    assert(chosen == Set(50L, 49L, 48L))
    assert(rejected == Set(1L, 2L, 3L))
  }

  test("margin floor drops near-tie pairs") {
    val rows = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 10.0))
    val out = pairsOf(rows, minMargin = 5.0)
    val pairs = out.select("chosen_id", "rejected_id")
      .as[(Long, Long)].collect().toSet
    // only 10-vs-1 (9.0) and 10-vs-2 (8.0) clear the 5.0 floor
    assert(pairs == Set((3L, 1L), (3L, 2L)))
  }

  test("margins are chosen - rejected and always >= the floor") {
    val rows = (1 to 20).flatMap(g =>
      (1 to 10).map(i => (s"g$g", (g * 100 + i).toLong, (i * 3).toDouble)))
    val out = pairsOf(rows, minMargin = 6.0)
    assert(out.where(col("margin") < 6.0 ||
      col("chosen_score") <= col("rejected_score")).count() == 0)
    val bad = out.where(
      col("margin") =!= col("chosen_score") - col("rejected_score")).count()
    assert(bad == 0)
  }

  test("a small group can emit fewer pairs but never mirrors") {
    val rows = Seq(("g", 1L, 1.0), ("g", 2L, 5.0))
    val out = pairsOf(rows).select("chosen_id", "rejected_id")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 1L)))
  }

  test("bradleyTerry: dominance orders ratings; normalization holds") {
    // a beats b 9/10, b beats c 9/10, a beats c 9/10 → rating a > b > c
    val matches = (
      Seq.fill(9)(("a", "b")) ++ Seq.fill(1)(("b", "a")) ++
      Seq.fill(9)(("b", "c")) ++ Seq.fill(1)(("c", "b")) ++
      Seq.fill(9)(("a", "c")) ++ Seq.fill(1)(("c", "a"))
    ).toDF("w", "l")
    val out = Preference.bradleyTerry(matches, "w", "l", iters = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out("a")._2 > out("b")._2 && out("b")._2 > out("c")._2, out)
    assert(out("a")._3 == 1L && out("b")._3 == 2L && out("c")._3 == 3L)
    assert(out("a")._1 == 18L && out("b")._1 == 10L && out("c")._1 == 2L)
    // mean-1 normalization (within the 4dp rounding of each rating)
    val mean = out.values.map(_._2).sum / 3
    assert(math.abs(mean - 1.0) < 1e-3, s"ratings mean $mean")
  }

  test("bradleyTerry: perfectly symmetric record rates everyone equal") {
    val matches = (Seq.fill(5)(("x", "y")) ++ Seq.fill(5)(("y", "x")))
      .toDF("w", "l")
    val out = Preference.bradleyTerry(matches, "w", "l")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("x") == out("y"))
    assert(out("x") == 1.0)
  }

  test("BtStream: folded count batches give the one-shot leaderboard; replay idempotent") {
    val matches = (
      Seq.fill(9)(("a", "b")) ++ Seq.fill(1)(("b", "a")) ++
      Seq.fill(9)(("b", "c")) ++ Seq.fill(1)(("c", "b"))
    ).zipWithIndex.map { case ((w, l), i) => (i.toLong, w, l) }
      .toDF("mid", "w", "l")
    val oneShot = Preference.bradleyTerry(matches, "w", "l")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val d = java.nio.file.Files.createTempDirectory("bt1").toString + "/s"
    for (b <- 0 until 4)
      graft.streaming.BtStream.applyBatch(
        matches.where(pmod(col("mid"), lit(4)) === b), "w", "l", d, b)
    def live = graft.streaming.BtStream.ratings(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(live == oneShot)
    // crash-retried batch is absorbed
    graft.streaming.BtStream.applyBatch(
      matches.where(pmod(col("mid"), lit(4)) === 3), "w", "l", d, 3)
    assert(live == oneShot)
  }

  test("groupAdvantage: hand-checked moments and the degenerate-group guard") {
    val rows = Seq(
      ("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0),
      ("flat", 4L, 5.0), ("flat", 5L, 5.0)).toDF("grp", "id", "score")
    val out = Preference.groupAdvantage(rows, "grp", "id", "score")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // g: mean 2, population std = sqrt(2/3)
    val sd = math.sqrt(2.0 / 3.0)
    assert(out(1L) == math.rint(-1.0 / sd * 1e4) / 1e4)
    assert(out(2L) == 0.0)
    assert(out(3L) == math.rint(1.0 / sd * 1e4) / 1e4)
    // all-equal group: advantage 0, not 0/0
    assert(out(4L) == 0.0 && out(5L) == 0.0)
  }

  test("groupAdvantage sums to ~0 within every group") {
    val rows = (1 to 40).map(i => (s"g${i % 4}", i.toLong, (i * i % 17).toDouble))
    val sums = Preference.groupAdvantage(rows.toDF("grp", "id", "score"),
      "grp", "id", "score")
      .groupBy("grp").agg(sum(col("advantage")).as("s"))
      .as[(String, Double)].collect()
    sums.foreach { case (g, s) => assert(math.abs(s) < 1e-2, s"$g sums to $s") }
  }

  test("partitioning does not change the pair set") {
    val rows = (1 to 30).flatMap(g =>
      (1 to 15).map(i => (s"g$g", (g * 1000 + i).toLong,
        ((i * 37) % 11).toDouble)))
    val base = pairsOf(rows).orderBy("grp", "chosen_id", "rejected_id")
      .collect().toSeq
    val shuffled = Preference.pairs(
      rows.toDF("grp", "id", "score").repartition(13),
      "grp", "id", "score", 3, 3, 0.0)
      .orderBy("grp", "chosen_id", "rejected_id").collect().toSeq
    assert(base == shuffled)
  }
}
