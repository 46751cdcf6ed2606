package graft.operators

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def uniform(n: Int, shift: Double = 0.0) =
    (0 until n).map(i => math.floorMod(i * 2654435761L, 1000L).toDouble + shift)
      .toDF("v")

  test("identical distributions score PSI = 0 exactly") {
    val base = uniform(1000)
    assert(Drift.psi(base, base, "v").head().getDouble(0) == 0.0)
  }

  test("a shifted distribution crosses the 0.25 'shifted' threshold; " +
      "a mild one stays under it") {
    val base = uniform(1000)
    val shifted = uniform(1000, shift = 800.0) // most mass lands in the top bin
    val big = Drift.psi(base, shifted, "v").head().getDouble(0)
    assert(big > 0.25, s"PSI $big for a gross shift")
    val mild = Drift.psi(base, uniform(1000, shift = 30.0), "v").head().getDouble(0)
    assert(mild < big && mild < 0.25, s"PSI $mild for a mild shift")
  }

  test("psiAll ≡ per-column psi; null values excluded from the distribution") {
    import org.apache.spark.sql.functions.{col, lit}
    val base = this.uniform(800).withColumn("w", col("v") * 2)
    val cur = this.uniform(500, shift = 120.0).withColumn("w", col("v") * 2 + 50)
    val all = Drift.psiAll(base, cur, Seq("v", "w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(all("v") == Drift.psi(base.select("v"), cur.select("v"), "v")
      .head().getDouble(0))
    assert(all("w") == Drift.psi(base.select("w"), cur.select("w"), "w")
      .head().getDouble(0))
    // nulls in the current side do not move the PSI (excluded, not binned)
    val curWithNulls = cur.unionAll(
      this.uniform(50).select(lit(null).cast("double").as("v"),
        lit(null).cast("double").as("w")))
    val withNulls = Drift.psiAll(base, curWithNulls, Seq("v", "w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(withNulls == all)
  }

  test("per-bin terms sum to the scalar PSI; baseline owns the bins") {
    val base = uniform(1000)
    val cur = uniform(400, shift = 200.0)
    val rows = Drift.psiByBin(base, cur, "v").collect()
    // baseline equal-frequency bins: every baseline bin present
    assert(rows.map(_.getInt(0)).toSet == (0 until 10).toSet)
    val summed = BigDecimal(rows.map(_.getDecimal(3)).map(BigDecimal(_)).sum
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val scalar = BigDecimal(Drift.psi(base, cur, "v").head().getDouble(0))
    assert(summed == scalar)
  }

  test("ksStatistic: identical samples → 0; hand pair → exactly 1/2") {
    import spark.implicits._
    val a = (0L until 100L).map(i => Tuple1(i % 10)).toDF("v")
    val same = Drift.ksStatistic(a, a, "v").head
    assert(same.getAs[Long]("n_a") == 100 && same.getAs[Long]("n_b") == 100)
    assert(same.getAs[Long]("ks_ppm") == 0L)
    // a = {1,2}, b = {2,3}: cum diffs 1/2, 1/2, 0 → KS = 1/2 exactly
    val x = Seq(1L, 2L).toDF("v")
    val y = Seq(2L, 3L).toDF("v")
    assert(Drift.ksStatistic(x, y, "v").head.getAs[Long]("ks_ppm") == 500000L)
  }

  test("ksStatistic: a location shift is detected, unlike a PSI-blind in-bin move") {
    import spark.implicits._
    val base = (0L until 1000L).map(i => Tuple1(i % 100)).toDF("v")
    val shifted = (0L until 1000L).map(i => Tuple1(i % 100 + 30)).toDF("v")
    val ks = Drift.ksStatistic(base, shifted, "v").head.getAs[Long]("ks_ppm")
    assert(ks == 300000L, s"shift of 30/100 of the support → KS 0.30; got $ks")
  }
}
