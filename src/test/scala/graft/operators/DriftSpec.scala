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
}
