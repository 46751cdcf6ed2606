package graft.operators

import graft.SparkSpec

class CupedSpec extends SparkSpec {

  test("cuped: Y = X exactly → θ = 1, ρ² = 1, adjusted effect zero") {
    import spark.implicits._
    // metric equals covariate: every bit of arm difference is
    // pre-period selection noise — CUPED must remove it all
    val df = Seq(
      ("A", 2000000L, 2000000L), ("A", 4000000L, 4000000L),
      ("B", 1000000L, 1000000L), ("B", 3000000L, 3000000L))
      .toDF("arm", "y", "x")
    val r = Cuped.effect(df, "arm", "y", "x", "A", "B").head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 1.0)   // theta
    assert(r.getDouble(2) == 1.0)   // raw effect (µ → natural units)
    assert(r.getDouble(3) == 0.0)   // cuped effect
    assert(r.getDouble(4) == 1.0)   // variance reduction ρ²
  }

  test("cuped: uncorrelated covariate → θ = 0, effect unchanged") {
    import spark.implicits._
    // x constant: var(x) = 0 → guarded θ = 0, cuped ≡ raw
    val df = Seq(
      ("A", 5000000L, 1000000L), ("A", 7000000L, 1000000L),
      ("B", 4000000L, 1000000L), ("B", 6000000L, 1000000L))
      .toDF("arm", "y", "x")
    val r = Cuped.effect(df, "arm", "y", "x", "A", "B").head()
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 0.0)
  }

  test("cuped: deterministic across partitionings (exact decimal sums)") {
    import spark.implicits._
    val rows = (1L to 400L).map { i =>
      (if (i % 2 == 0) "A" else "B", i * 31 % 997 * 1000L,
        i * 17 % 991 * 1000L)
    }
    val df = rows.toDF("arm", "y", "x")
    val a = Cuped.effect(df, "arm", "y", "x", "A", "B").head()
    val b = Cuped.effect(df.repartition(13), "arm", "y", "x", "A", "B").head()
    assert(a == b)
  }
}
