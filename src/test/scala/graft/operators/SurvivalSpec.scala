package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("logRank: hand-computed two-sample statistic with censoring") {
    // g1: events at t=1 and t=2; g0: event at t=1, censored at t=3
    //  t=1: n=4, n1=2, d=2 → E1=1,   O−E=0,   V=1/3
    //  t=2: n=2, n1=1, d=1 → E1=0.5, O−E=0.5, V=1/4
    //  t=3: d=0 → not an event time
    val df = Seq((1L, 1L, 1L), (1L, 2L, 1L), (0L, 1L, 1L), (0L, 3L, 0L))
      .toDF("g", "t", "e")
    val out = Survival.logRank(df, "g", "t", "e").head()
    assert(out.getLong(0) == 2L)            // two event times
    assert(out.getLong(1) == 2L)            // both g1 ends were events
    assert(out.getDouble(2) == 0.5)         // Σ(O−E)
    assert(out.getDouble(3) == 0.5833)      // ΣV = 1/3 + 1/4
    assert(out.getDouble(4) == 0.4286)      // 0.25 / 0.58333…
  }

  test("logRank: identical groups give a null-ish statistic") {
    // perfectly mirrored lifetimes → every O−E term is 0
    val df = (1L to 6L).flatMap(t => Seq((0L, t, 1L), (1L, t, 1L)))
      .toDF("g", "t", "e")
    val out = Survival.logRank(df, "g", "t", "e").head()
    assert(out.getDouble(2) == 0.0 && out.getDouble(4) == 0.0)
  }

  test("logRank: partition-order invariant; all-censored gives null chi2") {
    val df = Seq((1L, 1L, 1L), (1L, 2L, 1L), (0L, 1L, 1L), (0L, 3L, 0L))
      .toDF("g", "t", "e")
    val a = Survival.logRank(df.repartition(5), "g", "t", "e").head()
    val b = Survival.logRank(df.orderBy(col("t").desc), "g", "t", "e").head()
    assert(a == b)
    val cens = Seq((0L, 1L, 0L), (1L, 2L, 0L)).toDF("g", "t", "e")
    val out = Survival.logRank(cens, "g", "t", "e").head()
    assert(out.getLong(0) == 0L && out.isNullAt(4))
  }
}
