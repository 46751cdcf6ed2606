package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltingSpec extends SparkSpec {

  test("salted stats equal the direct groupBy on a skewed key") {
    import spark.implicits._
    // one hot key (0) with 50k rows, 9 cold keys with 100 each
    val hot = spark.range(50000L).select(lit(0L).as("k"), (col("id") % 7).as("v"))
    val cold = spark.range(900L).select((col("id") % 9 + 1).as("k"), col("id").as("v"))
    val df = hot.unionAll(cold)
    val direct = df.groupBy(col("k"))
      .agg(sum(col("v")).as("sum_value"), count(lit(1)).as("n"),
        (sum(col("v")) / count(lit(1))).as("avg_value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Salting.saltedStats(df, Seq("k"), "v", salts = 16,
      saltBy = Seq(col("v")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("deterministic salt spreads a hot key over all sub-keys") {
    import spark.implicits._
    val df = spark.range(10000L).select(lit(0L).as("k"), col("id").as("v"))
    val spread = df.select(Salting.saltCol(16, col("v")).as("s"))
      .groupBy("s").count().collect()
    assert(spread.length == 16) // every salt bucket hit
    // roughly uniform: no bucket more than 2x the mean
    assert(spread.map(_.getLong(1)).max < 2 * 10000 / 16)
  }

  test("joinSkewReport flags exactly the keys whose pair product clears the bar") {
    import spark.implicits._
    // key counts — a: 3×4=12, b: 2×1=2, c: 5×0 (right-absent), d: 1×10=10
    val left = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq.fill(5)("c") ++
      Seq("d")).zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "x")
    val right = (Seq.fill(4)("a") ++ Seq("b") ++ Seq.fill(10)("d"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "y")
    val got = Salting.joinSkewReport(left, right, Seq("k"), minPairs = 10L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == Set("a", "d")) // b under bar; c absent from right
    assert(got("a") == ((3L, 4L, 12L)))
    assert(got("d") == ((1L, 10L, 10L)))
    // the report's product equals the true join output size per key
    val joined = left.join(right, "k").groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (k, (_, _, p)) => assert(joined(k) == p) }
  }
}
