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
}
