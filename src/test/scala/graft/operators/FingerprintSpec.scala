package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def data = (0 until 500)
    .map(i => (i.toLong, s"s${i % 7}", (i % 3).toString)).toDF("k", "a", "b")

  private val cols = Seq("k", "a", "b")

  private def fp(df: org.apache.spark.sql.DataFrame): (Long, BigDecimal) = {
    val r = Fingerprint.of(df, cols).head()
    (r.getLong(0), BigDecimal(r.getDecimal(1)))
  }

  test("invariant under row order and partitioning; sensitive to any row change") {
    val base = fp(data)
    assert(fp(data.orderBy(col("a"), col("k").desc)) == base)
    assert(fp(data.repartition(17)) == base)
    // one changed value flips the fingerprint but not the count
    val mutated = data.withColumn("a",
      when(col("k") === 250L, lit("sX")).otherwise(col("a")))
    val m = fp(mutated)
    assert(m._1 == base._1 && m._2 != base._2)
    // a dropped row changes both
    val dropped = fp(data.where(col("k") =!= 0L))
    assert(dropped._1 == base._1 - 1 && dropped._2 != base._2)
  }

  test("multiset semantics: duplicated rows shift the fingerprint") {
    val doubled = fp(data.unionAll(data.limit(1)))
    assert(doubled._2 != fp(data)._2)
  }

  test("decimal accumulation is exact past int64 headroom (sum > 2^63)") {
    // 20k rows of ~2^60-magnitude hashes sum to ~1.2e19 > Long.MaxValue
    // (9.2e18): an int64 accumulator would wrap; the DECIMAL(38,0)
    // cast before sum must reproduce the BigInt reference exactly.
    val wide = spark.range(20000).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("a"), lit("z").as("b"))
    val hashes = wide
      .select(Fingerprint.rowHash(cols.map(col)).as("h"))
      .as[Long].collect()
    val reference = hashes.map(BigInt(_)).sum
    assert(reference > BigInt(Long.MaxValue),
      s"fixture must exceed int64 headroom, got $reference")
    val got = fp(wide)
    assert(got._1 == 20000L)
    assert(got._2 == BigDecimal(reference))
  }

  test("null columns fingerprint distinctly from empty and absent values") {
    val withNull = Seq((1L, null.asInstanceOf[String], "x")).toDF("k", "a", "b")
    val withEmpty = Seq((1L, "", "x")).toDF("k", "a", "b")
    assert(fp(withNull)._2 != fp(withEmpty)._2)
  }
}
