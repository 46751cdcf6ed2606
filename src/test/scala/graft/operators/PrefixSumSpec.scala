package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {

  test("withRunningTotal ≡ window cumsum, across many input partitions") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i * 7 % 501, i % 13 - 6))
      .toDF("k", "v").withColumn("v", col("v").cast("long"))
      .repartition(16) // offsets must compose across partitions
    val got = PrefixSum.withRunningTotal(df, "v", "cum", "k")
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("withRunningTotal: nulls contribute 0 and the frame is preserved") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)))
      .toDF("k", "v")
    val got = PrefixSum.withRunningTotal(df, "v", "cum", "k")
      .orderBy(col("k")).collect().map(_.getLong(2)).toSeq
    assert(got == Seq(10L, 10L, 15L), got)
  }

  test("withRunningTotal: deterministic under re-runs and repartitioning") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i / 10, i)).toDF("k", "v")
    val a = PrefixSum.withRunningTotal(df.repartition(7), "v", "cum", "k", "v")
    val b = PrefixSum.withRunningTotal(df.repartition(3), "v", "cum", "k", "v")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("withRunningTotal rejects a non-bigint value column") {
    import spark.implicits._
    val df = Seq((1L, 1.5)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotal(df, "v", "cum", "k")
    }
  }
}
