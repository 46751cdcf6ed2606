package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {

  private def rows(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map { i =>
      (s"k${i % 7}", (i % 3).toLong, i * 1.25 - 40)
    }.toDF("k1", "k2", "v")
  }

  private val keys = Seq("k1", "k2")

  private def canon(df: DataFrame): Seq[String] =
    df.select(col("k1"), col("k2"), col("n"), col("sum").cast("string"),
        col("vmin").cast("string"), col("vmax").cast("string"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("merge(fit(base), fit(delta)) ≡ fit(base ∪ delta) at several cuts") {
    val all = rows(0, 500)
    val full = canon(IncrementalAgg.fit(all, keys, "v"))
    for (cut <- Seq(1, 100, 499)) {
      val merged = IncrementalAgg.applyDelta(
        IncrementalAgg.fit(rows(0, cut), keys, "v"), rows(cut, 500), keys, "v")
      assert(canon(merged) == full, s"cut=$cut")
    }
  }

  test("merge is commutative and handles disjoint key sets") {
    import spark.implicits._
    val a = IncrementalAgg.fit(rows(0, 100), keys, "v")
    // disjoint keys: different k1 universe entirely
    val bRows = (0 until 50).map(i => (s"x$i", 9L, i.toDouble)).toDF("k1", "k2", "v")
    val b = IncrementalAgg.fit(bRows, keys, "v")
    assert(canon(IncrementalAgg.merge(a, b, keys)) ==
      canon(IncrementalAgg.merge(b, a, keys)))
    // disjoint merge preserves both sides untouched
    val m = IncrementalAgg.merge(a, b, keys)
    assert(m.count() == a.count() + b.count())
    assert(canon(m).toSet == (canon(a).toSet ++ canon(b).toSet))
  }

  test("repeated delta application ≡ one-shot fit (associativity over batches)") {
    var state = IncrementalAgg.fit(rows(0, 100), keys, "v")
    for (c <- Seq((100, 230), (230, 360), (360, 500)))
      state = IncrementalAgg.applyDelta(state, rows(c._1, c._2), keys, "v")
    assert(canon(state) == canon(IncrementalAgg.fit(rows(0, 500), keys, "v")))
  }

  test("bucketed-by-key state: the merge join reads state with no exchange on its side") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.FileSourceScanExec
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // single-column key so the bucket spec covers the full join key
      val state = IncrementalAgg.fit(rows(0, 300), Seq("k1"), "v")
      Layout.writeBucketed(state, "agg_state_bkt", "k1", 4,
        sortCols = Seq("k1"))
      val merged = IncrementalAgg.applyDelta(spark.table("agg_state_bkt"),
        rows(300, 400), Seq("k1"), "v")
      val plan = merged.queryExecution.executedPlan
      val badExchange = plan.collectWithSubqueries {
        case e: ShuffleExchangeExec if e.child.collectWithSubqueries {
          case f: FileSourceScanExec => f
        }.nonEmpty => e
      }
      assert(badExchange.isEmpty,
        s"bucketed state still re-shuffles before the merge join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS agg_state_bkt")
    }
  }

  test("report derives mean from the exact sum/count pair") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0), ("a", 1L, 2.0)).toDF("k1", "k2", "v")
    val r = IncrementalAgg.report(IncrementalAgg.fit(df, keys, "v"), keys).head()
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("sum_value") == 3.0)
    assert(r.getAs[Double]("mean_value") == 1.5)
    assert(r.getAs[Double]("min_value") == 1.0)
    assert(r.getAs[Double]("max_value") == 2.0)
  }
}
