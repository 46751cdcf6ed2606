package graft.metrics

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CompetitionScoreAggregatorSpec extends SparkSpec {

  test("one-pass aggregator equals the two-aggregate expression form") {
    import spark.implicits._
    val data = Seq((1.0, 1.1), (2.0, 2.0), (3.0, 2.5), (10.0, 10.2))
    val onePass = data.toDS()
      .select(CompetitionScoreAggregator.column(0.05)).head()
    val twoAgg = data.toDF("t", "p")
      .agg(Scores.competitionScore(col("t"), col("p"), 0.05)).head().getDouble(0)
    assert(math.abs(onePass - twoAgg) < 1e-12)
  }

  test("aggregator merges across partitions") {
    import spark.implicits._
    val data = (1 to 1000).map(i => (i.toDouble, i.toDouble * (if (i % 10 == 0) 1.2 else 1.0)))
    val scattered = spark.createDataset(data).repartition(16)
      .select(CompetitionScoreAggregator.column(0.05)).head()
    val single = spark.createDataset(data).coalesce(1)
      .select(CompetitionScoreAggregator.column(0.05)).head()
    assert(math.abs(scattered - single) < 1e-9)
    // 90% within threshold, mape = 0.1·(0.2/1.2)
    val expected = 0.2 * (1 - 0.1 * (0.2 / 1.2)) + 0.8 * 0.9
    assert(math.abs(single - expected) < 1e-9)
  }
}
