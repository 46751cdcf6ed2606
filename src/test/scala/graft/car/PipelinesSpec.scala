package graft.car

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.metrics.Scores

/** End-to-end 问题一 capability: TSV → repair → features → vocab encode →
  * normalize → train → predict → denormalize → metrics → submission
  * (the reference's first.py lifecycle, SURVEY.md §3.2), with MLlib
  * standing in for the neural nets.
  */
class PipelinesSpec extends SparkSpec {

  test("price pipeline end-to-end on the fixture") {
    val raw = Repair.repair(CarFixtures.trainDf(spark, 40))
    val feat0 = CarFeatures.withDimensionFeatures(raw)
    val feat1 = CarFeatures.withDateComponents(feat0, "tradeTime", "trade")
    val vocab = Vocab.build(Seq(feat1), Seq("brand", "color", "oiltype"))
    val encoded = Vocab.encode(feat1, vocab, Seq("brand", "color", "oiltype"))
    val (normalized, stats) = Normalize.fitTransform(
      encoded, Seq("mileage", "newprice"), Normalize.ZScore)

    val model = Pipelines.priceRegression(normalized, useGbt = false)
    val pred = model.transform(normalized)
    assert(pred.columns.contains("prediction"))
    assert(pred.where(col("prediction").isNull || isnan(col("prediction"))).count() == 0)

    val report = Scores.regressionReport(pred, "price", "prediction").head()
    assert(report.getAs[Long]("n") == 40)
    assert(!report.getAs[Double]("mape").isNaN)

    // submission sink (S6): carid \t price, readable back
    val out = java.nio.file.Files.createTempDirectory("graft_sub").toString
    CarSources.writeSubmission(
      pred.select(col("carid"), col("prediction").as("price")), out)
    val back = spark.read.option("sep", "\t").csv(out)
    assert(back.count() == 40)
  }

  test("deal classifier + multi-head date model train and predict") {
    val car = Repair.repair(CarFixtures.trainDf(spark, 40))
    val txn = CarFixtures.txnDf(spark)
    val joined = CarJoins.carWithTransactions(car, txn)
    // too few matched rows for a real fit — replicate to a trainable size
    val train0 = joined.withColumn("rep", explode(array((0 until 10).map(lit): _*))).drop("rep")
    val train1 = CarFeatures.withDimensionFeatures(train0)
    val train = CarFeatures.withDateComponents(train1, "tradeTime", "trade")
    val clf = Pipelines.dealClassifier(train)
    val scored = clf.transform(train)
    assert(scored.columns.contains("prediction"))
    assert(scored.select("prediction").distinct().count() <= 2)

    val sold0 = CarFeatures.withFinalPrice(CarJoins.soldCars(car, txn))
      .withColumn("rep", explode(array((0 until 10).map(lit): _*))).drop("rep")
    val sold1 = CarFeatures.withDateComponents(
      CarFeatures.withDimensionFeatures(sold0), "withdrawDate", "deal")
    val (ym, mm, dm, pm) = Pipelines.dealDateAndPrice(sold1)
    val p = pm.transform(dm.transform(mm.transform(ym.transform(sold1))))
    assert(Seq("dealYearPred", "dealMonthPred", "dealDayPred", "dealPricePred")
      .forall(p.columns.contains))
  }
}
