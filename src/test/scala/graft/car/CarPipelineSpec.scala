package graft.car

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sources S1/S2, Repair P5 (as-coded X6), Features F1-F7, Vocab A1/J4,
  * Joins J1/J2, Normalize A2-A4, Splits R1/R2 — against hand-computed
  * fixtures (FIXTURES.md §1-3).
  */
class CarPipelineSpec extends SparkSpec {

  test("S1: headerless TSV scan binds the positional 36-column schema") {
    val df = CarFixtures.trainDf(spark, 10)
    assert(df.columns.toSeq == CarSchema.carTrainColumns)
    assert(df.count() == 10)
    val r = df.where(col("carid") === 1).head()
    assert(r.getAs[Long]("brand") == 12L)
    assert(r.getAs[Double]("price") == 5.25)
    assert(r.getAs[String]("anonymousFeature12") == "4878*1925*1734")
  }

  test("S2: ragged 5-field lines read with null withdrawDate (unsold)") {
    val txn = CarFixtures.txnDf(spark)
    assert(txn.count() == 5)
    assert(txn.where(col("withdrawDate").isNull).select("carid").head().getLong(0) == 4L)
    assert(txn.where(col("withdrawDate").isNotNull).count() == 4)
  }

  test("P5: null repair applies the AS-CODED sentinel map (quirk X6)") {
    val repaired = Repair.repair(CarFixtures.trainDf(spark, 10))
    val r = repaired.where(col("carid") === 5).head() // the withNulls row
    assert(r.getAs[Long]("carCode") == -1L)
    assert(r.getAs[Long]("country") == -1L)
    assert(r.getAs[Double]("gearbox") == 0.0) // 0 as-coded, not the commented -1
    assert(r.getAs[Long]("anonymousFeature10") == -1L)
    assert(r.getAs[String]("anonymousFeature11") == "-1")
    assert(r.getAs[String]("anonymousFeature12") == "0*0*0")
    assert(r.getAs[String]("anonymousFeature13") == "200001") // not 190001
    assert(r.getAs[String]("anonymousFeature15") == "2000-01-01") // not 1900
    // anon2/3 are never filled — still present with original values
    assert(r.getAs[Long]("anonymousFeature2") == 4L)
  }

  test("F1: L*W*H parse derives the 6 features with the reference's x4 surface") {
    val df = CarFeatures.withDimensionFeatures(
      Repair.repair(CarFixtures.trainDf(spark, 4)))
    val r = df.where(col("carid") === 1).head()
    assert(r.getAs[Double]("carLength") == 4878.0)
    assert(r.getAs[Double]("carWidth") == 1925.0)
    assert(r.getAs[Double]("carHeight") == 1734.0)
    assert(r.getAs[Double]("carVolume") == 4878.0 * 1925.0 * 1734.0)
    assert(r.getAs[Double]("carPerimeter") == 4 * (4878.0 + 1925.0 + 1734.0))
    assert(r.getAs[Double]("carSurface") ==
      4 * (4878.0 * 1925.0 + 4878.0 * 1734.0 + 1925.0 * 1734.0))
  }

  test("F2: final price = last JSON map value, falling back to pushPrice") {
    val txn = CarFeatures.withFinalPrice(CarFixtures.txnDf(spark))
    val byId = txn.select("carid", "dealPrice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(1L) == 9.5)   // empty map → pushPrice
    assert(byId(2L) == 23.0)  // single entry
    assert(byId(3L) == 21.5)  // LAST entry wins
  }

  test("F3/F4: date components and yyyyMM parse") {
    val df = CarFeatures.withDateComponents(
      CarFixtures.trainDf(spark, 2), "tradeTime", "trade")
    val r = df.where(col("carid") === 1).head()
    assert(r.getAs[Int]("tradeYearIdx") == 21)
    assert(r.getAs[Int]("tradeMonthIdx") == 2)
    assert(r.getAs[Int]("tradeDayIdx") == 14)
    val ym = spark.range(1).select(
      CarFeatures.yyyymmToDate(lit("201710")).cast("string").as("d")).head().getString(0)
    assert(ym == "2017-10-01")
  }

  test("A1/J4: vocabulary build + dictionary-probe encode") {
    val df = Repair.repair(CarFixtures.trainDf(spark, 10))
    val vocab = Vocab.build(Seq(df), Seq("brand", "color", "anonymousFeature11"))
    // ids dense, 0-based, deterministic
    val ids = vocab.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until ids.length).toSeq)
    val encoded = Vocab.encode(df, vocab, Seq("brand", "color"))
    assert(encoded.where(col("brandId").isNull).count() == 0)
    // same value → same id everywhere
    assert(encoded.select("brandId").distinct().count() == 1)
  }

  test("S4: vocabulary JSON round-trip (reference Dictionary shape)") {
    val df = Repair.repair(CarFixtures.trainDf(spark, 10))
    val vocab = Vocab.build(Seq(df), Seq("brand", "color", "anonymousFeature11"))
    val path = java.nio.file.Files.createTempDirectory("graft_vocab")
      .resolve("dictionary.json").toString
    Vocab.saveJson(vocab, path)
    val back = Vocab.loadJson(spark, path)
    assert(back.columns.toSeq == Seq("col_name", "value", "id"))
    assert(vocab.exceptAll(back).count() == 0 && back.exceptAll(vocab).count() == 0)
    // the artifact really is the reference's shape
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    assert(txt.contains("\"ind2token\"") && txt.contains("\"token2ind\""))
  }

  test("S7: plain-text list sink writes one item per line") {
    import spark.implicits._
    val items = Seq("alpha", "beta", "gamma:with:colons").toDF("item")
    val dir = java.nio.file.Files.createTempDirectory("graft_txt").toString + "/list"
    CarSources.writeTextList(items, dir)
    val back = spark.read.text(dir).collect().map(_.getString(0)).toSet
    assert(back == Set("alpha", "beta", "gamma:with:colons"))
  }

  test("J1/J2: car ⋈ transactions with deal label; sold-only variant") {
    val car = Repair.repair(CarFixtures.trainDf(spark, 10))
    val txn = CarFixtures.txnDf(spark)
    val j1 = CarJoins.carWithTransactions(car, txn)
    assert(j1.count() == 4) // carids 1-4 match; 9999 doesn't
    assert(!j1.columns.contains("price"))
    assert(j1.where(col("carid") === 4).head().getAs[Int]("dealResult") == 0)
    assert(j1.where(col("dealResult") === 1).count() == 3)
    val j2 = CarJoins.soldCars(car, txn)
    assert(j2.count() == 3)
  }

  test("A2: z-score uses sample stddev (pandas ddof=1) and round-trips") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val (norm, stats) = Normalize.fitTransform(df, Seq("x"), Normalize.ZScore)
    // stddev_samp([1,2,3,4]) = sqrt(5/3)
    assert(math.abs(stats.scale("x") - math.sqrt(5.0 / 3.0)) < 1e-12)
    assert(math.abs(stats.offset("x") - 2.5) < 1e-12)
    val back = stats.denormalize(norm, Seq("x"))
      .select("x").collect().map(_.getDouble(0)).sorted
    assert(back.zip(Seq(1.0, 2.0, 3.0, 4.0)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("A3: min-max normalization maps to [0,1]") {
    import spark.implicits._
    val df = Seq(10.0, 20.0, 30.0).toDF("x")
    val (norm, _) = Normalize.fitTransform(df, Seq("x"), Normalize.MinMax)
    val vals = norm.select("x").collect().map(_.getDouble(0)).sorted
    assert(vals.toSeq == Seq(0.0, 0.5, 1.0))
  }

  test("R1/R2: splits partition the data; X1 overlap is reproducible") {
    val df = spark.range(100).toDF("id")
    val (tr, dv) = Splits.shuffledSplit(df, 0.7, seed = 7)
    assert(tr.count() + dv.count() == 100)
    assert(tr.intersect(dv).count() == 0)
    val (tr2, dv2) = Splits.sequentialSplit(df, "id", 0.7)
    assert(tr2.count() + dv2.count() == 100)
    val (tr3, dv3) = Splits.sequentialSplit(df, "id", 0.7, overlapBoundary = true)
    assert(tr3.intersect(dv3).count() == 1) // the reference's double-counted row
  }

  test("R1 md5-gate: hashSplit partitions the input even with null keys") {
    import org.apache.spark.sql.functions.{col, when}
    val df = spark.range(200).toDF("id")
      // every 10th key null — md5(null) is null, which satisfies NEITHER
      // gate; the coalesced sentinel must keep those rows in the split
      .select(when(col("id") % 10 =!= 0, col("id")).as("key"), col("id"))
    val (tr, dv) = Splits.hashSplit(df, col("key"), 0.7)
    assert(tr.count() + dv.count() == 200, "null-key rows fell out of the split")
    assert(tr.intersect(dv).count() == 0)
    // all null-key rows hash the same sentinel → they travel together
    val nullSides = Seq(tr, dv).map(_.where(col("key").isNull).count())
    assert(nullSides.contains(0L) && nullSides.sum == 20)
    // pure function of the key: re-partitioned input yields the same halves
    val (tr2, _) = Splits.hashSplit(df.repartition(7), col("key"), 0.7)
    assert(tr2.select("id").exceptAll(tr.select("id")).count() == 0)
  }
}
