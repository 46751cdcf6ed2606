package graft.car

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic 附件1/2/4 facsimiles per FIXTURES.md §1-3: tab-separated
  * lines with the exact positional layout, covering null columns and all
  * anonymousFeature11/12/13 formats.
  */
object CarFixtures {

  /** One 36-field train line. Nullable fields empty when `withNulls`. */
  def trainLine(carid: Long, price: Double, withNulls: Boolean = false): String = {
    val f: Seq[String] = Seq(
      carid.toString,            // carid
      "2021-03-15",              // tradeTime
      "12", "345", "6789",       // brand serial model
      (3.2 + carid * 0.7).toString, // mileage (万km) — varies per row
      (carid % 7).toString,       // color
      "77",                       // cityId
      if (withNulls) "" else "5", // carCode (nullable → -1)
      (carid % 3).toString + ".0", "5.0", // transferCount seatings
      "2016-05-01", "2016-06-01",// registerDate licenseDate
      if (withNulls) "" else "0", // country
      if (withNulls) "" else "1", // maketype
      if (withNulls) "" else "2016", // modelyear
      (1.0 + (carid % 4) * 0.4).toString, // displacement
      if (withNulls) "" else "1.0",  // gearbox (null → 0 as-coded)
      (carid % 2).toString,       // oiltype
      (9.0 + carid * 0.5).toString, // newprice — varies per row
      if (withNulls) "" else "3",   // anon1 (null → -1)
      "4", "5",                  // anon2 anon3 (never filled)
      if (withNulls) "" else "6",   // anon4 (null → -1)
      "7", "8",                  // anon5 anon6
      if (withNulls) "" else "2018-01-02", // anon7 (null → 2000-01-01)
      if (withNulls) "" else "9",   // anon8
      if (withNulls) "" else "10",  // anon9
      if (withNulls) "" else "11",  // anon10
      if (withNulls) "" else "1+2,4+2", // anon11 (null → "-1")
      if (withNulls) "" else "4878*1925*1734", // anon12 (null → 0*0*0)
      if (withNulls) "" else "201710", // anon13 (null → "200001")
      "12",                      // anon14
      if (withNulls) "" else "2017-10-01", // anon15 (null → 2000-01-01)
      price.toString)            // price
    f.mkString("\t")
  }

  /** One 附件4 line; sold cars have 6 fields, unsold only 5. */
  def txnLine(carid: Long, sold: Boolean, json: String = "{}"): String = {
    val base = Seq(carid.toString, "2021-04-01", "9.5", json, "2021-05-01")
    (if (sold) base :+ "2021-05-01" else base).mkString("\t")
  }

  def writeTsv(lines: Seq[String]): String = {
    val f = java.nio.file.Files.createTempFile("graft_fixture", ".txt")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  def trainDf(spark: SparkSession, n: Int = 20): DataFrame = {
    val lines = (1 to n).map(i =>
      trainLine(i.toLong, 5.0 + i * 0.25, withNulls = i % 5 == 0))
    CarSources.readCarTrain(spark, writeTsv(lines))
  }

  def txnDf(spark: SparkSession): DataFrame = {
    val lines = Seq(
      txnLine(1, sold = true),
      txnLine(2, sold = true, json = """{"2021-04-05": "23"}"""),
      txnLine(3, sold = true, json = """{"2021-04-05": "23", "2021-04-20": "21.5"}"""),
      txnLine(4, sold = false),
      txnLine(9999, sold = true)) // no match in car_train
    CarSources.readStoreTxn(spark, writeTsv(lines))
  }
}
