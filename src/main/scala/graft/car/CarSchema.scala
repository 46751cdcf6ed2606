package graft.car

import org.apache.spark.sql.types._

/** Schemas + column-role config for the reference's data model
  * (SURVEY.md §1; names per reference headers.py:1-76, roles per
  * reference data/property_zh.json).
  *
  * Headers are NOT in the data files — a fixed name list is bound
  * positionally, exactly like the reference zips its header list onto
  * positional columns (reference utils.py:37,47,66). English aliases are
  * canonical here; the mapping to the reference's Chinese names is 1:1 by
  * position (FIXTURES.md §1).
  */
object CarSchema {

  /** 附件1 (train) — 35 features + price (reference headers.py:1-58). */
  val carTrainColumns: Seq[String] = Seq(
    "carid", "tradeTime", "brand", "serial", "model", "mileage", "color",
    "cityId", "carCode", "transferCount", "seatings", "registerDate",
    "licenseDate", "country", "maketype", "modelyear", "displacement",
    "gearbox", "oiltype", "newprice") ++
    (1 to 15).map(i => s"anonymousFeature$i") :+ "price"

  /** 附件2 (validation) — same minus price (reference headers.py:47, utils.py:47). */
  val carTestColumns: Seq[String] = carTrainColumns.dropRight(1)

  /** 附件4 (store transactions) — reference headers.py:59-76. */
  val storeTxnColumns: Seq[String] = Seq(
    "carid", "pushDate", "pushPrice", "updatePriceTimeJson", "pullDate",
    "withdrawDate")

  /** Physical types. Date-ish columns are read as strings and parsed by
    * CarFeatures (the reference parses dates by string-split, not a date
    * library — reference data.py:19); discrete ids are longs; continuous
    * are doubles. anonymousFeature11/12/13 are free-form strings
    * (FIXTURES.md §1).
    */
  private val typeOf: Map[String, DataType] = Map(
    "carid" -> LongType,
    "tradeTime" -> StringType, "registerDate" -> StringType,
    "licenseDate" -> StringType,
    "brand" -> LongType, "serial" -> LongType, "model" -> LongType,
    "color" -> LongType, "cityId" -> LongType, "carCode" -> LongType,
    "country" -> LongType, "maketype" -> LongType, "modelyear" -> LongType,
    "oiltype" -> LongType,
    "mileage" -> DoubleType, "transferCount" -> DoubleType,
    "seatings" -> DoubleType, "displacement" -> DoubleType,
    "gearbox" -> DoubleType, "newprice" -> DoubleType, "price" -> DoubleType,
    "anonymousFeature7" -> StringType, "anonymousFeature11" -> StringType,
    "anonymousFeature12" -> StringType, "anonymousFeature13" -> StringType,
    "anonymousFeature15" -> StringType,
    "pushDate" -> StringType, "pushPrice" -> DoubleType,
    "updatePriceTimeJson" -> StringType, "pullDate" -> StringType,
    "withdrawDate" -> StringType)

  private def schemaFor(cols: Seq[String]): StructType =
    StructType(cols.map(c => StructField(c, typeOf.getOrElse(c, LongType), nullable = true)))

  val carTrainSchema: StructType = schemaFor(carTrainColumns)
  val carTestSchema: StructType = schemaFor(carTestColumns)
  val storeTxnSchema: StructType = schemaFor(storeTxnColumns)

  /** Column roles (reference data/property_zh.json: 22 discrete /
    * 6 continue / 6 time; gearbox & transferCount & seatings are
    * *continuous* by the reference's choice — quirk preserved).
    */
  val discreteColumns: Seq[String] = Seq(
    "brand", "serial", "model", "color", "cityId", "carCode", "country",
    "maketype", "modelyear", "oiltype",
    "anonymousFeature1", "anonymousFeature2", "anonymousFeature3",
    "anonymousFeature4", "anonymousFeature5", "anonymousFeature6",
    "anonymousFeature8", "anonymousFeature9", "anonymousFeature10",
    "anonymousFeature11", "anonymousFeature12", "anonymousFeature14")

  val continuousColumns: Seq[String] = Seq(
    "mileage", "transferCount", "seatings", "displacement", "gearbox",
    "newprice")

  val timeColumns: Seq[String] = Seq(
    "tradeTime", "registerDate", "licenseDate",
    "anonymousFeature7", "anonymousFeature13", "anonymousFeature15")
}
