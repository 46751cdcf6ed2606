package graft.sources

import graft.SparkSpec

/** The events loader's TIMESTAMP(NANOS) handling, pinned against a
  * committed NANOS fixture (the driver's current testdata stores MICROS,
  * so without the fixture this path would be dead until the encoding
  * flips back — it has varied across testdata generations).
  */
class TablesSpec extends SparkSpec {

  private val fixtureDir = "src/test/resources/nanos_events"
  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  test("events: NANOS file + nanosAsLong reads ts_ns as raw nanosecond longs") {
    val rows = Tables.events(spark, fixtureDir)
      .select("event_id", "ts_ns").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(
      1L -> 1704103500000000000L,
      2L -> 1704106500000000000L,
      3L -> 1704110100000000000L))
  }

  test("events: NANOS file WITHOUT nanosAsLong fails up front with the actionable hint") {
    // the footer check must catch this before Spark does — regardless of
    // whether this Spark version would throw at schema read or at scan
    // execution (the reason the old message-text catch was replaced)
    spark.conf.set(NanosConf, "false")
    try {
      val e = intercept[IllegalArgumentException](Tables.events(spark, fixtureDir))
      assert(e.getMessage.contains("nanosAsLong"), e.getMessage)
    } finally spark.conf.set(NanosConf, "true")
  }

  test("events: MICROS testdata reads the same ts_ns regardless of the nanos conf") {
    val withConf = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "ts_ns").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set(NanosConf, "false")
    try {
      val withoutConf = Tables.events(spark, sf("sf0.001"))
        .select("event_id", "ts_ns").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(withConf == withoutConf)
      assert(withConf.nonEmpty)
    } finally spark.conf.set(NanosConf, "true")
  }
}
