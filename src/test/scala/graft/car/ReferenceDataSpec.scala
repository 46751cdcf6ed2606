package graft.car

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden ingestion tests against the REAL reference data files (附件2 /
  * 附件4, read-only at /root/reference/data) — the readers must bind the
  * positional schemas on actual competition data, not just fixtures.
  * Skipped silently when the reference tree is absent.
  */
class ReferenceDataSpec extends SparkSpec {

  private val testPath = "/root/reference/data/附件2：估价验证数据.txt"
  private val txnPath = "/root/reference/data/附件4：门店交易训练数据.txt"
  private def exists(p: String) = new java.io.File(p).isFile

  test("附件2: 5000 rows × 35 positional columns bind and type correctly") {
    assume(exists(testPath))
    val df = CarSources.readCarTest(spark, testPath)
    assert(df.count() == 5000)
    assert(df.columns.length == 35)
    assert(df.where(col("carid").isNull).count() == 0)
    // date strings parse for every non-null tradeTime
    assert(df.where(col("tradeTime").isNotNull &&
      to_date(col("tradeTime")).isNull).count() == 0)
    // anon12 parses as L*W*H wherever present
    val dims = CarFeatures.withDimensionFeatures(Repair.repair(df))
    assert(dims.where(col("carVolume").isNull).count() == 0)
    assert(dims.agg(min("carLength")).head().getDouble(0) >= 0)
  }

  test("附件4: 10000 transaction rows; empty withdrawDate ⇒ unsold label 0") {
    assume(exists(txnPath))
    val txn = CarSources.readStoreTxn(spark, txnPath)
    assert(txn.count() == 10000)
    val labeled = txn.withColumn("deal", CarFeatures.dealLabel(col("withdrawDate")))
    val sold = labeled.where(col("deal") === 1).count()
    assert(sold > 0 && sold < 10000) // both classes present in real data
    // F2 on real JSON: never null, falls back to pushPrice
    val priced = CarFeatures.withFinalPrice(txn)
    assert(priced.where(col("dealPrice").isNull && col("pushPrice").isNotNull).count() == 0)
  }

  test("J1 on real transactions: join count matches the semi-join ground truth") {
    assume(exists(txnPath))
    val txn = CarSources.readStoreTxn(spark, txnPath)
    // car side: facsimile keyed by half the real transaction ids (附件4
    // references the repo-stripped 附件1, so no real car table overlaps it)
    val ids = txn.select("carid").distinct().limit(200).collect().map(_.getLong(0))
    val half = ids.take(100)
    val car = Repair.repair(CarSources.readCarTrain(spark,
      CarFixtures.writeTsv(half.map(id => CarFixtures.trainLine(id, 9.9)).toSeq)))
    val joined = CarJoins.carWithTransactions(car, txn)
    val expected = txn.join(car.select("carid"), Seq("carid")).count()
    assert(joined.count() == expected)
    assert(expected >= 100) // at least one txn per matched car
  }
}
