package graft.car

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1/J2 — the 问题二 joins (reference utils.py:233-290). The reference
  * runs an O(N·M) per-row boolean-mask loop; these are declarative inner
  * equi-joins — Catalyst broadcasts the store-transaction side when it is
  * small and falls back to shuffle-hash/sort-merge when it is not.
  */
object CarJoins {

  /** J1 — `filter_other_dataset` (reference utils.py:233-262): car
    * attributes joined with store transactions, plus the 0/1 deal label
    * from the withdrawDate null test. The price column is dropped from the
    * car side first, exactly like the reference.
    */
  def carWithTransactions(carTrain: DataFrame, storeTxn: DataFrame): DataFrame =
    carTrain.drop("price")
      .join(storeTxn, Seq("carid"), "inner")
      .withColumn("dealResult", CarFeatures.dealLabel(col("withdrawDate")))

  /** J2 — `create_dataset` (reference utils.py:263-290): sold cars only,
    * keeping the transaction columns needed for final-price derivation.
    */
  def soldCars(carTrain: DataFrame, storeTxn: DataFrame): DataFrame =
    carTrain.drop("price")
      .join(storeTxn.where(col("withdrawDate").isNotNull), Seq("carid"), "inner")
}
