package graft.car

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Readers/writers for the reference's file formats (SURVEY.md §2.1).
  *
  * S1 — headerless tab-separated scan with a positional schema
  *      (reference utils.py:30-49).
  * S2 — "ragged" TSV where 5-field lines mean an unsold car: the CSV
  *      reader natively yields null for the trailing missing field, which
  *      is exactly the reference's pad-with-empty semantics
  *      (reference utils.py:50-68); lines with any other arity are
  *      surfaced via FAILFAST instead of a silent drop.
  * S6 — tab-separated submission sink (reference evaluate.py:86-95).
  *
  * Intermediates are parquet, not xlsx (S3): a lazily-planned engine does
  * not need the reference's materialize-per-stage checkpoints.
  */
object CarSources {

  private def tsv(spark: SparkSession, path: String, schema: StructType,
      names: Seq[String]): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)
      .toDF(names: _*)

  /** 附件1-style TSV (36 cols incl. price). */
  def readCarTrain(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, CarSchema.carTrainSchema, CarSchema.carTrainColumns)

  /** 附件2-style TSV (35 cols). */
  def readCarTest(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, CarSchema.carTestSchema, CarSchema.carTestColumns)

  /** 附件4-style ragged TSV: 5-field lines (unsold) get a null
    * withdrawDate; 6-field lines parse fully.
    */
  def readStoreTxn(spark: SparkSession, path: String): DataFrame =
    tsv(spark, path, CarSchema.storeTxnSchema, CarSchema.storeTxnColumns)

  /** 附件3-style submission: `carid \t price`, no header. */
  def writeSubmission(df: DataFrame, path: String): Unit =
    df.select(col("carid").cast("string"), col("price").cast("string"))
      .write.mode("overwrite").option("sep", "\t").option("header", "false")
      .csv(path)

  /** S7 — plain-text list sink (reference utils.py:221-225
    * `write_to_txt`: one stringified item per line). Single-column
    * frame → one line per row; distributed write, any scale.
    */
  def writeTextList(df: DataFrame, path: String): Unit = {
    require(df.columns.length == 1, "text list sink takes a 1-column frame")
    df.select(col(df.columns.head).cast("string").as("value"))
      .write.mode("overwrite").text(path)
  }
}
