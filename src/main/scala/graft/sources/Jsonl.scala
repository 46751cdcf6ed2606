package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines source/sink — the interchange format LLM corpora actually
  * ship in (one JSON document per line, gzip/zstd-compressed shards).
  * Spark's `json` format IS line-delimited JSON, so this is a thin,
  * opinionated wrapper encoding the rules that matter at 100 TB:
  *
  *  - **Schema is required on read.** Schema inference is a full extra
  *    pass over the data before the real job starts — at corpus scale
  *    that doubles the scan cost, and a drifting field silently changes
  *    the inferred type between shards. Callers state the contract.
  *  - **Corrupt lines are captured, not fatal.** Real web-scale dumps
  *    contain truncated shards and stray bytes; PERMISSIVE mode with a
  *    `_corrupt_record` column keeps the 1-in-10⁹ bad line out of the
  *    typed columns while preserving it for quarantine auditing
  *    ([[readWithCorrupt]] splits the two streams).
  *  - **Writes compress.** Text JSON is 5-10× parquet's footprint;
  *    gzip (default) keeps shards splittable-enough via many files —
  *    one file per partition — rather than within-file splits.
  */
object Jsonl {

  /** Strict-schema JSONL read; malformed lines become all-null rows
    * (PERMISSIVE) unless the caller opts into FAILFAST.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)

  /** The two streams of a [[readWithCorrupt]] plus the lifetime handle
    * of the shared cached scan both are filtered from. Call
    * [[CorruptSplit.unpersist]] once the streams are consumed — without
    * it the full raw frame pins storage memory for the session.
    */
  final case class CorruptSplit(good: DataFrame, corrupt: DataFrame,
      raw: DataFrame) {
    def unpersist(): Unit = { raw.unpersist(false); () }
  }

  /** PERMISSIVE read that also returns the quarantine stream: typed
    * rows + corrupt raw lines. The corrupt column rides the same scan —
    * splitting afterwards is a filter, not a second read. The returned
    * [[CorruptSplit]] owns the cache backing both streams; unpersist it
    * when done.
    */
  def readWithCorrupt(spark: SparkSession, path: String,
      schema: StructType): CorruptSplit = {
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType, nullable = true))
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // SPARK-21610: a query over ONLY the corrupt column (or a filter
      // on it alone) is disallowed against the lazy raw frame — the
      // split below references data columns too, but cache first so
      // both streams come from one materialized scan
      .cache()
    val good = raw.where(raw.col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = raw.where(raw.col("_corrupt_record").isNotNull)
      .select(raw.col("_corrupt_record").as("raw_line"))
    CorruptSplit(good, bad, raw)
  }

  /** Compressed JSONL write; `partitionColumns` lays shards out as
    * `col=value/` directories so downstream filtered reads prune whole
    * directories (see BucketingSpec's partition-pruning pin).
    */
  def write(df: DataFrame, path: String,
      compression: String = "gzip",
      partitionColumns: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").option("compression", compression)
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
      .json(path)
  }
}
