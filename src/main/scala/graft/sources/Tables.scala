package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's TESTDATA parquet tables (TESTDATA.md).
  *
  * Tables are read with explicit paths, no schema inference beyond
  * parquet's own metadata; Catalyst handles column pruning and filter
  * pushdown into these scans. At cluster scale the same calls work on
  * directory-partitioned datasets unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Cheap content signature for a stored-artifact fixture tag: a hash
    * of every underlying file's (relative name, length, mtime). Pure
    * filesystem metadata — no Spark job — but it changes whenever the
    * table is regenerated at the same path (different sf or seed), so
    * a fixture keyed on it can never serve stale data the way a
    * path-string hash could.
    */
  def contentStamp(sfDir: String, name: String): String = {
    val root = new java.io.File(s"$sfDir/$name.parquet")
    if (!root.exists())
      throw new IllegalArgumentException(
        s"contentStamp: no such table path $root")
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) {
        // listFiles() is null on permission/IO races, not just missing dirs
        val kids = Option(f.listFiles()).getOrElse(
          throw new java.io.UncheckedIOException(new java.io.IOException(
            s"contentStamp: cannot list $f")))
        kids.toSeq.sortBy(_.getName).flatMap(files)
      } else Seq(f)
    val rootPath = root.toPath
    // relative path, not bare name: same-named part files in different
    // subdirs must contribute distinct signature entries
    val sig = files(root)
      .map(f => s"${rootPath.relativize(f.toPath)}:${f.length}:${f.lastModified}")
      .mkString("|")
    f"${java.util.UUID.nameUUIDFromBytes(sig.getBytes("UTF-8")).toString.take(12)}%s"
  }

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events` exposes `ts` as a raw nanosecond epoch long (`ts_ns`);
    * downstream time logic works on epoch arithmetic, which is also the
    * cheapest form at scale (pure codegen'd long math, no tz).
    *
    * The stored encoding has varied across testdata generations — INT64
    * TIMESTAMP(NANOS) (readable only as a long, with
    * `spark.sql.legacy.parquet.nanosAsLong=true` set when the session is
    * BUILT) vs TIMESTAMP(MICROS) (read as a timestamp type) — so the
    * loader normalizes whatever the footer declares to the same `ts_ns`:
    *  - long (nanos file + conf): already nanoseconds, rename only;
    *  - TIMESTAMP_NTZ (micros file, isAdjustedToUTC=false): wall-clock
    *    micros since epoch via `timestampdiff` against the epoch NTZ
    *    literal — pure calendar arithmetic, no session-timezone
    *    dependence (a tz-sensitive cast would shift rows between hour
    *    buckets on a non-UTC session);
    *  - TIMESTAMP (micros file read as instant): `unix_micros`, which is
    *    tz-independent by definition.
    * µs→ns is ×1000, exact in int64 for any plausible epoch. The conf is
    * NOT set here: it is consulted again at scan-execution time, so a
    * set-and-restore inside this loader cannot be correctly scoped, and a
    * permanent set would silently change the CALLER's other parquet
    * reads — a library must not mutate its host session.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Up-front footer check, not a catch on Spark's error text: depending
    // on version, a NANOS column surfaces as a schema-read failure OR a
    // scan-EXECUTION failure (PARQUET_TYPE_ILLEGAL) — a message-text
    // catch around load() misses the latter entirely and is brittle
    // across Spark versions besides. Reading the footer's declared
    // logical type is one metadata read and version-independent.
    if (tsDeclaredNanos(spark, dir) &&
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      throw new IllegalArgumentException(
        "events.parquet stores ts as INT64 TIMESTAMP(NANOS): build the " +
          "session with spark.sql.legacy.parquet.nanosAsLong=true " +
          "(see Tables.events doc)")
    val raw = load(spark, dir, "events")
    val tsNs = raw.schema("ts").dataType match {
      case LongType => col("ts")
      case TimestampNTZType =>
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000")
      case TimestampType => expr("unix_micros(ts) * 1000")
      case t => throw new IllegalArgumentException(
        s"events.ts has unsupported type $t — expected long (nanosAsLong), " +
          "timestamp_ntz, or timestamp")
    }
    // select keeps ts_ns in ts's ordinal position, like the rename did
    raw.select(raw.columns.map {
      case "ts" => tsNs.cast(LongType).as("ts_ns")
      case c => col(c)
    }: _*)
  }
  /** Does the events parquet footer declare `ts` as TIMESTAMP(NANOS)?
    * One footer read of one file (all parts of a dataset share the
    * writer schema); any failure to inspect returns false and lets the
    * normal load path produce its own error.
    */
  private def tsDeclaredNanos(spark: SparkSession, dir: String): Boolean =
    try {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.parquet.schema.LogicalTypeAnnotation
      import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
      val conf = spark.sessionState.newHadoopConf()
      val root = new Path(s"$dir/events.parquet")
      val fs = root.getFileSystem(conf)
      val file =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).map(_.getPath)
            .find(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
            .getOrElse(root)
        else root
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        schema.containsField("ts") && (schema.getType(Seq("ts"): _*).getLogicalTypeAnnotation match {
          case t: TimestampLogicalTypeAnnotation =>
            t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        })
      } finally reader.close()
    } catch { case _: Throwable => false }

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
