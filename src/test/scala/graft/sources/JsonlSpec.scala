package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** JSONL is the corpus interchange format: round-trip fidelity,
  * corrupt-line quarantine, and partitioned layout must all hold.
  */
class JsonlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  test("write → read round-trips the documents slice exactly (gzip)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("source"), col("text")).limit(200)
    Jsonl.write(docs, s"$dir/docs")
    // gzip shards on disk, not plain json
    val files = new java.io.File(s"$dir/docs").listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.nonEmpty)
    val back = Jsonl.read(spark, s"$dir/docs", schema)
    assert(back.schema == schema)
    assert(back.collect().map(_.toSeq).toSet == docs.collect().map(_.toSeq).toSet)
  }

  test("corrupt lines quarantine without failing the typed read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_bad").toString
    val f = new java.io.PrintWriter(s"$dir/part-0.json")
    f.println("""{"doc_id": 1, "source": "s0", "text": "good line"}""")
    f.println("""{"doc_id": 2, "source": "s1", "text": "also good"}""")
    f.println("""{"doc_id": 3, "source": BROKEN""")
    f.close()
    val split = Jsonl.readWithCorrupt(spark, dir, schema)
    assert(split.good.count() == 2)
    assert(split.good.schema.fieldNames.toSeq == Seq("doc_id", "source", "text"))
    val quarantined = split.corrupt.collect().map(_.getString(0))
    assert(quarantined.length == 1 && quarantined.head.contains("BROKEN"))
    // the split owns the shared scan's cache — unpersist must release it
    assert(split.raw.storageLevel.useMemory)
    split.unpersist()
    assert(!split.raw.storageLevel.useMemory)
  }

  test("partitioned jsonl write lays out source= directories") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_part").toString
    val docs = (0L until 100L).map(i => (i, s"src${i % 4}", s"text $i"))
      .toDF("doc_id", "source", "text")
    Jsonl.write(docs, s"$dir/docs", partitionColumns = Seq("source"))
    val subdirs = new java.io.File(s"$dir/docs").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(subdirs == Seq("source=src0", "source=src1", "source=src2", "source=src3"))
    // read back with partition discovery; source comes from the path
    val back = spark.read
      .schema(StructType(schema.fields.filterNot(_.name == "source")))
      .option("basePath", s"$dir/docs").json(s"$dir/docs")
    assert(back.count() == 100)
    assert(back.where(col("source") === "src2").count() == 25)
  }
}
