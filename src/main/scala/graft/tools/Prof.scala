package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// scratch profiler — not part of the library, deleted after use
object Prof {
  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    // r5 shape, cold JVM: lazy build + probe + single count
    val shingles = graft.operators.Dedup.shingleRows(docs, "text", "doc_id", 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfc = shingles.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val rare = shingles.join(dfc.where(col("df") <= 10000L), Seq("g")).select(col("doc"), col("g"))
    val interRare = rare.join(rare.select(col("doc").as("doc2"), col("g")), Seq("g"))
      .where(col("doc") < col("doc2"))
      .select(col("doc").as("doc_a"), col("doc2").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter_rare"))
    val hotG = dfc.where(col("df") > 10000L).select(col("g"))
    val t0 = System.nanoTime()
    timed("probe hotG (cold)") { hotG.limit(1).isEmpty }
    val inter = interRare.withColumnRenamed("inter_rare", "inter")
    val card = shingles.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val res = inter
      .join(card.select(col("doc").as("doc_a"), col("n")), Seq("doc_a"))
      .join(card.select(col("doc").as("doc_b"), col("n").as("n2")), Seq("doc_b"))
      .withColumn("jaccard", col("inter") / (col("n") + col("n2") - col("inter")))
      .where(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
    timed("count (cold, r5 shape)") { res.count() }
    println(f"[prof] r5-shape total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
