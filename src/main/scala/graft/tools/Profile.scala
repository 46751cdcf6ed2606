package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow queries (local iteration only). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    time("docs.count")(docs.count())

    // simhash stages
    import org.apache.spark.sql.graftshim.ColumnShim
    val sig = ColumnShim.column(graft.functions.expressions.SimHash64(
      ColumnShim.expression(split(col("text"), " "))))
    val sigs = docs.select(col("doc_id").cast("long").as("doc"), sig.as("sig"))
    time("simhash signatures")(sigs.count())
    time("simhash full")(graft.operators.Dedup.simHashPairs(docs, "text", "doc_id").count())

    // ngram stages
    val sh = {
      import spark.implicits._
      docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          val toks = text.split(' ')
          val out = scala.collection.mutable.Set.empty[String]
          if (toks.length <= 5) out += toks.mkString(" ")
          else toks.sliding(5).foreach(w => out += w.mkString(" "))
          out.iterator.map(g => (id, g))
        }.toDF("doc", "g")
    }
    time("shingle rows")(sh.count())
    val cached = sh.cache()
    time("shingle rows cached")(cached.count())
    val inter = cached.join(cached.select(col("doc").as("doc2"), col("g")), Seq("g"))
      .where(col("doc") < col("doc2"))
      .groupBy("doc", "doc2").agg(count(lit(1)).as("inter"))
    time("shingle self-join")(inter.count())
    time("ngram full")(graft.operators.Dedup.shingleJaccardPairs(docs, "text", "doc_id", 5, 0.5).count())
    spark.stop()
  }
}
