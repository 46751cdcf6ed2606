package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local-iteration diagnostic: Janino compile counts per iteration count
  * for the iterative operators — answers "do unrolled iterations share
  * codegen fragments (cache hits) or compile fresh units per round?".
  */
object CompileDiag {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.metrics.source.CodegenMetrics
    // histogram getCount = number of compiled units (ADVICE r19: the
    // deleted ms() accessor read a bytecode-size histogram's sample
    // count under a name that suggested milliseconds)
    def n() = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    graft.queries.GraphQueries.ensureFixtures(spark, dir)
    val se = graft.queries.GraphQueries.storedDegreeEdges(spark, dir)
    val nodes = graft.queries.GraphQueries.storedGraphNodes(spark, dir)
    se.count(); nodes.count()
    Seq(1, 2, 3, 5, 5).foreach { it =>
      val c0 = n()
      val t0 = System.nanoTime()
      graft.operators.PageRank.ranksFromPrepared(se, nodes, iters = it).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[diag] pagerank iters=$it compiles=${n() - c0} wall=$dt%.2f")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    // same loop with LONG node ids (xxhash64 relabel — experiment only):
    // how much of the per-iteration CPU is string join/agg keys?
    val seL = se.select(xxhash64(col("src")).as("src"),
      xxhash64(col("dst")).as("dst"), col("od"))
    val nodesL = nodes.select(xxhash64(col("node")).as("node"))
    Seq(5, 5).foreach { it =>
      val c0 = n()
      val t0 = System.nanoTime()
      graft.operators.PageRank.ranksFromPrepared(seL, nodesL, iters = it).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[diag] pagerank-LONG iters=$it compiles=${n() - c0} wall=$dt%.2f")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    spark.stop()
  }
}
