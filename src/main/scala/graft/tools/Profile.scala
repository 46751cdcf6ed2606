package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    def time[T](label: String, reps: Int = 3)(f: => T): Unit = {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[profile] $label%-40s rep$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }

    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    li.count() // warm the scan

    def edgesWindow: DataFrame = {
      val d = li.distinct()
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_partkey"))
      d.withColumn("__prev", lag(col("l_partkey"), 1).over(w))
        .where(col("__prev").isNotNull)
        .select(col("__prev").as("a"), col("l_partkey").as("b"))
    }
    def edgesAgg: DataFrame =
      li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("__ps"))
        .where(size(col("__ps")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(__ps) - 2), i -> struct(__ps[i] AS a, __ps[i+1] AS b))"))
          .as("__e"))
        .select(col("__e.a").as("a"), col("__e.b").as("b"))

    time("edges window form")(edgesWindow.count())
    time("edges collect_set form")(edgesAgg.count())

    def symOf(be: DataFrame) = be.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(be.select(col("b").as("src"), col("a").as("dst")))

    time("adjacency distinct+repartition") {
      val e = symOf(edgesAgg).distinct().repartition(col("src"))
      e.count()
    }
    time("adjacency repartition+dropDup") {
      val e = symOf(edgesAgg).repartition(col("src")).dropDuplicates(Seq("src", "dst"))
      e.count()
    }
    time("bfs full (query)")(graft.SparkEntry.queries("graph_bfs")(spark, dir).count())
    time("triangles full (query)")(graft.SparkEntry.queries("graph_triangles")(spark, dir).count())
    spark.stop()
  }
}
