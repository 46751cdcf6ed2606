package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted plans for selected queries (local iteration only). */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("s1_scan", "j1_join_label", "a2_zscore")
    names.foreach { n =>
      println(s"========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    println("========== entry ==========")
    graft.SparkEntry.entry(spark).explain("formatted")
    spark.stop()
  }
}
