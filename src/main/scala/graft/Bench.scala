package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional positional args = run only these queries (local profiling);
    // the driver invokes with no args and gets the full sorted suite
    val wanted = args.toSet
    val selected =
      if (wanted.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => wanted.contains(n) }
    // a typo'd name would otherwise produce a silent empty suite
    val unknown = wanted -- selected.keySet
    if (unknown.nonEmpty)
      System.err.println(
        s"[bench] no such queries: ${unknown.toSeq.sorted.mkString(", ")}")
    // deterministic (sorted) execution order for comparable timings
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries are independent: drop whatever the finished one persisted
      // or checkpointed so storage memory never bleeds into the next
      // query's execution memory (cleanup is outside the timed section)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      name -> dt
    }
    // 3-decimal seconds keep the whole line inside log-tail capture
    // windows (sub-ms per-query precision is noise anyway)
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
