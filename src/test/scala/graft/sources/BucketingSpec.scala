package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Proof of the co-located-join path: two tables bucketed on the join
  * key join WITHOUT a shuffle on either side. At 100 TB this is the
  * difference between re-shuffling both fact tables per query and a
  * zero-exchange sort-merge over pre-bucketed storage — the layout the
  * engine's parquet intermediates should use for any key joined more
  * than once (SCALE.md, scans & sinks).
  */
class BucketingSpec extends SparkSpec {

  test("partitionBy write + filtered read prunes partitions at the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    (0L until 1000L).map(i => (i, s"src${i % 10}", s"text $i"))
      .toDF("doc_id", "source", "text")
      .write.partitionBy("source").parquet(s"$dir/docs")
    val read = spark.read.parquet(s"$dir/docs")
      .where(col("source") === "src3")
    // the predicate must become a PartitionFilter (directory pruning —
    // 9/10 of a 100 TB table never read), not a post-scan Filter
    val scan = read.queryExecution.executedPlan.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    // the pruned scan lists only the matching directory's files, the
    // full scan lists all ten — pruning happens at planning, pre-I/O
    val fullScan = spark.read.parquet(s"$dir/docs")
      .queryExecution.executedPlan.collectWithSubqueries {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.files.length).sum <
      fullScan.relation.location.listFiles(Nil, Nil).map(_.files.length).sum)
    assert(read.count() == 100)
  }

  test("join over tables bucketed on the key plans with no shuffle exchange") {
    import spark.implicits._
    // tables land in the session's default warehouse; DROP TABLE below
    // removes the managed files
    // force the sort-merge path so the assertion is about bucketing,
    // not about one side being broadcast-small
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = (1L to 1000L).map(i => (i % 97, i, i * 2.0))
        .toDF("cust_id", "order_id", "amount")
      val custs = (0L until 97L).map(i => (i, s"c$i")).toDF("cust_id", "name")
      orders.write.mode("overwrite")
        .bucketBy(8, "cust_id").sortBy("cust_id")
        .saveAsTable("orders_bkt")
      custs.write.mode("overwrite")
        .bucketBy(8, "cust_id").sortBy("cust_id")
        .saveAsTable("custs_bkt")
      val joined = spark.table("orders_bkt")
        .join(spark.table("custs_bkt"), Seq("cust_id"))
        .groupBy(col("name")).agg(sum(col("amount")).as("total"))
      val shuffles = joined.queryExecution.executedPlan.collectWithSubqueries {
        case s: ShuffleExchangeExec => s
      }
      // the join itself must be shuffle-free; the only exchange allowed
      // is the final 97-row groupBy on a DIFFERENT key
      assert(shuffles.length <= 1,
        joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 97)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS custs_bkt")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
