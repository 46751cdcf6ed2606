package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** AQE is the engine's runtime answer to skew the salting operator
  * doesn't pre-handle: a sort-merge join partition that dwarfs the
  * median gets SPLIT at runtime (multiple reducers read slices of the
  * hot partition, the other side replicated to each). This pins that
  * the path actually engages — thresholds scaled down to test size;
  * at 100 TB the defaults (256 MB) play the same role.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join (skew=true)") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 90% of the fact lands on key 1; the dim is uniform
      val fact = spark.range(0, 200000).select(
        when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id") % 1000).as("k"),
        col("id").as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = fact.join(dim, Seq("k"))
      // execute THIS frame (count() would build its own QueryExecution);
      // AQE finalizes the adaptive plan during execution
      val n = joined.toLocalIterator().asScala.length
      assert(n == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"skew join did not engage:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
