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

  test("AQE splits a skewed j1-shape join over the testdata (fact ⋈ dim on a hot key)") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // the j1 shape (car ⋈ transaction on carid) with production-style
      // skew planted on the REAL testdata: 90% of lineitem's join keys
      // collapse onto one hot order (the one-viral-listing case)
      // the testdata parquet is a single row group → a 1-task scan → a
      // 1-mapper shuffle, and AQE splits a skewed partition by MAPPER
      // ranges — with one mapper there is nothing to split. Widen the
      // map side first (at 100 TB the scan has thousands of mappers and
      // this is the natural state).
      val li = graft.sources.Tables.lineitem(spark, sf("sf0.1")).repartition(8)
      val fact = li.select(
        when(col("l_linenumber") =!= 1, lit(7L))
          .otherwise(pmod(col("l_orderkey"), lit(997))).as("k"),
        col("l_extendedprice"),
        // widen the payload so the hot partition's shuffle bytes dwarf
        // the scaled-down threshold unambiguously
        concat_ws("|", col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")).as("payload"))
      // naturally-unique dim keys — an aggregate here would sit between
      // the shuffle and the join and block OptimizeSkewedJoin (it can
      // only split a side that reads shuffle output directly)
      val dim = graft.sources.Tables.orders(spark, sf("sf0.1"))
        .where(col("o_orderkey") < 997)
        .select(col("o_orderkey").as("k"), col("o_totalprice"))
      val joined = fact.join(dim, Seq("k"))
      val n = joined.toLocalIterator().asScala.length
      assert(n > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"skew join did not engage on the j1 shape:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
