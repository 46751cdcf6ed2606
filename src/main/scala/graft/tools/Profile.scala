package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for slow queries (local iteration only).
  *
  * Round-15 form: decompose the graph battery's three heaviest rows
  * (pagerank / betweenness / link_prediction) into their phases so
  * SCALE.md can state with numbers where the wall time actually goes —
  * the algorithm's own iteration joins vs prep vs fixed job overhead.
  */
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
        println(f"[profile] $label%-44s rep$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
      }
    }

    // fixtures built untimed, exactly like Bench's warm-up
    graft.queries.GraphQueries.ensureFixtures(spark, dir)
    graft.queries.WarehouseQueries.ensureFixtures(spark, dir)

    // ---- graph_pagerank: prep vs per-iteration slope ----------------
    val se = graft.queries.GraphQueries.storedSupplyEdges(spark, dir)
    time("pagerank fixture scan only")(se.count())
    Seq(1, 3, 5).foreach { it =>
      time(s"pagerank iters=$it", reps = 2)(
        graft.operators.PageRank.ranks(
          se.select(col("src"), col("dst")), "src", "dst", iters = it).count())
    }

    // ---- graph_betweenness: hop-ball growth -------------------------
    val b = se.select(col("src").as("a"), col("dst").as("b"))
    val seeds = graft.sources.Tables.lineitem(spark, dir)
      .where(col("l_suppkey") <= 5)
      .select(concat(lit("s"), col("l_suppkey")).as("seed")).distinct()
    Seq(1, 2, 3).foreach { h =>
      time(s"betweenness maxHops=$h", reps = 2)(
        graft.operators.GraphAlgs.betweennessFromSeeds(
          b, "a", "b", seeds, "seed", maxHops = h).count())
    }

    // ---- graph_link_prediction: phase decomposition -----------------
    val basket = graft.queries.WarehouseQueries.storedBasketEdges(spark, dir)
    time("linkpred fixture scan only")(basket.count())
    val canon = basket.select(
      least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    time("linkpred canonical distinct")(canon.count())
    val und = canon.unionAll(canon.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    time("linkpred degree aggregate")(deg.count())
    val half = und.select(col("b").as("m"), col("a"))
    time("linkpred wedge self-join + common count")(
      half.join(half.select(col("m"), col("a").as("b")), Seq("m"))
        .where(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
        .where(col("common") >= 2).count())
    time("linkpred full query")(
      graft.SparkEntry.queries("graph_link_prediction")(spark, dir).count())

    spark.stop()
  }
}
