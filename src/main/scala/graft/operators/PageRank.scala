package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank as pure integer dataflow — iterative importance scoring over
  * a directed edge list (join → integer divide → hash-aggregate per
  * round), the canonical "iterate until the graph stabilizes" shape the
  * engine's graph slice needs beyond one-shot degree/propagation ops.
  *
  * Ranks are fixed-point integers (`rank · scale`, default scale 10¹²):
  * every step — per-edge contribution `r div outdeg`, the incoming sum,
  * the damping `(85 · Σ) div 100` — is exact 64-bit integer arithmetic.
  * That buys two properties floats cannot give at 100 TB:
  * **aggregation-order independence** (integer sums are associative, so
  * the result is bit-identical under any partitioning, AQE re-plan, or
  * retry) and **engine agreement** (a SQL oracle reproduces the exact
  * integers — no ulp drift across libm implementations).
  *
  * Dangling nodes (no out-edges) keep receiving the teleport term but
  * contribute nothing — the standard MapReduce formulation (total mass
  * decays; relative ranking is what consumers use). Overflow is
  * structurally impossible at any graph size: total mass is conserved
  * below `scale` (Σr' = 0.15·scale + 0.85·Σr ≤ scale by induction), so
  * every per-node incoming sum is ≤ scale and the damping multiply is
  * bounded by 85·scale ≪ 2⁶³ for any scale ≤ 10¹⁶.
  *
  * Edges are persisted for the duration (read once, joined every
  * round); each round is lazily stacked and the final frame is
  * checkpointed once — for iteration counts beyond ~10, checkpoint
  * inside the loop like [[Dedup.duplicateClusters]] does.
  */
object PageRank {

  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "pagerank needs a non-empty edge list")
    require(scale >= 1L && scale <= 10000000000000000L,
      s"scale=$scale outside (0, 1e16] — 85*scale must fit in int64")
    val base = scale / n
    val baseTerm = (15L * base) / 100L
    // fold the out-degree INTO the persisted edge list once — every
    // iteration then needs exactly one join (ranks) + one aggregate,
    // instead of re-joining a fresh degree table per round
    val eod = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("od")), Seq("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var r = nodes.withColumn("r", lit(base))
    for (_ <- 1 to iters) {
      val summed = eod
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("r div od").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("m"))
      r = nodes.join(summed, Seq("node"), "left")
        .select(col("node"), (lit(baseTerm) +
          expr("(85 * coalesce(m, cast(0 as bigint))) div 100")).as("r"))
    }
    val out = r.select(col("node"), col("r").as("pr_fx")).localCheckpoint(true)
    eod.unpersist(false)
    e.unpersist(false)
    nodes.unpersist(false)
    out
  }
}
