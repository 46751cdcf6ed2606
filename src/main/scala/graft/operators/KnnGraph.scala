package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CheckpointShim
import org.apache.spark.storage.StorageLevel
import graft.functions.VectorOps

/** k-NN GRAPH construction by NN-descent (Dong et al., WWW'11) — the
  * all-pairs complement of [[SimilaritySearch]]'s per-query ANN: every
  * node ends with its k best cosine neighbors, the structure clustering,
  * graph-based dedup, and diversity sampling consume. Brute force is
  * n² pair scores; NN-descent converges on n·k² candidate scores per
  * round by exploiting "a neighbor of my neighbor is likely my
  * neighbor": each round scores only the 2-hop frontier of the current
  * graph against itself and keeps the per-node top-k.
  *
  * Spark shape: the graph state is a skinny (src, dst, cos) frame; a
  * round is two self-joins (undirected 2-hop candidates), one vector
  * equi-join per side to score, a union with the incumbent edges, and a
  * per-src top-k window — all equi-joins and hash partitionings, no
  * nested-loop node anywhere. Vectors persist once and are joined by
  * id each round; candidate rows carry ids + the cosine only.
  *
  * Monotone by construction: the union keeps incumbent edges, so a
  * node's kept top-k can only improve round over round (KnnGraphSpec
  * asserts both the monotonicity and a recall floor vs the exact
  * graph). Deterministic: seeded-hash init buckets, hash-tie-broken
  * windows — same output on any partitioning or retry.
  *
  * Init seeds each node with its DOUBLE hash bucket's members (two
  * independent salted bucketings, ~2(k+1) candidates per node): one
  * random bucketing risks singleton buckets that strand a node with no
  * edges to descend from; the union makes isolation vanishingly rare.
  */
object KnnGraph {

  def nnDescent(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int = 3, seed: Long = 42L): DataFrame = {
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0; got k=$k iters=$iters")
    import org.apache.spark.sql.expressions.Window
    val vecs = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__nm", VectorOps.l2Norm(col("__v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = vecs.count()
      val nBuckets = math.max(1L, n / (k + 1L))
      // two independent seeded bucketings; all ordered pairs in a bucket
      val ids = vecs.select(col("id"))
      val bucketed = (0 to 1).map { salt =>
        val b = ids.withColumn("__b",
          pmod(xxhash64(col("id"), lit(seed + salt)), lit(nBuckets)))
        b.join(b.select(col("__b"), col("id").as("dst")), Seq("__b"))
          .where(col("id") =!= col("dst"))
          .select(col("id").as("src"), col("dst"))
      }.reduce(_ unionAll _)
      val bySrc = Window.partitionBy(col("src"))
        .orderBy(col("cos").desc, col("dst").asc)
      def topK(scored: DataFrame): DataFrame = scored
        .withColumn("__rk", row_number().over(bySrc))
        .where(col("__rk") <= k).drop("__rk")
      def score(pairs: DataFrame): DataFrame = pairs
        .join(vecs.select(col("id").as("src"), col("__v").as("__sv"),
          col("__nm").as("__sn")), Seq("src"))
        .join(vecs.select(col("id").as("dst"), col("__v").as("__dv"),
          col("__nm").as("__dn")), Seq("dst"))
        .select(col("src"), col("dst"),
          VectorOps.cosineWithNorms(col("__sv"), col("__dv"),
            col("__sn"), col("__dn")).as("cos"))
      var graph = topK(score(bucketed.distinct())).localCheckpoint(true)
      for (_ <- 1 to iters) {
        // undirected 2-hop frontier: neighbors-of-neighbors both ways
        val und = graph.select(col("src"), col("dst"))
          .unionAll(graph.select(col("dst").as("src"), col("src").as("dst")))
        val cand = und.join(und.select(col("src").as("dst"), col("dst").as("d2")),
            Seq("dst"))
          .where(col("src") =!= col("d2"))
          .select(col("src"), col("d2").as("dst"))
          .distinct()
          // incumbents rejoin via the union below; don't re-score them
          .join(graph.select(col("src"), col("dst")), Seq("src", "dst"), "left_anti")
        val next = topK(score(cand).unionAll(graph)).localCheckpoint(true)
        CheckpointShim.freeLocalCheckpointIfAny(graph)
        graph = next
      }
      graph.withColumn("rank", row_number().over(bySrc).cast("long"))
        .select(col("src").as("id"), col("dst").as("neighbor_id"),
          col("rank"), round(col("cos"), 4).as("cosine"))
    } finally vecs.unpersist(blocking = false)
  }
}
