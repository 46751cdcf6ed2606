package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NN-descent semantics on real embeddings: the kept graph can only
  * improve round over round (the union keeps incumbents), converges
  * toward the exact k-NN graph, and is deterministic.
  */
class KnnGraphSpec extends SparkSpec {

  private def truthPairs(k: Int): Set[(Long, Long)] = {
    val e = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    SimilaritySearch.knnJoinBruteForce(e, e, "embedding", "vec_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("nnDescent: recall vs exact graph improves monotonically and converges high") {
    val e = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    val truth = truthPairs(10)
    val recalls = (0 to 5).map { it =>
      val g = KnnGraph.nnDescent(e, "embedding", "vec_id", k = 10, iters = it)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      g.intersect(truth).size.toDouble / truth.size
    }
    // the kept top-k never drops a better neighbor: recall is monotone
    recalls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a, s"recall regressed across a round: $recalls") }
    // random double-bucket init starts near zero (~0.04); descent must
    // recover most of the exact graph even on these ISOTROPIC vectors —
    // the hardest case for "a neighbor of my neighbor is my neighbor"
    // (measured curve: .04 .17 .45 .69 .80 .84, plateauing ~0.85 where
    // clusterless data starves the 2-hop frontier of new signal)
    assert(recalls.head < recalls.last, s"descent did nothing: $recalls")
    assert(recalls.last >= 0.8, s"converged recall too low: $recalls")
  }

  test("graphSearch: recall at least matches IVF at comparable candidate budget, deterministic") {
    val e = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    val queries = e.where(pmod(col("vec_id"), lit(25)) === 0)
    val truth = SimilaritySearch
      .knnJoinBruteForce(e, queries, "embedding", "vec_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val graph = KnnGraph.nnDescent(e, "embedding", "vec_id", k = 10, iters = 3)
    val got = KnnGraph.graphSearch(graph, e, queries, "embedding", "vec_id",
      k = 10, beam = 20, hops = 4, seedsPerQuery = 8)
      .collect()
    val perQuery = got.groupBy(_.getLong(0))
    assert(perQuery.size == 20)
    assert(perQuery.values.forall(_.map(_.getLong(2)).sorted.toSeq == (1L to 10L)))
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val gRecall = gotPairs.intersect(truth).size.toDouble / truth.size
    // Budget honesty on a 500-vector corpus: graph search scores
    // ≤ seeds + hops·beam·2k frontier rows per query — a bound set by
    // the CONFIG, not the corpus (the 100 TB argument: per-hop work is
    // corpus-size-independent, while IVF's per-query scan n·nprobe/
    // kCells grows linearly with n). At n=500 any config-sized budget
    // is near the whole corpus, so the comparison below is the
    // at-this-SF sanity floor, not the scale claim: IVF probing HALF
    // the corpus (nprobe=4 of 8, ~250 scored/query, measured recall
    // 0.775) must not beat the graph walk (measured grid: beam=10/
    // hops=2 → 0.49, 20/3 → 0.845, 20/4 → 0.905, 40/4 → 0.99 —
    // recall is bought by hops·beam, the HNSW knob, not by corpus
    // scans). Both sides deterministic (seeded KMeans / seeded hash).
    val centroids = SimilaritySearch.fitIvf(e, "embedding", k = 8, maxIter = 3)
    val ivf = SimilaritySearch
      .knnJoinIvf(e, queries, "embedding", "vec_id", k = 10, centroids, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRecall = ivf.intersect(truth).size.toDouble / truth.size
    assert(gRecall >= ivfRecall,
      s"graph-guided recall $gRecall below IVF $ivfRecall")
    assert(gRecall >= 0.85, s"graph-guided recall too low: $gRecall")
    // determinism: same seeds, same graph -> bit-identical result
    val again = KnnGraph.graphSearch(graph, e, queries, "embedding", "vec_id",
      k = 10, beam = 20, hops = 4, seedsPerQuery = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("ivfSeeds: distribution-aware entry points beat hash seeds, and at fewer hops") {
    import spark.implicits._
    // 16 well-separated clusters in 16-d with deterministic per-id
    // jitter: MORE modes than the 8 hash seeds — the case uniform
    // seeding is structurally blind to (some clusters get no entry
    // point, and with k-NN edges almost all intra-cluster no hop
    // budget recovers an unreached mode). This is the billion-node
    // shape in miniature: seeds must follow the distribution.
    val dim = 16
    val clustered = (0 until 480).map { i =>
      val c = i % 16
      val v = Array.tabulate(dim) { d =>
        val base = if (d == c) 1.0 else if (d == (c + 3) % dim) 0.5 else 0.0
        base + 0.04 * (((i * 31 + d * 17) % 19) - 9) / 9.0
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = clustered.where(pmod(col("vec_id"), lit(12)) === 0)
    val truth = SimilaritySearch
      .knnJoinBruteForce(clustered, queries, "embedding", "vec_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val graph = KnnGraph.nnDescent(clustered, "embedding", "vec_id",
      k = 8, iters = 3)
    def recall(hops: Int, seeds: Option[org.apache.spark.sql.DataFrame]): Double = {
      val got = KnnGraph.graphSearch(graph, clustered, queries, "embedding",
        "vec_id", k = 10, beam = 12, hops = hops,
        seedsPerQuery = 8, perQuerySeeds = seeds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val centroids = SimilaritySearch.fitIvf(clustered, "embedding",
      k = 16, maxIter = 5)
    val seeds = KnnGraph.ivfSeeds(clustered, queries, "embedding", "vec_id",
      centroids, nprobe = 2).persist()
    // coverage: every query gets exactly nprobe seed nodes
    val perQuery = seeds.collect().groupBy(_.getLong(0))
    assert(perQuery.size == 40 && perQuery.values.forall(_.length == 2))
    // Measured grid (deterministic — seeded KMeans, seeded hash picks,
    // id-tie-broken windows):
    //   ivf  hops 1..4: 0.30  0.49  0.6475 0.725
    //   hash hops 1..4: 0.1675 0.3525 0.4825 0.50
    // The VERDICT bar, with margin: 2 cell-medoid seeds at THREE hops
    // beat 8 uniform seeds at FOUR (fewer hops, 0.1475 more recall),
    // and ivf dominates hash at EVERY equal hop count.
    val ivf1 = recall(1, Some(seeds)); val hash1 = recall(1, None)
    val ivf3 = recall(3, Some(seeds)); val hash4 = recall(4, None)
    assert(ivf3 >= hash4 + 0.05,
      s"ivf-seeded hops=3 recall $ivf3 not above hash-seeded hops=4 $hash4")
    assert(ivf1 > hash1,
      s"ivf-seeded hops=1 recall $ivf1 not above hash-seeded hops=1 $hash1")
    // determinism: same centroids -> bit-identical seeds twice
    val again = KnnGraph.ivfSeeds(clustered, queries, "embedding", "vec_id",
      centroids, nprobe = 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == seeds.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    seeds.unpersist(false)
  }

  test("graphSearch over a STORED graph equals the inline result (build/search split)") {
    // production shape: the graph is built once (expensive), persisted,
    // and searched many times — the search half must consume the stored
    // artifact unchanged
    val e = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    val queries = e.where(pmod(col("vec_id"), lit(50)) === 0)
    val graph = KnnGraph.nnDescent(e, "embedding", "vec_id", k = 10, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_knn_graph").toString
    graph.write.mode("overwrite").parquet(dir)
    val inline = KnnGraph.graphSearch(graph, e, queries, "embedding", "vec_id",
      k = 5, beam = 10, hops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = KnnGraph.graphSearch(spark.read.parquet(dir), e, queries,
      "embedding", "vec_id", k = 5, beam = 10, hops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == inline && stored.nonEmpty)
  }

  test("k10/i2 maintenance fixtures: stored base graph ≡ inline, and the maintenance ops agree") {
    // the bench's knn_graph_{insert,remove}_stored rows read parquet
    // fixtures of the k=10/iters=2 nnDescent graphs; this pins the whole
    // claim chain at spec scale: (1) the graph round-trips parquet bit
    // for bit, (2) insert/remove run off the stored copy produce the
    // exact rows the inline-priced siblings produce
    val e = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    val old = e.where(pmod(col("vec_id"), lit(10)) =!= 0)
    val fresh = e.where(pmod(col("vec_id"), lit(10)) === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    def roundTrip(g: org.apache.spark.sql.DataFrame) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_knn_i2").toString
      g.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    val fullInline = KnnGraph.nnDescent(e, "embedding", "vec_id", k = 10, iters = 2)
    val fullStored = roundTrip(fullInline)
    assert(rows(fullStored) == rows(fullInline) && rows(fullInline).nonEmpty)
    val oldInline = KnnGraph.nnDescent(old, "embedding", "vec_id", k = 10, iters = 2)
    val oldStored = roundTrip(oldInline)
    assert(rows(oldStored) == rows(oldInline) && rows(oldInline).nonEmpty)
    val insInline = rows(KnnGraph.insert(oldInline, old, fresh,
      "embedding", "vec_id", k = 10, beam = 10, hops = 2))
    val insStored = rows(KnnGraph.insert(oldStored, old, fresh,
      "embedding", "vec_id", k = 10, beam = 10, hops = 2))
    assert(insStored == insInline && insInline.nonEmpty)
    val batch = fresh.select(col("vec_id"))
    val remInline = rows(KnnGraph.remove(fullInline, e, batch,
      "embedding", "vec_id", k = 10, beam = 10, hops = 2))
    val remStored = rows(KnnGraph.remove(fullStored, e, batch,
      "embedding", "vec_id", k = 10, beam = 10, hops = 2))
    assert(remStored == remInline && remInline.nonEmpty)
  }

  test("insert: incremental batch insertion tracks the full rebuild; id collisions rejected") {
    val e = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    val old = e.where(col("vec_id") < 450)
    val fresh = e.where(col("vec_id") >= 450)
    val oldGraph = KnnGraph.nnDescent(old, "embedding", "vec_id", k = 10, iters = 3)
    val merged = KnnGraph.insert(oldGraph, old, fresh, "embedding", "vec_id",
      k = 10, beam = 20, hops = 3)
      .persist()
    // shape: every node (old AND new) keeps exactly k ranked edges
    val perNode = merged.collect().groupBy(_.getLong(0))
    assert(perNode.size == 500)
    assert(perNode.values.forall(_.map(_.getLong(2)).sorted.toSeq == (1L to 10L)))
    // quality: recall vs the exact 500-node graph must track the full
    // rebuild within a few points (the batch is 10% of the corpus —
    // far above a realistic ingest tick, so this is the stress case)
    val truth = SimilaritySearch.knnJoinBruteForce(e, e, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuilt = KnnGraph.nnDescent(e, "embedding", "vec_id", k = 10, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mergedPairs = merged.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuildRecall = rebuilt.intersect(truth).size.toDouble / truth.size
    val insertRecall = mergedPairs.intersect(truth).size.toDouble / truth.size
    assert(insertRecall >= rebuildRecall - 0.1,
      s"insert recall $insertRecall trails rebuild $rebuildRecall by > 0.1")
    merged.unpersist(false)
    // colliding ids must be rejected, not silently merged
    intercept[IllegalArgumentException] {
      KnnGraph.insert(oldGraph, old, old.limit(1), "embedding", "vec_id", k = 10)
    }
  }

  test("remove: pruned graph never references removed ids, affected nodes refill, tracks rebuild") {
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    val graph = KnnGraph.nnDescent(e, "embedding", "vec_id", k = 10, iters = 3)
    val removedIds = (0L until 500L by 10L) // 50 nodes, 10% of the corpus
    val pruned = KnnGraph.remove(graph, e, removedIds.toDF("vec_id"),
      "embedding", "vec_id", k = 10, beam = 20, hops = 3)
      .persist()
    val rows = pruned.collect()
    val removedSet = removedIds.toSet
    // no output edge touches a removed id, on either endpoint
    assert(rows.forall(r => !removedSet.contains(r.getLong(0)) &&
      !removedSet.contains(r.getLong(1))))
    // every survivor still has a ranked list (refill reached them all)
    val perNode = rows.groupBy(_.getLong(0))
    assert(perNode.size == 450)
    perNode.values.foreach { es =>
      val ranks = es.map(_.getLong(2)).sorted.toSeq
      assert(ranks == (1L to ranks.length), s"ranks not dense: $ranks")
    }
    // quality: recall vs the exact 450-node graph tracks a full rebuild
    val survivors = e.where(!col("vec_id").isin(removedIds: _*))
    val truth = SimilaritySearch
      .knnJoinBruteForce(survivors, survivors, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuilt = KnnGraph.nnDescent(survivors, "embedding", "vec_id", k = 10, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prunedPairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuildRecall = rebuilt.intersect(truth).size.toDouble / truth.size
    val removeRecall = prunedPairs.intersect(truth).size.toDouble / truth.size
    assert(removeRecall >= rebuildRecall - 0.1,
      s"remove recall $removeRecall trails rebuild $rebuildRecall by > 0.1")
    pruned.unpersist(false)
    // removing unknown ids is a no-op on the edge set (idempotent
    // retries). Ranks are compared as pairs+cosines, not numbers: the
    // merge re-ranks from the graph's 4-dp stored cosines, so exact
    // ties may renumber — the neighbor lists themselves are identical
    val noop = KnnGraph.remove(graph, e, Seq(9999L).toDF("vec_id"),
      "embedding", "vec_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val orig = graph.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(noop == orig)
  }

  test("null or non-numeric ids raise instead of collapsing onto a null node") {
    import spark.implicits._
    val vecs = Seq(("a", Array(1.0, 0.0)), ("b", Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val good = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val graph = KnnGraph.nnDescent(good, "embedding", "vec_id", k = 1, iters = 0)
    // non-numeric string ids: graphSearch raises from the checked cast
    val searchErr = intercept[Exception] {
      KnnGraph.graphSearch(graph, vecs, vecs, "embedding", "vec_id",
        k = 1, beam = 1, hops = 0, seedsPerQuery = 1).collect()
    }
    assert(searchErr.getMessage.contains("non-numeric"), searchErr.getMessage)
    // null ids in a removal batch: raise, not a silent no-op
    val removeErr = intercept[Exception] {
      KnnGraph.remove(graph, good,
        Seq[Option[Long]](None).toDF("vec_id"), "embedding", "vec_id", k = 1)
        .collect()
    }
    assert(removeErr.getMessage.contains("vec_id"), removeErr.getMessage)
    // nnDescent's aggregate-piggybacked guard fires too
    val descentErr = intercept[Exception] {
      KnnGraph.nnDescent(vecs, "embedding", "vec_id", k = 1, iters = 0).collect()
    }
    assert(descentErr.getMessage.contains("non-numeric"), descentErr.getMessage)
  }

  test("nnDescent: k rows per node with ranks 1..k, deterministic across runs") {
    val e = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    val g1 = KnnGraph.nnDescent(e, "embedding", "vec_id", k = 5, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val perNode = g1.groupBy(_._1)
    assert(perNode.size == 500)
    assert(perNode.values.forall(_.map(_._3).toSeq.sorted == (1L to 5L)))
    val g2 = KnnGraph.nnDescent(e, "embedding", "vec_id", k = 5, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(g1 == g2)
  }
}
