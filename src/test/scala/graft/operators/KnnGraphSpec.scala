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
