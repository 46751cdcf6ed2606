package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Durable-checkpoint behavior of the iterative operators: a killed run
  * resumes from the committed parquet snapshots — in a FRESH session —
  * and lands on the same answer as an uninterrupted run.
  */
class DurableItersSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("PageRank resumes from durable snapshots bit-identically in a fresh session") {
    import spark.implicits._
    val edgeSeq = (0L until 30L).map(i => (s"n$i", s"n${(i + 1) % 30}")) ++
      Seq(("n0", "n15"), ("n7", "n3"))
    val dir = tmp("graft_pr_ckpt")
    val full = PageRank.ranks(edgeSeq.toDF("s", "d"), "s", "d", iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // interrupted run: only 2 of 5 iterations commit
    PageRank.ranks(edgeSeq.toDF("s", "d"), "s", "d", iters = 2,
      checkpointDir = Some(dir)).count()
    assert(DurableIters.latest(spark, dir).map(_._1).contains(2))
    // fresh session (shared context, new state — the resume path must
    // only depend on the durable files)
    val s2 = spark.newSession()
    val edges2 = {
      import s2.implicits._
      edgeSeq.toDF("s", "d")
    }
    val resumed = PageRank.ranks(edges2, "s", "d", iters = 5,
      checkpointDir = Some(dir))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // fixed-point integer arithmetic: resumed ≡ uninterrupted, bit-for-bit
    assert(resumed == full)
    assert(DurableIters.latest(spark, dir).map(_._1).contains(5))
  }

  test("PageRank resume actually READS the snapshot (poisoned artifact changes the result)") {
    import spark.implicits._
    val edgeSeq = (0L until 30L).map(i => (s"n$i", s"n${(i + 1) % 30}"))
    val dir = tmp("graft_pr_poison")
    val full = PageRank.ranks(edgeSeq.toDF("s", "d"), "s", "d", iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    PageRank.ranks(edgeSeq.toDF("s", "d"), "s", "d", iters = 2,
      checkpointDir = Some(dir)).count()
    // doctor the committed round-2 state; a resume that recomputed from
    // scratch would be immune to this (collect first — overwriting a
    // path straight from its own scan is rejected by Spark)
    val rows = spark.read.parquet(s"$dir/iter=2").collect()
      .map(r => (r.getString(0), r.getLong(1) * 2 + 1)).toSeq
    DurableIters.save(rows.toDF("node", "r"), dir, 2).count()
    val resumed = PageRank.ranks(edgeSeq.toDF("s", "d"), "s", "d", iters = 5,
      checkpointDir = Some(dir))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(resumed != full)
  }

  test("EmbeddingTrainer resumes after the committed epoch in a fresh session") {
    import graft.car.EmbeddingTrainer
    import spark.implicits._
    val edgeSeq = (0L until 20L).flatMap(i =>
      Seq((i, 0L, (i + 1) % 20), (i, 1L, (i + 2) % 20)))
    val dir = tmp("graft_emb_ckpt")
    val cfg = EmbeddingTrainer.Config(dim = 8, epochs = 2, lr = 0.5, negRate = 2)
    val first = EmbeddingTrainer.train(
      edgeSeq.toDF("head_id", "relation_id", "tail_id"), 20, 2, cfg,
      checkpointDir = Some(dir))
    assert(first.epochLoss.size == 2)
    assert(DurableIters.latest(spark, dir).map(_._1).contains(2))
    val s2 = spark.newSession()
    val edges2 = {
      import s2.implicits._
      edgeSeq.toDF("head_id", "relation_id", "tail_id")
    }
    val t = EmbeddingTrainer.train(edges2, 20, 2, cfg.copy(epochs = 4),
      checkpointDir = Some(dir))
    // epochs 1-2 came from the snapshot: this run only executed 3-4
    assert(t.epochLoss.size == 2)
    assert(t.entityEmb.count() == 20)
    assert(t.relationEmb.count() == 2)
    assert(DurableIters.latest(spark, dir).map(_._1).contains(4))
  }

  test("duplicateClusters resumes mid-propagation and matches the uninterrupted run") {
    import spark.implicits._
    // a 12-node chain: diameter forces several min-label rounds
    val pairSeq = (0L until 11L).map(i => (i, i + 1))
    val docSeq = (0L to 11L).map(i => Tuple1(i))
    val dir = tmp("graft_cc_ckpt")
    val ref = Dedup.duplicateClusters(
      docSeq.toDF("doc_id"), "doc_id", pairSeq.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // interrupted after one round (chain is far from converged)
    Dedup.duplicateClusters(docSeq.toDF("doc_id"), "doc_id",
      pairSeq.toDF("doc_a", "doc_b"), maxIters = 1,
      checkpointDir = Some(dir)).count()
    assert(DurableIters.latest(spark, dir).map(_._1).contains(1))
    val resumed = Dedup.duplicateClusters(docSeq.toDF("doc_id"), "doc_id",
      pairSeq.toDF("doc_a", "doc_b"), checkpointDir = Some(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(resumed == ref)
    assert(ref.values.toSet == Set(0L))
  }

  test("duplicateClustersStar resumes its edge-state rounds and matches") {
    import spark.implicits._
    val pairSeq = (0L until 11L).map(i => (i, i + 1)) ++ Seq((20L, 21L))
    val docSeq = ((0L to 11L) ++ (20L to 21L)).map(i => Tuple1(i))
    val dir = tmp("graft_star_ckpt")
    val ref = Dedup.duplicateClustersStar(
      docSeq.toDF("doc_id"), "doc_id", pairSeq.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    Dedup.duplicateClustersStar(docSeq.toDF("doc_id"), "doc_id",
      pairSeq.toDF("doc_a", "doc_b"), maxIters = 1,
      checkpointDir = Some(dir)).count()
    val resumed = Dedup.duplicateClustersStar(docSeq.toDF("doc_id"), "doc_id",
      pairSeq.toDF("doc_a", "doc_b"), checkpointDir = Some(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(resumed == ref)
  }
}
