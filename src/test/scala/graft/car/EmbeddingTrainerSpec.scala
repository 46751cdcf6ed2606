package graft.car

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EmbeddingTrainerSpec extends SparkSpec {

  test("initFlat is deterministic, bounded by 1/sqrt(dim), dim rows per id") {
    val flat = EmbeddingTrainer.initFlat(spark, n = 10, dim = 8, seed = 7L)
    assert(flat.count() == 80)
    val b = 1.0 / math.sqrt(8.0)
    val mx = flat.agg(max(abs(col("value")))).head().getDouble(0)
    assert(mx <= b)
    val again = EmbeddingTrainer.initFlat(spark, 10, 8, 7L)
    assert(flat.exceptAll(again).count() == 0)
  }

  test("assemble restores dimension order after shuffle") {
    val flat = EmbeddingTrainer.initFlat(spark, 5, 16, 1L)
      .repartition(8) // scramble
    val vecs = EmbeddingTrainer.assemble(flat, "entity_id").collect()
    assert(vecs.length == 5)
    val byId = flat.orderBy("id", "pos").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(2)).toSeq)
    vecs.foreach { r =>
      assert(r.getSeq[Double](1) == byId(r.getLong(0)))
    }
  }

  test("evaluate-every tracks MRR and returns the best epoch's embeddings") {
    import spark.implicits._
    val edges = (0L until 20L).flatMap(i =>
      Seq((i, 0L, (i + 1) % 20), (i, 1L, (i + 2) % 20)))
      .toDF("head_id", "relation_id", "tail_id")
    val valid = edges.limit(8)
    val cfg = EmbeddingTrainer.Config(dim = 8, epochs = 4, lr = 0.5,
      negRate = 2, evalEvery = 2)
    val t = EmbeddingTrainer.train(edges, 20, 2, cfg, valid = Some(valid))
    assert(t.mrrTrace.map(_._1) == Seq(2, 4))
    assert(t.bestEpoch == t.mrrTrace.maxBy(_._2)._1)
    assert(t.entityEmb.count() == 20)
    // best-epoch selection is real: returned embeddings equal a fresh
    // run stopped at bestEpoch
    val rerun = EmbeddingTrainer.train(edges, 20, 2,
      cfg.copy(epochs = t.bestEpoch, evalEvery = 0))
    assert(t.entityEmb.exceptAll(rerun.entityEmb).count() == 0)
  }

  test("training reduces BCE loss and is deterministic across runs") {
    import spark.implicits._
    // small ring graph: entity i --r0--> i+1, i --r1--> i+2 (mod 20)
    val edges = (0L until 20L).flatMap(i =>
      Seq((i, 0L, (i + 1) % 20), (i, 1L, (i + 2) % 20)))
      .toDF("head_id", "relation_id", "tail_id")
    val cfg = EmbeddingTrainer.Config(dim = 8, epochs = 5, lr = 0.5, negRate = 2)
    val t1 = EmbeddingTrainer.train(edges, 20, 2, cfg)
    assert(t1.epochLoss.size == 5)
    assert(t1.epochLoss.last < t1.epochLoss.head,
      s"loss did not fall: ${t1.epochLoss}")
    val t2 = EmbeddingTrainer.train(edges, 20, 2, cfg)
    assert(t1.entityEmb.exceptAll(t2.entityEmb).count() == 0)
    assert(t1.relationEmb.exceptAll(t2.relationEmb).count() == 0)
  }
}
