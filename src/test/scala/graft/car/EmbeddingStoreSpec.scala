package graft.car

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EmbeddingStoreSpec extends SparkSpec {

  test("S8: save/load round-trips the (entity_id, vector) table") {
    import spark.implicits._
    val emb = Seq((0L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0)))
      .toDF("entity_id", "vector")
    val path = java.nio.file.Files.createTempDirectory("graft_emb").toString + "/emb"
    EmbeddingStore.save(emb, path)
    val back = EmbeddingStore.load(spark, path).orderBy("entity_id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(back(1).getSeq[Double](1) == Seq(3.0, 4.0))
  }

  test("G5: one mean-aggregation step averages normalized neighbor vectors") {
    import spark.implicits._
    val emb = Seq((0L, Seq(2.0, 4.0)), (1L, Seq(6.0, 8.0)), (2L, Seq(0.0, 0.0)))
      .toDF("entity_id", "vector")
    // both 0 and 1 point at 2; edge_norm 0.5 each
    val edges = Seq((0L, 0L, 2L, 0.5), (1L, 0L, 2L, 0.5))
      .toDF("head_id", "relation_id", "tail_id", "edge_norm")
    val out = EmbeddingStore.meanAggregationStep(edges, emb)
      .where(col("entity_id") === 2L).head()
    // mean(0.5·[2,4], 0.5·[6,8]) = [2, 3]
    assert(out.getSeq[Double](1) == Seq(2.0, 3.0))
  }

  test("G5: hub node with 1e5 in-edges aggregates flat (no per-node array buffer)") {
    import spark.implicits._
    // one hub (id 0) receiving 100k messages from entity 1; edge_norm 1e-5
    val edges = spark.range(100000L)
      .select(lit(1L).as("head_id"), lit(0L).as("relation_id"),
        lit(0L).as("tail_id"), lit(1.0e-5).as("edge_norm"))
    val emb = Seq((1L, Seq(2.0, 4.0))).toDF("entity_id", "vector")
    val out = EmbeddingStore.meanAggregationStep(edges, emb)
    // plan shape: the per-message path must be a flat (entity, pos) hash
    // aggregate, never array_agg of whole message vectors
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("array_agg"), plan)
    val hub = out.head()
    assert(hub.getLong(0) == 0L)
    assert(hub.getSeq[Double](1).map(x => math.abs(x)).zip(Seq(2.0e-5, 4.0e-5))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("G5c: relation-weighted step = mean(x·w_rel·norm) + x·root + bias, hand-computed") {
    import spark.implicits._
    val emb = Seq((0L, Seq(2.0, 4.0)), (1L, Seq(6.0, 8.0)), (2L, Seq(1.0, 1.0)))
      .toDF("entity_id", "vector")
    // 0 →(rel 0)→ 2 and 1 →(rel 1)→ 2, edge_norm 0.5 each; node 0 has
    // no in-edges (self-loop-only path)
    val edges = Seq((0L, 0L, 2L, 0.5), (1L, 1L, 2L, 0.5))
      .toDF("head_id", "relation_id", "tail_id", "edge_norm")
    // w: rel 0 = [1, 2], rel 1 = [3, 4]; root = [10, 20]; bias = [0.1, 0.2]
    val relW = Seq((0L, 0, 1.0), (0L, 1, 2.0), (1L, 0, 3.0), (1L, 1, 4.0))
      .toDF("relation_id", "pos", "w")
    val rootW = Seq((0, 10.0, 0.1), (1, 20.0, 0.2))
      .toDF("pos", "root_w", "bias")
    val out = EmbeddingStore.relationWeightedStep(edges, emb, relW, rootW)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // node 2: msgs pos0 = mean(2·1·0.5, 6·3·0.5) = mean(1, 9) = 5;
    //         msgs pos1 = mean(4·2·0.5, 8·4·0.5) = mean(4, 16) = 10;
    //         + self [1,1]·[10,20] + bias → [5+10+0.1, 10+20+0.2]
    assert(out(2L).zip(Seq(15.1, 30.2)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // node 0: no in-edges → 0 + [2,4]·[10,20] + bias = [20.1, 80.2]
    assert(out(0L).zip(Seq(20.1, 80.2)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // every embedded node appears (update() runs on all of x)
    assert(out.keySet == Set(0L, 1L, 2L))
  }

  test("G6: additive triplet score = sum(s) + sum(r) − sum(o)") {
    import spark.implicits._
    val ent = Seq((0L, Seq(1.0, 1.0)), (1L, Seq(2.0, 2.0))).toDF("entity_id", "vector")
    val rel = Seq((7L, Seq(0.5, 0.5))).toDF("relation_id", "vector")
    val t = Seq((0L, 7L, 1L)).toDF("head_id", "relation_id", "tail_id")
    val score = EmbeddingStore.scoreTriplets(t, ent, rel).head().getAs[Double]("score")
    assert(math.abs(score - (2.0 + 1.0 - 4.0)) < 1e-12)
  }
}
