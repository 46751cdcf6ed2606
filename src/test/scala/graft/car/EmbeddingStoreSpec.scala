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

  test("G6: additive triplet score = sum(s) + sum(r) − sum(o)") {
    import spark.implicits._
    val ent = Seq((0L, Seq(1.0, 1.0)), (1L, Seq(2.0, 2.0))).toDF("entity_id", "vector")
    val rel = Seq((7L, Seq(0.5, 0.5))).toDF("relation_id", "vector")
    val t = Seq((0L, 7L, 1L)).toDF("head_id", "relation_id", "tail_id")
    val score = EmbeddingStore.scoreTriplets(t, ent, rel).head().getAs[Double]("score")
    assert(math.abs(score - (2.0 + 1.0 - 4.0)) < 1e-12)
  }
}
