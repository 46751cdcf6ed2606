package graft.car

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8/G5/G6 — the embedding boundary (SURVEY.md §2.10, §7 hard-part d).
  *
  * The reference trains RGCN embeddings in torch and round-trips them
  * through .npz files (reference preprocess.py:75-85). The graph NN
  * itself is outside DataFrame algebra; the engine's contract is the
  * *data* side: a persistent `(entity_id, vector)` table, one
  * message-passing aggregation step expressed relationally, and the
  * triplet scoring function — so any trainer (MLlib, external) plugs in
  * by reading/writing this table.
  */
object EmbeddingStore {

  /** Persist an `(entity_id, vector)` table (replaces embedding.npz). */
  def save(embeddings: DataFrame, path: String): Unit =
    embeddings.select(col("entity_id").cast("long"), col("vector"))
      .write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** G5 — one RGCN-style mean-aggregation step as dataflow (reference
    * rgcn.py:45-125's MessagePassing with aggr='mean', minus the learned
    * weights): each node's next vector = elementwise mean of its
    * in-neighbors' vectors scaled by edge_norm.
    *
    * Flat shape: posexplode each message vector to (entity, pos, v) rows,
    * mean per (entity, pos) — a partial-aggregable hash aggregate that a
    * hub node with millions of in-edges streams through (the previous
    * array_agg form materialized ALL of a hub's message vectors in one
    * aggregation buffer and reduced them with an interpreted lambda).
    * Reassembly sorts (pos, v) structs per node; the `.value` field
    * extraction is codegen'd.
    */
  def meanAggregationStep(edges: DataFrame, embeddings: DataFrame): DataFrame =
    edges
      .join(embeddings.select(col("entity_id").as("head_id"), col("vector")), Seq("head_id"))
      .select(col("tail_id").as("entity_id"), col("edge_norm"),
        posexplode(col("vector")))
      .select(col("entity_id"), col("pos"), (col("col") * col("edge_norm")).as("mv"))
      .groupBy(col("entity_id"), col("pos"))
      .agg(avg(col("mv")).as("value"))
      .groupBy(col("entity_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("value")))).as("sv"))
      .select(col("entity_id"), col("sv.value").as("vector"))

  /** G5c — one relation-CONDITIONED propagation step: the reference's
    * RGCN message is `x_head · W_rel · edge_norm` with W_rel mixed from
    * shared bases (rgcn.py:96-110 `att`/`basis` matmul), aggregated as a
    * mean, then updated with a self-loop root transform and bias
    * (rgcn.py:112-121 `aggr_out + x·root + bias`). This is that step
    * with DIAGONAL weights — a per-relation scale vector — which keeps
    * the relation-specific transform (the machinery mean aggregation
    * lacks) while staying pure flat dataflow: every multiply is a
    * scalar against a broadcast weight row, no vector×matrix buffers.
    *
    * `relWeights(relation_id, pos, w)` is the diagonal of W_rel;
    * `rootWeights(pos, root_w, bias)` the self-loop diagonal + bias.
    * Both are model-sized (relations × dim / dim rows) and broadcast.
    * Output covers every node IN `embeddings` (the reference's update()
    * runs on all of x): nodes without in-edges get `0 + x·root + bias`,
    * exactly as aggr='mean' yields zeros for message-less nodes.
    */
  def relationWeightedStep(edges: DataFrame, embeddings: DataFrame,
      relWeights: DataFrame, rootWeights: DataFrame): DataFrame = {
    val flat = embeddings
      .select(col("entity_id"), posexplode(col("vector")))
      .select(col("entity_id"), col("pos"), col("col").as("v"))
    val msgs = edges
      .join(flat.select(col("entity_id").as("head_id"), col("pos"), col("v")),
        Seq("head_id"))
      .join(broadcast(relWeights.select(col("relation_id"), col("pos"), col("w"))),
        Seq("relation_id", "pos"))
      .select(col("tail_id").as("entity_id"), col("pos"),
        (col("v") * col("w") * col("edge_norm")).as("mv"))
      .groupBy(col("entity_id"), col("pos"))
      .agg(avg(col("mv")).as("agg"))
    flat
      .join(broadcast(rootWeights.select(col("pos"), col("root_w"), col("bias"))),
        Seq("pos"))
      .join(msgs, Seq("entity_id", "pos"), "left")
      .select(col("entity_id"), col("pos"),
        (coalesce(col("agg"), lit(0.0))
          + col("v") * col("root_w") + col("bias")).as("value"))
      .groupBy(col("entity_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("value")))).as("sv"))
      .select(col("entity_id"), col("sv.value").as("vector"))
  }

  /** G6 — the reference's "distmult"-named score, which actually computes
    * the additive sum(s + r − o) (reference rgcn.py:31-37; name quirk
    * preserved in the doc, semantics preserved in code). Decomposes to
    * sum(s) + sum(r) − sum(o), so each vector is reduced ONCE and the
    * per-triplet work is three scalar lookups — no per-triplet array
    * math at all.
    */
  def scoreTriplets(triplets: DataFrame, entityEmb: DataFrame, relationEmb: DataFrame): DataFrame = {
    def sums(df: DataFrame, idCol: String, out: String) =
      df.select(col(idCol), explode(col("vector")).as("x"))
        .groupBy(col(idCol)).agg(sum(col("x").cast("double")).as(out))
    val entSums = sums(entityEmb, "entity_id", "s")
    val relSums = sums(relationEmb, "relation_id", "r")
    triplets
      .join(entSums.select(col("entity_id").as("head_id"), col("s").as("head_sum")), Seq("head_id"))
      .join(relSums.select(col("relation_id"), col("r").as("rel_sum")), Seq("relation_id"))
      .join(entSums.select(col("entity_id").as("tail_id"), col("s").as("tail_sum")), Seq("tail_id"))
      .withColumn("score", col("head_sum") + col("rel_sum") - col("tail_sum"))
  }
}
