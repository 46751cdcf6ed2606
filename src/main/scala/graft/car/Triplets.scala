package graft.car

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G1-G4 + R3-R7 + A11 — knowledge-graph triplet construction and
  * sampling (reference utils.py:132-209, samples.py, graph.py).
  *
  * The reference loops over rows in Python and dedups in a driver-side
  * set — O(rows·k²) hash inserts on one machine. Here each row's discrete
  * attributes become an array of structs exploded twice; the ×k² blow-up
  * happens inside executors and the dedup is a distributed hash
  * aggregate, so 100 TB × 22² distributes instead of OOMing a driver.
  */
object Triplets {

  /** Attribute pairs per row → string triplets. `upperTriangleOnly`
    * reproduces the dev-graph asymmetry (quirk X2: train gets all i≠j
    * ordered pairs, reference utils.py:163-182; dev only j>i,
    * utils.py:184-202 — pair order = position in `columns`).
    */
  def fromRows(df: DataFrame, columns: Seq[String],
      upperTriangleOnly: Boolean = false): DataFrame = {
    val attrs = array(columns.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("pos"), lit(c).as("name"), col(c).cast("string").as("value"))
    }: _*)
    val pairFilter =
      if (upperTriangleOnly) col("h.pos") < col("t.pos")
      else col("h.pos") =!= col("t.pos")
    df.select(explode(attrs).as("h"), attrs.as("attrs"))
      .select(col("h"), explode(col("attrs")).as("t"))
      .where(pairFilter && col("h.value").isNotNull && col("t.value").isNotNull)
      .select(
        concat(col("h.name"), lit(":"), col("h.value")).as("head_entity"),
        col("t.name").as("relation"),
        concat(col("t.name"), lit(":"), col("t.value")).as("tail_entity"))
      .dropDuplicates("head_entity", "relation", "tail_entity")
  }

  /** Encode string triplets to dense ids against entity/relation vocabs
    * (reference utils.py:144-153; persistable as parquet, S5/G4).
    */
  def encode(triplets: DataFrame, entityVocab: DataFrame, relationVocab: DataFrame): DataFrame =
    triplets
      .join(broadcast(entityVocab.select(col("entity").as("head_entity"), col("id").as("head_id"))), "head_entity")
      .join(broadcast(entityVocab.select(col("entity").as("tail_entity"), col("id").as("tail_id"))), "tail_entity")
      .join(broadcast(relationVocab.select(col("relation"), col("id").as("relation_id"))), "relation")
      .select("head_id", "relation_id", "tail_id")

  /** R6 — bidirectional expansion (reference samples.py:62-64): reverse
    * edges reuse the same relation id, like the reference (its one-hot is
    * over 2·num_relations only inside the GNN, graph.py:39).
    */
  def bidirectional(edges: DataFrame): DataFrame =
    edges.unionByName(edges.select(
      col("tail_id").as("head_id"), col("relation_id"),
      col("head_id").as("tail_id")))

  /** A11 — per-(node, relation) out-degree and 1/degree edge norm
    * (reference graph.py:30-43's scatter_add as a groupBy + join).
    */
  def edgeNorm(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("head_id"), col("relation_id"))
      .agg(count(lit(1)).as("degree"))
    edges.join(deg, Seq("head_id", "relation_id"))
      .withColumn("edge_norm", lit(1.0) / col("degree"))
  }

  /** R3 — uniform edge sample without replacement (reference
    * samples.py:15-18). Spark's Bernoulli sample is the distributed
    * equivalent (exact-size sampling requires a global sort; the GNN
    * consumer only needs an approximate batch).
    */
  def sampleEdges(edges: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    edges.sample(withReplacement = false, fraction, seed)

  /** R4 — negative sampling by entity corruption (reference
    * samples.py:19-32): each positive is tiled `rate` times; head or tail
    * (chosen by a hash bit, the reference uses p>0.5) is replaced with a
    * hash-picked entity id. Seed-fixed hashes keep it deterministic
    * across executors/retries where rand() would not be.
    */
  def negativeSample(edges: DataFrame, numEntities: Long, rate: Int,
      seed: Long = 0L): DataFrame = {
    val tiled = edges.withColumn("rep", explode(array((0 until rate).map(lit): _*)))
    val h = xxhash64(col("head_id"), col("relation_id"), col("tail_id"),
      col("rep"), lit(seed))
    // Decorrelated draws: taking both the head/tail coin AND the entity
    // from the same hash would tie their parities whenever numEntities is
    // even (corrupted heads only ever even ids, tails only odd) — rehash
    // for the entity so the two draws are independent like the
    // reference's separate rand() calls.
    val corruptEntity = pmod(xxhash64(h, lit(1)), lit(numEntities))
    val corruptHead = pmod(h, lit(2)) === 0
    tiled.select(
      when(corruptHead, corruptEntity).otherwise(col("head_id")).as("head_id"),
      col("relation_id"),
      when(!corruptHead, corruptEntity).otherwise(col("tail_id")).as("tail_id"),
      lit(0).as("label"))
      .unionByName(edges.select(col("head_id"), col("relation_id"),
        col("tail_id"), lit(1).as("label")))
  }

  /** R7 — split sampled edges into message-passing half vs supervision
    * half (reference samples.py:52-60).
    */
  def structureSupervisionSplit(edges: DataFrame, seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(structure, supervision) = edges.randomSplit(Array(0.5, 0.5), seed)
    (structure, supervision)
  }
}
