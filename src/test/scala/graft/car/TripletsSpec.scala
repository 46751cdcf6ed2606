package graft.car

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** G1-G4, R3-R7, A11 — triplet construction and sampling invariants. */
class TripletsSpec extends SparkSpec {

  private def attrs = Seq("brand", "color", "oiltype")

  test("G2: all ordered pairs i≠j → k(k−1) triplets per distinct row") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L), (4L, 5L, 6L))
      .toDF("brand", "color", "oiltype")
    val t = Triplets.fromRows(df, attrs)
    assert(t.count() == 2 * 3 * 2) // 2 rows × k(k−1)=6
    assert(t.select("relation").distinct().count() == 3)
  }

  test("G3: upper-triangle variant halves the pairs (quirk X2)") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L)).toDF("brand", "color", "oiltype")
    val all = Triplets.fromRows(df, attrs)
    val upper = Triplets.fromRows(df, attrs, upperTriangleOnly = true)
    assert(all.count() == 6 && upper.count() == 3)
    // upper pairs follow column position order
    assert(upper.where(col("head_entity").startsWith("color:")
      && col("tail_entity").startsWith("brand:")).count() == 0)
  }

  test("G2: duplicate rows dedup to one triplet set (set semantics)") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L), (1L, 2L, 3L)).toDF("brand", "color", "oiltype")
    assert(Triplets.fromRows(df, attrs).count() == 6)
  }

  test("encode + R6 bidirectional + A11 edge norm") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L), (1L, 2L, 9L)).toDF("brand", "color", "oiltype")
    val t = Triplets.fromRows(df, attrs)
    val entityVocab = t.select(col("head_entity").as("entity"))
      .union(t.select(col("tail_entity"))).distinct()
      .withColumn("id", dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("entity")).cast("long") - 1)
    val relVocab = t.select(col("relation")).distinct()
      .withColumn("id", dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("relation")).cast("long") - 1)
    val enc = Triplets.encode(t, entityVocab, relVocab)
    assert(enc.count() == t.count())
    val bi = Triplets.bidirectional(enc)
    assert(bi.count() == 2 * enc.count())
    val normed = Triplets.edgeNorm(enc)
    // every (head, relation) group's norm = 1/degree
    val bad = normed.groupBy("head_id", "relation_id")
      .agg(count(lit(1)).as("deg"), first("edge_norm").as("norm"))
      .where(abs(col("norm") - lit(1.0) / col("deg")) > 1e-12)
    assert(bad.count() == 0)
  }

  test("R4: negative sampling tiles positives ×rate with valid corrupt ids") {
    import spark.implicits._
    val edges = Seq((0L, 0L, 1L), (2L, 1L, 3L)).toDF("head_id", "relation_id", "tail_id")
    val out = Triplets.negativeSample(edges, numEntities = 10, rate = 3)
    assert(out.where(col("label") === 1).count() == 2)
    assert(out.where(col("label") === 0).count() == 6)
    val ids = out.select("head_id").union(out.select("tail_id"))
      .collect().map(_.getLong(0))
    assert(ids.forall(id => id >= 0 && id < 10))
  }

  test("R3/R7: sampling and structure/supervision split are well-formed") {
    import spark.implicits._
    val edges = spark.range(1000).select(
      (col("id") % 97).as("head_id"), (col("id") % 5).as("relation_id"),
      (col("id") % 89).as("tail_id"))
    val sampled = Triplets.sampleEdges(edges, 0.3)
    assert(sampled.count() > 150 && sampled.count() < 450)
    val (structure, supervision) = Triplets.structureSupervisionSplit(edges)
    assert(structure.count() + supervision.count() == 1000)
  }
}
