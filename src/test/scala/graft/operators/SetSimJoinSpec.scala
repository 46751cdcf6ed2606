package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextOps

/** The prefix-filter losslessness theorem as a test: the filtered join
  * must equal the exhaustive token-set Jaccard join at the threshold.
  */
class SetSimJoinSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (1L, base),
      (2L, base),                                  // exact dup
      (3L, base.replace("theta", "iota")),         // 7/9 jaccard
      (4L, "totally different words live here now friends"),
      (5L, "alpha beta")                           // tiny subset, low jaccard
    ).toDF("doc_id", "text")
  }

  /** Exhaustive ground truth: inverted-index ALL pairs sharing any
    * token (no prefix filter, no size filter), exact Jaccard.
    */
  private def exhaustive(df: org.apache.spark.sql.DataFrame, tau: Double) = {
    val toks = df.select(col("doc_id").as("doc"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("t"))
      .where(col("t") =!= "")
    val inter = toks.join(toks.select(col("doc").as("doc2"), col("t")), Seq("t"))
      .where(col("doc") < col("doc2"))
      .groupBy(col("doc"), col("doc2")).agg(count(lit(1)).as("inter"))
    val card = toks.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    inter
      .join(card.select(col("doc"), col("n")), Seq("doc"))
      .join(card.select(col("doc").as("doc2"), col("n").as("n2")), Seq("doc2"))
      .withColumn("j", col("inter") / (col("n") + col("n2") - col("inter")))
      .where(col("j") >= tau)
      .select(col("doc").as("doc_a"), col("doc2").as("doc_b"),
        round(col("j"), 4).as("jaccard"))
  }

  test("finds exact and near dups with exact jaccard, skips unrelated docs") {
    val pairs = SetSimJoin.jaccardPrefixPairs(docs, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) == 0.7778 && pairs((2L, 3L)) == 0.7778) // 7/9
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.keySet.exists(p => p._1 == 5L || p._2 == 5L)) // 2/8 < 0.5
  }

  test("prefix filter is LOSSLESS: filtered == exhaustive on real documents") {
    val d = graft.sources.Tables.documents(spark, sf("sf0.001"))
    for (tau <- Seq(0.4, 0.6, 0.8)) {
      val got = SetSimJoin.jaccardPrefixPairs(d, "text", "doc_id", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = exhaustive(d, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want,
        s"tau=$tau: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(want.nonEmpty || tau > 0.4, s"tau=$tau ground truth empty — weak test")
    }
  }

  test("deterministic across runs and partitionings") {
    val a = SetSimJoin.jaccardPrefixPairs(docs, "text", "doc_id", 0.5)
      .collect().toSeq.map(_.toString).sorted
    val b = SetSimJoin.jaccardPrefixPairs(docs.repartition(7), "text", "doc_id", 0.5)
      .collect().toSeq.map(_.toString).sorted
    assert(a == b)
  }

  test("tau = 1.0 returns exactly the identical-token-set pairs") {
    val pairs = SetSimJoin.jaccardPrefixPairs(docs, "text", "doc_id", 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs == Set((1L, 2L, 1.0)))
  }
}
