package graft.operators

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the quick brown dog"),
    (2L, "quick brown quick brown quick"),
    (3L, "brown quick"),
    (4L, "")
  ).toDF("doc_id", "text")

  private def index = InvertedIndex.positional(docs, "doc_id", "text")

  test("positional index records every occurrence with its offset") {
    val quick = index.where($"token" === "quick")
      .as[(Long, Int, String)].collect().map(r => (r._1, r._2)).toSet
    assert(quick === Set((1L, 1), (1L, 7), (2L, 0), (2L, 2), (2L, 4), (3L, 1)))
  }

  test("two-word phrase matches adjacency only") {
    val m = InvertedIndex.phraseMatches(index, "doc_id", Seq("quick", "brown"))
      .as[(Long, Int)].collect().toSet
    assert(m === Set((1L, 1), (1L, 7), (2L, 0), (2L, 2)))
  }

  test("three-word phrase chains the position joins") {
    val m = InvertedIndex.phraseMatches(index, "doc_id", Seq("quick", "brown", "fox"))
      .as[(Long, Int)].collect().toSet
    assert(m === Set((1L, 1)))
  }

  test("overlapping occurrences all match") {
    val m = InvertedIndex.phraseMatches(index, "doc_id", Seq("quick", "brown", "quick"))
      .as[(Long, Int)].collect().toSet
    assert(m === Set((2L, 0), (2L, 2)))
  }

  test("single-word phrase degenerates to the posting list") {
    val m = InvertedIndex.phraseMatches(index, "doc_id", Seq("fox"))
      .as[(Long, Int)].collect().toSet
    assert(m === Set((1L, 3)))
  }

  test("stored token-bucketed index: phrase query PRUNES buckets and matches inline") {
    Layout.writeBucketed(index, "phrase_idx", "token", 8)
    // autoBucketedScan drops the bucketed read (and with it, bucket
    // PRUNING) when no join/agg needs the token distribution — but the
    // pruning is exactly what the posting-list lookup wants; a real
    // deployment of this index pins the same conf
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val stored = spark.table("phrase_idx")
      val m = InvertedIndex.phraseMatches(stored, "doc_id", Seq("quick", "brown"))
      assert(m.as[(Long, Int)].collect().toSet ===
        Set((1L, 1), (1L, 7), (2L, 0), (2L, 2)))
      // each posting-list scan carries its token equality into bucket
      // pruning — the stored-index analogue of the ANN probed-cell scan
      val plan = m.queryExecution.executedPlan.toString
      val re = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val hits = re.findAllMatchIn(plan).toSeq
      assert(hits.nonEmpty, s"no bucket pruning in:\n$plan")
      hits.foreach(h =>
        assert(h.group(1).toInt < h.group(2).toInt, s"unpruned scan in:\n$plan"))
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
      spark.sql("DROP TABLE IF EXISTS phrase_idx")
    }
  }
}
