package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DictTagSpec extends SparkSpec {
  import spark.implicits._

  private val dict = Seq(
    "perf" -> "slow",
    "perf" -> "slow scan",
    "joins" -> "hash join")

  test("unigram and bigram hits count per occurrence, rolled to category") {
    val docs = Seq(
      (1L, "slow scan beats slow loop"),
      (2L, "hash join hash join"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val out = DictTag.tag(docs, "text", "doc_id", dict)
      .select("doc_id", "category", "n_hits")
      .as[(Long, String, Long)].collect().toSet
    // doc 1: "slow"×2 + "slow scan"×1 → perf=3; doc 2: "hash join"×2
    assert(out == Set((1L, "perf", 3L), (2L, "joins", 2L)))
  }

  test("overlapping bigram occurrences all count (slow slow slow)") {
    val docs = Seq((1L, "slow slow slow")).toDF("doc_id", "text")
    val out = DictTag.tag(docs, "text", "doc_id",
      Seq("x" -> "slow slow")).as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "x", 2L)))
  }

  test("one-token docs produce no bigram stream and no errors") {
    val docs = Seq((1L, "slow"), (2L, "")).toDF("doc_id", "text")
    val out = DictTag.tag(docs, "text", "doc_id", dict)
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "perf", 1L)))
  }

  test("screen keeps no-hit docs and gates on blocked categories") {
    val docs = Seq(
      (1L, "slow scan"), (2L, "hash join"), (3L, "clean text"))
      .toDF("doc_id", "text")
    val out = DictTag.screen(docs, "text", "doc_id", dict,
      blockCategories = Set("perf"), maxHits = 0L)
      .select("doc_id", "blocked_hits", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set((1L, 2L, false), (2L, 0L, true), (3L, 0L, true)))
  }

  test("rejects phrases longer than two tokens") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      DictTag.tag(docs, "text", "doc_id", Seq("x" -> "a b c"))
    }
  }

  test("the taxonomy_tag plan joins broadcast and shuffles once") {
    val docs = Seq((1L, "slow scan hash join")).toDF("doc_id", "text")
    val plan = DictTag.tag(docs, "text", "doc_id", dict)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dict join not broadcast:\n$plan")
  }
}
