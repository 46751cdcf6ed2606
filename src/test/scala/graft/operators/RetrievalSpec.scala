package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "durian elderberry fig"))
    .toDF("doc_id", "text")

  test("bm25TopK: tf dominance and index pruning on a hand-checked corpus") {
    val queries = Seq((10L, "apple"), (11L, "missingterm"))
      .toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(corpus, queries, k = 5).collect()
    val hits = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // query 10: docs 1 and 2 only (doc 3 shares no term); doc 1 (tf=2)
    // outranks doc 2 (tf=1, shorter) — 1.328 vs 1.114 by hand
    assert(hits.toSet == Set((10L, 1L, 1L), (10L, 2L, 2L)), hits.toSeq)
    // a query whose terms are absent retrieves nothing (inverted-index
    // probe, not a scan-and-score-zero)
    assert(!hits.exists(_._1 == 11L))
  }

  test("rrfFuse: dual-list hits outrank single-list hits; both sides' strays survive") {
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 11L, 1L), (1L, 12L, 2L))
      .toDF("query_id", "neighbor_id", "rank")
    val fused = Retrieval.rrfFuse(lex, dense, k = 5).collect()
      .sortBy(_.getLong(2)).map(r => (r.getLong(1), r.getLong(2)))
    // doc 11 appears in BOTH lists: 1/61 + 1/62 beats doc 10's 1/61 and
    // doc 12's 1/62; the single-list docs keep their relative order
    assert(fused.toSeq == Seq((11L, 1L), (10L, 2L), (12L, 3L)), fused.toSeq)
  }

  test("bm25PrfTopK: expansion reaches docs the literal query cannot; query terms never expand") {
    val corpus = Seq(
      (1L, "apple cherry cherry cherry"),          // the feedback doc
      (2L, "cherry cherry cherry durian"),         // reachable ONLY via expansion
      (3L, "unrelated tokens entirely here"))
      .toDF("doc_id", "text")
    val queries = Seq((10L, "apple")).toDF("query_id", "qtext")
    val plain = Retrieval.bm25TopK(corpus, queries, k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(plain == Set(1L), plain) // only doc 1 contains 'apple'
    // cap disabled (permille 1000): 'cherry' has df 2/3 > the default
    // 20% cap, and this test is about expansion reach, not the cap
    val prf = Retrieval.bm25PrfTopK(corpus, queries, k = 5,
      fbDocs = 1, expTerms = 1, maxDfPermille = 1000)
      .collect().map(_.getLong(1)).toSet
    // doc 1's heaviest non-query term is 'cherry' (tf 3) → doc 2 joins
    assert(prf == Set(1L, 2L), prf)
  }

  test("bm25PrfTopK: the df cap skips stopword-grade expansion terms, never original query terms") {
    // 10 docs; 'the' appears in all 10 (df 1000‰), 'rare' in 2 (200‰).
    // Feedback doc 1 has 'the' heavier than 'rare' — without the cap
    // 'the' would win the single expansion slot.
    val corpus = (
      Seq((1L, "apple the the the rare"), (2L, "rare the reachable")) ++
      (3L to 10L).map(i => (i, s"the filler$i"))).toDF("doc_id", "text")
    val queries = Seq((10L, "apple")).toDF("query_id", "qtext")
    val capped = Retrieval.bm25PrfTopK(corpus, queries, k = 10,
      fbDocs = 1, expTerms = 1, maxDfPermille = 200)
      .collect().map(_.getLong(1)).toSet
    // expansion picked 'rare' (df 2/10 = exactly the 200‰ boundary,
    // inclusive) over 'the' (df 10/10, capped) → doc 2 reachable, the
    // 'the'-only fillers are not
    assert(capped == Set(1L, 2L), capped)
    val uncapped = Retrieval.bm25PrfTopK(corpus, queries, k = 10,
      fbDocs = 1, expTerms = 1, maxDfPermille = 1000)
      .collect().map(_.getLong(1)).toSet
    // without the cap 'the' wins the slot and every doc scores
    assert(uncapped == (1L to 10L).toSet, uncapped)
  }

  test("bm25TopK: k bounds every query's result; deterministic across partitionings") {
    val docs = (1L to 60L)
      .map(i => (i, s"term${i % 7} term${i % 5} term${i % 3} filler$i"))
      .toDF("doc_id", "text")
    val queries = Seq((100L, "term1 term2"), (101L, "term3 term4"))
      .toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(docs, queries, k = 4)
    val sizes = out.groupBy(col("query_id")).count()
      .collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 4) && sizes.nonEmpty)
    val again = Retrieval.bm25TopK(docs.repartition(7), queries, k = 4)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }
}
