package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RakeSpec extends SparkSpec {
  import spark.implicits._

  test("keywordScores: textbook degree/frequency arithmetic") {
    // doc: "deep learning the deep model" with stopword 'the' →
    // phrases: "deep learning" (len 2), "deep model" (len 2)
    // deg: deep 4, learning 2, model 2; freq: deep 2, others 1
    // scores: deep 2e6, learning 2e6, model 2e6 → each phrase 4e6
    val docs = Seq((1L, "deep learning the deep model")).toDF("id", "text")
    val out = Rake.keywordScores(docs, "id", "text", Seq("the"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      "deep learning" -> ((1L, 2L, 4000000L)),
      "deep model" -> ((1L, 2L, 4000000L))))
  }

  test("keywordScores: long phrases outrank their parts; repeats count") {
    // "big data" twice and "big data pipeline" once, 'a' separates
    val docs = Seq((1L, "big data a big data pipeline a big data"))
      .toDF("id", "text")
    val out = Rake.keywordScores(docs, "id", "text", Seq("a"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3))).toMap
    // deg: big 7 (2+3+2), data 7, pipeline 3; freq: big 3, data 3,
    // pipeline 1 → scores big = data = 7e6/3 = 2333333, pipeline 3e6
    val wordScore = 7000000L / 3L
    assert(out("big data") == ((2L, 2 * wordScore)))
    assert(out("big data pipeline") == ((1L, 2 * wordScore + 3000000L)))
    // the 3-word phrase outranks the 2-word one (RAKE's long-phrase bias)
    assert(out("big data pipeline")._2 > out("big data")._2)
  }

  test("keywordScores: empty tokens break phrases; order-invariant") {
    val docs = Seq((1L, "x  y"), (2L, "x y")).toDF("id", "text")
    // doc 1's double space yields an empty token → "x" and "y" separate;
    // doc 2 yields phrase "x y"
    val out = Rake.keywordScores(docs, "id", "text", Seq("zz"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("x", "y", "x y"))
    val a = Rake.keywordScores(docs.repartition(3), "id", "text", Seq("zz"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val b = Rake.keywordScores(docs, "id", "text", Seq("zz"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a == b)
  }
}
