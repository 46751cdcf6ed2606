package graft.operators

import graft.SparkSpec

import scala.collection.mutable

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference BPE: operates on the corpus as a flat
    * multiset of word occurrences (no frequency dictionary), merging
    * string-wise — different code path from the operator's dict loop.
    */
  private def referenceBpe(corpusWords: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var occurrences: Seq[Vector[String]] = corpusWords.map(_.map(_.toString).toVector)
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (merges.size < numMerges && !stop) {
      val pc = mutable.HashMap.empty[(String, String), Long]
      for (w <- occurrences; Seq(a, b) <- w.sliding(2) if w.size > 1)
        pc.updateWith((a, b))(p => Some(p.getOrElse(0L) + 1))
      if (pc.isEmpty) stop = true
      else {
        val best = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        occurrences = occurrences.map { w =>
          val out = mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < w.size) {
            if (i + 1 < w.size && w(i) == best._1 && w(i + 1) == best._2) {
              out += w(i) + w(i + 1); i += 2
            } else { out += w(i); i += 1 }
          }
          out.toVector
        }
      }
    }
    merges.toSeq
  }

  private val corpus = Seq(
    "low low low low low lower lower newest newest newest newest newest newest",
    "widest widest widest new new new lowest",
    "low lower lowest newest wide wider widest")

  test("train ≡ flat-multiset reference BPE") {
    val got = BpeTrainer.train(corpus.toDF("text"), "text", numMerges = 30)
    val want = referenceBpe(corpus.flatMap(_.split(" ")), 30)
    assert(got === want)
  }

  test("train is deterministic and stops when pairs are exhausted") {
    val df = corpus.toDF("text")
    val a = BpeTrainer.train(df, "text", 500)
    val b = BpeTrainer.train(df, "text", 500)
    assert(a === b)
    // 500 merges cannot exceed total distinct-pair supply of this corpus
    assert(a.size < 500)
    // once exhausted, every corpus word must encode to a single token
    val ranks = a.zipWithIndex.toMap
    corpus.flatMap(_.split(" ")).distinct.foreach { w =>
      assert(BpeTrainer.encodeWord(w, ranks).length == 1, s"word $w not fully merged")
    }
  }

  test("encode is lossless: tokens concatenate back to the word") {
    val merges = BpeTrainer.train(corpus.toDF("text"), "text", 10)
    val ranks = merges.zipWithIndex.toMap
    val words = corpus.flatMap(_.split(" ")).distinct ++ Seq("unseen", "zzz", "l")
    words.foreach { w =>
      assert(BpeTrainer.encodeWord(w, ranks).mkString === w)
    }
  }

  test("greedy rank encoding ≡ sequential merge replay on corpus words") {
    val merges = BpeTrainer.train(corpus.toDF("text"), "text", 10)
    val ranks = merges.zipWithIndex.toMap
    def replay(w: String): Seq[String] = {
      var syms: Seq[String] = w.map(_.toString)
      for ((l, r) <- merges) {
        val out = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms
    }
    corpus.flatMap(_.split(" ")).distinct.foreach { w =>
      assert(BpeTrainer.encodeWord(w, ranks).toSeq === replay(w), s"word $w")
    }
  }

  test("distributed encode matches encodeWord and memoizes per partition") {
    val merges = BpeTrainer.train(corpus.toDF("text"), "text", 10)
    val ranks = merges.zipWithIndex.toMap
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(3)
    val got = BpeTrainer.encode(docs, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      val want = t.split(" ").filter(_.nonEmpty)
        .flatMap(w => BpeTrainer.encodeWord(w, ranks)).toSeq
      assert(got(i.toLong) === want)
    }
  }

  test("wordCounts caps at maxWords by (count desc, word asc)") {
    val df = Seq("b b b a a c", "a d").toDF("text")
    val top = BpeTrainer.wordCounts(df, "text", 2)
      .as[(String, Long)].collect().toSeq
    assert(top === Seq(("a", 3L), ("b", 3L)))
  }

  test("dictStatesDF trajectory is consistent with the trainer's merges") {
    val df = Seq("abab abc", "abab xy", "low lower lowest").toDF("text")
    val n = 6
    val states = BpeTrainer.dictStatesDF(df, "text", n).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getString(3)))
    val counts = BpeTrainer.wordCounts(df, "text", 1 << 16)
      .as[(String, Long)].collect().toSeq
    val merges = BpeTrainer.trainFromCounts(counts, n)
    val nRounds = states.map(_._1).max
    assert(nRounds == merges.size, s"rounds $nRounds vs merges ${merges.size}")
    // round 0 is the init char encoding; round k applies merge k to
    // round k-1 — exactly what encodeWord under the rank prefix gives
    val sep = "\u001e"
    for ((word, _) <- counts; k <- 0 to nRounds) {
      val expect = {
        var syms = word.map(_.toString).toArray
        for (m <- merges.take(k)) {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == m._1 && syms(i + 1) == m._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toArray
        }
        syms.mkString(sep, sep + sep, sep)
      }
      val got = states.find(s => s._1 == k && s._2 == word).get._4
      assert(got == expect, s"word=$word round=$k")
    }
    // every round's state count equals the dictionary size
    assert(states.groupBy(_._1).values.forall(_.length == counts.size))
  }

  test("pairStats top row IS the trainer's first merge (the gated rule)") {
    val df = Seq("abab abc", "abab xy", "abab").toDF("text")
    val stats = BpeTrainer.pairStats(df, "text")
      .orderBy(org.apache.spark.sql.functions.col("pair_count").desc,
        org.apache.spark.sql.functions.col("left").asc,
        org.apache.spark.sql.functions.col("right").asc)
      .collect()
    // 'abab' ×3: pairs ab×2,ba×1 each; 'abc': ab,bc; 'xy': xy →
    // (a,b) 7, (b,a) 3, then singles
    assert(stats.head.getString(0) == "a" && stats.head.getString(1) == "b")
    assert(stats.head.getLong(2) == 7L)
    val counts = BpeTrainer.wordCounts(df, "text", 1 << 16)
      .as[(String, Long)].collect().toSeq
    val firstMerge = BpeTrainer.trainFromCounts(counts, 1).head
    assert(firstMerge == (stats.head.getString(0), stats.head.getString(1)))
  }
}
