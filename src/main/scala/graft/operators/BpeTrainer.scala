package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** BPE tokenizer training + encoding over a distributed corpus — the
  * real version of TextOps' "BPE-ish" regex token count: learn the
  * merge table from corpus statistics (Sennrich et al., ACL'16), then
  * tokenize documents with it.
  *
  * Scale shape — the standard production split: the 100 TB part is ONE
  * distributed pass (explode → word hash-aggregate → top-`maxWords`
  * TakeOrdered); the merge loop then runs on the collected
  * word-FREQUENCY dictionary, which is vocabulary-sized (bounded by
  * `maxWords`, the same bounded-collect discipline as `Vocab`'s JSON
  * artifact) — this is exactly how practical BPE trainers work, because
  * pair statistics are a pure function of word counts, not of the
  * corpus layout. Encoding is distributed again: a broadcast rank
  * table + per-partition word→tokens memo (each distinct word encodes
  * once per partition, not once per occurrence).
  *
  * Determinism: ties in pair frequency break lexicographically on
  * (left, right); word-count ties in the `maxWords` cap break on the
  * word — same merges on any partitioning, retry, or engine.
  */
object BpeTrainer {

  /** One distributed pass: whitespace words → counts → top `maxWords`
    * by (count desc, word asc). The only corpus-sized stage.
    */
  def wordCounts(df: DataFrame, textCol: String, maxWords: Int): DataFrame =
    df.select(explode(split(col(textCol), " ", -1)).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)

  /** First-round adjacent-pair statistics as a DISTRIBUTED frame —
    * exactly the `pairCounts` the merge loop's round 1 builds from the
    * word dictionary (count-weighted adjacent character pairs), but as
    * dataflow, so the DuckDB oracle can hash-check them and BpeSpec can
    * pin `train(…, 1).head == argmin by (−count, left, right)` of this
    * table: the trainer's selection rule is thereby gated by the exact
    * oracle even though the multi-round loop itself is sequential by
    * design (each round's statistics depend on the previous merge).
    */
  def pairStats(df: DataFrame, textCol: String,
      maxWords: Int = 1 << 16): DataFrame =
    wordCounts(df, textCol, maxWords)
      .where(length(col("word")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, length(word) - 1),
           i -> struct(substring(word, i, 1) AS l,
                       substring(word, i + 1, 1) AS r))""")).as("p"),
        col("cnt"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("cnt")).as("pair_count"))

  /** Learn up to `numMerges` merges from the corpus. Stops early when
    * no adjacent pair remains (every word fully merged).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 1 << 16): Seq[(String, String)] = {
    val counts = wordCounts(df, textCol, maxWords).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromCounts(counts, numMerges)
  }

  /** The merge loop on a word-frequency dictionary (driver-side by
    * design — see the scaladoc above). Exposed for tests and for
    * callers that already hold counts.
    */
  def trainFromCounts(counts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"need numMerges >= 0; got $numMerges")
    var words: Array[(Array[String], Long)] =
      counts.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(p => Some(p.getOrElse(0L) + c))
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words = words.map { case (syms, c) => (mergeAll(syms, best), c) }
      }
    }
    merges.toSeq
  }

  /** Merge every (left-to-right, non-overlapping) occurrence of `pair`. */
  private def mergeAll(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Greedy rank-order encoding of one word: repeatedly merge the
    * lowest-rank adjacent pair (all its occurrences, left to right)
    * until none applies — the standard BPE inference rule, guaranteed
    * lossless (`tokens.mkString == word`, pinned in BpeSpec).
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else syms = mergeAll(syms, bestPair)
    }
    syms
  }

  /** Distributed encoding: broadcast rank table, per-partition
    * word→tokens memo. Returns (idCol, tokens array<string>).
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val toks = text.split(" ").iterator.filter(_.nonEmpty)
            .flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, ranks)))
            .toArray
          (id, toks)
        }
      }.toDF(idCol, "tokens")
  }

  /** The merge loop's FULL state trajectory as a frame: (round, word,
    * cnt, s) for rounds 0..numMerges, where `s` is the word's symbol
    * sequence after `round` merges in the chr(30)-sentinel encoding the
    * SQL replay uses (chr(30) ‖ sym ‖ chr(30)chr(30) ‖ sym … ‖ chr(30)).
    *
    * This is what makes the SEQUENTIAL merge loop exactly auditable by
    * a parallel engine: round k's merge is the argmax of pair counts
    * over state k−1, and state k is one replace() away from state k−1 —
    * so with the trajectory materialized, every round is re-derivable
    * from the PREVIOUS round's dumped rows, all rounds in parallel (the
    * same dumped-artifact technique the quantizer/codebook kernels
    * use). The table is vocabulary-bounded (≤ (numMerges+1)·maxWords
    * rows), never corpus-sized.
    */
  def dictStatesDF(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 1 << 16): DataFrame = {
    require(numMerges >= 0, s"need numMerges >= 0; got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = wordCounts(df, textCol, maxWords).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    def enc(syms: Array[String]): String =
      syms.mkString("\u001e", "\u001e\u001e", "\u001e")
    var words: Array[(String, Array[String], Long)] =
      counts.map { case (w, c) => (w, w.map(_.toString).toArray, c) }.toArray
    val states = mutable.ArrayBuffer.empty[(Int, String, Long, String)]
    words.foreach { case (w, syms, c) => states += ((0, w, c, enc(syms))) }
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      for ((_, syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(p => Some(p.getOrElse(0L) + c))
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        words = words.map { case (w, syms, c) => (w, mergeAll(syms, best), c) }
        round += 1
        words.foreach { case (w, syms, c) => states += ((round, w, c, enc(syms))) }
      }
    }
    states.toSeq.toDF("round", "word", "cnt", "s")
  }

  /** The learned merge table as a frame: (rank, left, right). */
  def mergesDF(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 1 << 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, numMerges, maxWords).zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
  }
}
