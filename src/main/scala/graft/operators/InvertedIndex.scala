package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + phrase search — the retrieval-side
  * complement of TextOps' BM25 scoring (which ranks by bag-of-words):
  * a phrase query needs token ADJACENCY, which only a positional
  * index answers without rescanning documents.
  *
  * Scale shape: the index is one explode (rows ∝ corpus tokens),
  * built once and reusable (store partitioned/bucketed by token so a
  * query's token lookups prune to their buckets). A k-word phrase is
  * k−1 self-equi-joins on (doc, pos+i) — but each side is first
  * FILTERED to one query token, so the joined frames are
  * posting-list-sized, never corpus-sized; the filters sit directly
  * on the token column and push into the index scan.
  */
object InvertedIndex {

  /** (id, pos, token) for every token occurrence; single-space
    * tokenization (the corpus interchange format's contract — swap the
    * delimiter for other corpora).
    */
  def positional(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), " ", -1)).as(Seq("pos", "token")))
      .where(col("token") =!= "")

  /** Every phrase occurrence as (id, start_pos). `index` is a frame
    * shaped like [[positional]]'s output.
    */
  def phraseMatches(index: DataFrame, idCol: String, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val head = index.where(col("token") === phrase.head)
      .select(col(idCol), col("pos").as("start_pos"))
    phrase.zipWithIndex.drop(1).foldLeft(head) { case (acc, (tok, i)) =>
      val next = index.where(col("token") === tok)
        .select(col(idCol), col("pos"))
      acc.join(next, Seq(idCol))
        .where(col("pos") === col("start_pos") + i)
        .select(col(idCol), col("start_pos"))
    }
  }
}
