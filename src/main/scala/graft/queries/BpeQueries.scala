package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.BpeTrainer
import graft.sources.Tables

/** BPE tokenizer training + application over the documents corpus.
  * Not SQL-expressible (the merge loop is iterative), so both queries
  * are rows-only — but fully deterministic (lexicographic tie-breaks
  * end to end), and BpeSpec pins the trainer against an independent
  * flat-multiset reference implementation.
  */
object BpeQueries {

  private val NumMerges = 200

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The learned merge table: one distributed word-count pass + the
    // vocabulary-sized driver merge loop.
    "bpe_train" -> ((s, dir) => {
      BpeTrainer.mergesDF(Tables.documents(s, dir), "text", NumMerges)
    }),

    // Tokenize the corpus with the learned merges; per-document token
    // count (scalar output — rows-only-checker-safe by design).
    "bpe_encode" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = BpeTrainer.train(docs, "text", NumMerges)
      BpeTrainer.encode(docs, "doc_id", "text", merges)
        .select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens"))
    })
  )

  def oracleSql: Map[String, String] = Map.empty
}
