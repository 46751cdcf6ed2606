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
    }),

    // The trainer's ROUND-1 statistics, hash-gated: the top-20
    // count-weighted adjacent character pairs over the word dictionary
    // — exactly what the loop's first argmin selects from (BpeSpec pins
    // train(…,1).head == this table's top row), so the selection rule
    // is oracle-checked even though rounds 2+ stay sequential by
    // design.
    "bpe_pair_stats" -> ((s, dir) => {
      BpeTrainer.pairStats(Tables.documents(s, dir), "text")
        .orderBy(col("pair_count").desc, col("left").asc, col("right").asc)
        .limit(20)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "bpe_pair_stats" ->
      """WITH w AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
             SELECT unnest(string_split(text, ' ')) AS word FROM documents)
           WHERE word <> '' GROUP BY word
           ORDER BY cnt DESC, word ASC LIMIT 65536),
         p AS (SELECT substring(word, CAST(i AS INT), 1) AS l,
                 substring(word, CAST(i AS INT) + 1, 1) AS r, cnt
               FROM (SELECT word, cnt,
                       unnest(generate_series(1, length(word) - 1)) AS i
                     FROM w WHERE length(word) >= 2))
         SELECT l AS "left", r AS "right",
                CAST(sum(cnt) AS BIGINT) AS pair_count
         FROM p GROUP BY 1, 2
         ORDER BY pair_count DESC, "left" ASC, "right" ASC LIMIT 20"""
  )
}
