package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query must at least plan+execute on sf0.001; the
  * core ones must return rows. (Value-level correctness is the driver's
  * DuckDB gate, reproduced locally by tools/check.py at sf0.01.)
  */
class QueriesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  // pair-finding queries may legitimately find nothing at the smallest sf
  private val mayBeEmpty = Set(
    "dedup_ngram_jaccard", "dedup_minhash", "dedup_simhash",
    "dedup_embedding_cosine", "u4_anti_join", "sim_lsh_topk")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes on sf0.001") {
      val n = fn(spark, dir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle without query: $unknown")
  }
}
