package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpaceTokenStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String): (Long, Long, Long) = {
    val r = Seq(Tuple1(text)).toDF("t")
      .select(TextOps.spaceTokenStats(col("t")).as("s"))
      .select(col("s.n_tokens"), col("s.n_stop"), col("s.n_vowels"))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("fields equal the declarative split/filter/regex formulation") {
    val texts = Seq(
      "the quick brown fox jumps over a lazy dog",
      "a", "the", "", " ", "  ", "a  the", " the a ",
      "no stopwords here", "THE A the a tHe",
      "punctuation, the: a; end.")
    val byExpr = texts.map(stats)
    val byFns = texts.map { t =>
      val toks = split(col("t"), " ")
      val r = Seq(Tuple1(t)).toDF("t").select(
        size(toks).cast("long"),
        size(filter(toks, x => x.isin("the", "a"))).cast("long"),
        (length(col("t")) -
          length(regexp_replace(col("t"), "[aeiou]", ""))).cast("long"))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(byExpr == byFns)
  }

  test("hand-checked values: empty segments count as tokens, case-sensitive stopwords") {
    assert(stats("the quick a") == (3L, 2L, 4L)) // vowels: e, u, i, a
    assert(stats("") == (1L, 0L, 0L))        // one empty token, not a stopword
    assert(stats(" ") == (2L, 0L, 0L))       // two empty segments
    assert(stats("a  a") == (3L, 2L, 2L))    // middle empty segment
    assert(stats("THE A") == (2L, 0L, 0L))   // byte-exact: no lowercase vowels, no stopword match
  }

  test("multibyte text: vowel/byte counting stays exact in UTF-8") {
    // 'ü'/'é' are multibyte; their continuation bytes must not be
    // miscounted as ASCII vowels or spaces. ASCII vowels here: the 'e'
    // of Grüße, the 'e' of the, the 'a' of café, the bare 'a' — é and ü
    // are not [aeiou] and count zero.
    assert(stats("Grüße the café a") == (4L, 2L, 4L))
  }

  test("null propagates") {
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(TextOps.spaceTokenStats(col("t")).as("s")).head()
    assert(r.isNullAt(0))
  }
}
