package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(round(TextOps.jaroWinkler(col("a"), col("b")), 4))
      .head().getDouble(0)

  test("textbook values and edge cases match the reference engines") {
    assert(jw("MARTHA", "MARHTA") == 0.9611)
    assert(jw("DIXON", "DICKSONX") == 0.8133)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8963) // no prefix → no boost
    assert(jw("ABCD", "ACBD") == 0.925)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("", "") == 0.0)   // the duckdb convention, not 1
    assert(jw("a", "b") == 0.0)
    assert(jw("AB", "BA") == 0.0) // window 0: position-only matching
    // odd half-transposition count floors (Winkler's reference):
    // "hot ring"/"large ring" has 5 out-of-order matches → t = 2
    assert(jw("hot ring", "large ring") == 0.575)
  }

  test("boost applies only above 0.7 and caps the prefix at 4") {
    // CRATE/TRACE: jaro 0.7333 > 0.7 but prefix 0 → unchanged
    assert(jw("CRATE", "TRACE") == 0.7333)
    // long shared prefix: boost uses at most 4 chars
    val j = jw("PREFIXES", "PREFIXED")
    // jaro = (7/8 + 7/8 + 7/7)/3 = 0.9167; jw = 0.9167 + 4·0.1·0.0833
    assert(j == 0.95)
  }

  test("null propagates; non-string input rejected at analysis") {
    val out = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(TextOps.jaroWinkler(col("a"), col("b"))).head()
    assert(out.isNullAt(0))
    intercept[Exception] {
      Seq((1L, "x")).toDF("a", "b")
        .select(TextOps.jaroWinkler(col("a"), col("b"))).collect()
    }
  }
}
