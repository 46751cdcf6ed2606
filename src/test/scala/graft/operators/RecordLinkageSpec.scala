package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import RecordLinkage.FieldComparison

class RecordLinkageSpec extends SparkSpec {

  private def comparisons = Seq(
    FieldComparison("name", col("a_name") === col("b_name"),
      BigDecimal("4.0"), BigDecimal("-2.0")),
    FieldComparison("city", col("a_city") === col("b_city"),
      BigDecimal("2.5"), BigDecimal("-1.5")),
    FieldComparison("year", abs(col("a_year") - col("b_year")) <= 1,
      BigDecimal("1.5"), BigDecimal("-1.0")))

  private def left = {
    import spark.implicits._
    Seq((1L, "k", "ada", "paris", 1990),
        (2L, "k", "bob", "lyon", 1985),
        (3L, "m", "cat", "nice", 2000)).toDF("id", "blk", "name", "city", "year")
  }
  private def right = {
    import spark.implicits._
    Seq((11L, "k", "ada", "paris", 1991),  // strong match with 1
        (12L, "k", "bob", "paris", 1970),  // partial with 2
        (13L, "z", "cat", "nice", 2000))   // different block: never paired
      .toDF("id", "blk", "name", "city", "year")
  }

  test("exact decimal scores, Fellegi-Sunter decisions, blocking bounds pairs") {
    val got = RecordLinkage.linkScoredPairs(left, right, "id", "blk",
      comparisons, matchThreshold = BigDecimal("5.0"),
      possibleThreshold = BigDecimal("0.0"))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[java.math.BigDecimal]("score").toPlainString,
          r.getAs[String]("decision"))).toMap
    // block 'k': 2 left × 2 right = 4 pairs; block 'm'/'z' never join
    assert(got.size == 4)
    assert(got((1L, 11L)) == ("8.000000", "match"))       // 4 + 2.5 + 1.5
    assert(got((2L, 12L)) == ("1.500000", "possible"))    // 4 - 1.5 - 1.0
    assert(got((1L, 12L)) == ("-0.500000", "non_match"))  // -2 + 2.5 - 1
    assert(got((2L, 11L)) == ("-4.500000", "non_match"))  // -2 - 1.5 - 1
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 13L))
  }

  test("agreement flags are exposed per field") {
    val r = RecordLinkage.linkScoredPairs(left, right, "id", "blk",
      comparisons, BigDecimal("5.0"), BigDecimal("0.0"))
      .where(col("id_a") === 1L && col("id_b") === 11L).collect().head
    assert(r.getAs[Long]("agree_name") == 1L)
    assert(r.getAs[Long]("agree_city") == 1L)
    assert(r.getAs[Long]("agree_year") == 1L)
  }

  test("selfLink emits each unordered pair once and never self-pairs") {
    val got = RecordLinkage.linkScoredPairs(left, left, "id", "blk",
      comparisons, BigDecimal("5.0"), BigDecimal("0.0"), selfLink = true)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(got.toSet == Set((1L, 2L))) // only block 'k' has 2 records
  }

  test("hot-block guard refuses degenerate blocking; null blocks drop") {
    import spark.implicits._
    val flat = (1 to 50).map(i => (i.toLong, "same", s"n$i", "c", 2000))
      .toDF("id", "blk", "name", "city", "year")
    val err = intercept[IllegalArgumentException] {
      RecordLinkage.linkScoredPairs(flat, flat, "id", "blk", comparisons,
        BigDecimal("5.0"), BigDecimal("0.0"), selfLink = true, maxBlockSize = 10L)
    }
    assert(err.getMessage.contains("blocking"))
    val withNull = Seq((1L, null.asInstanceOf[String], "x", "c", 2000))
      .toDF("id", "blk", "name", "city", "year")
    assert(RecordLinkage.linkScoredPairs(withNull, withNull, "id", "blk",
      comparisons, BigDecimal("5.0"), BigDecimal("0.0"), selfLink = true)
      .count() == 0)
  }
}
