package graft.operators

import graft.SparkSpec

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  private val baskets = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "b"), (3L, "b"), // duplicate item in one basket
    (4L, "c"), (4L, "d")
  ).toDF("b", "i")

  test("pair supports count distinct co-occurring baskets with marginals") {
    val r = Association.pairSupports(baskets, "b", "i", minSupport = 2)
      .as[(String, String, Long, Long, Long)].collect().toSet
    // (a,b) co-occur in baskets 1,2,3; every other pair has support 1
    assert(r === Set(("a", "b", 3L, 3L, 3L)))
  }

  test("minSupport = 1 returns every pair exactly once") {
    val r = Association.pairSupports(baskets, "b", "i", minSupport = 1)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(r.map(t => (t._1, t._2)) ===
      Set(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")))
  }

  test("maxBasketSize drops hot baskets from pairs AND marginals") {
    val r = Association.pairSupports(baskets, "b", "i",
        minSupport = 1, maxBasketSize = 2)
      .as[(String, String, Long, Long, Long)].collect().toSet
    // basket 1 (3 items) is dropped; a,b survive via baskets 2,3
    assert(r === Set(("a", "b", 2L, 2L, 2L), ("c", "d", 1L, 1L, 1L)))
  }
}
