package graft.operators

import graft.SparkSpec

import scala.util.Random

class StringJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def naive(strs: Seq[String], d: Int): Set[(String, String, Int)] = {
    val u = strs.distinct
    (for {
      a <- u; b <- u if a < b
      dist = lev(a, b) if dist <= d
    } yield (a, b, dist)).toSet
  }

  /** Random strings over a 4-letter alphabet: short lengths force both
    * the gram-index path and the short-string fallback block.
    */
  private def randomStrings(n: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    (1 to n).map { _ =>
      val len = 1 + rnd.nextInt(10)
      (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }
  }

  test("editDistancePairs ≡ naive all-pairs, d = 1 and 2") {
    val strs = randomStrings(80, seed = 5)
    for (d <- Seq(1, 2)) {
      val got = StringJoin.editDistancePairs(strs.toDF("s"), "s", d)
        .as[(String, String, Int)].collect().toSet
      val want = naive(strs, d)
      assert(got === want, s"mismatch at d=$d")
      assert(want.nonEmpty, s"degenerate fixture at d=$d")
    }
  }

  test("handles strings shorter than the gram width") {
    val strs = Seq("a", "b", "ab", "ba", "abc", "", "xyz")
    val got = StringJoin.editDistancePairs(strs.toDF("s"), "s", 2)
      .as[(String, String, Int)].collect().toSet
    assert(got === naive(strs, 2))
  }

  test("null strings are ignored, not joined") {
    val df = Seq(Some("abc"), None, Some("abd")).toDF("s")
    val got = StringJoin.editDistancePairs(df, "s", 1)
      .as[(String, String, Int)].collect().toSet
    assert(got === Set(("abc", "abd", 1)))
  }

  test("long near-identical strings survive the count filter") {
    val base = "abcdefghijklmnopqrstuvwxyz"
    val strs = Seq(base, base.updated(10, 'X'), base.patch(5, "", 1), base.reverse)
    val got = StringJoin.editDistancePairs(strs.toDF("s"), "s", 2)
      .as[(String, String, Int)].collect().toSet
    assert(got === naive(strs, 2))
    assert(got.size == 3) // base pairs with each variant + the two variants at d=2
  }
}
