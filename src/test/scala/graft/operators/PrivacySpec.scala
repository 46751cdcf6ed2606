package graft.operators

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // QI (zip, band): classes AA×1 → 3 rows, AA×2 → 1 row, BB×1 → 2 rows,
  // (null, 1) → 1 row; sensitive values vary inside AA×1 only
  private def tbl = Seq(
    ("AA", 1L, "s1"), ("AA", 1L, "s2"), ("AA", 1L, "s1"),
    ("AA", 2L, "s1"),
    ("BB", 1L, "s3"), ("BB", 1L, "s3"),
    (null.asInstanceOf[String], 1L, "s1")
  ).toDF("zip", "band", "sensitive")

  test("kAnonymityHistogram: sizes, cumulative ppm, null QI is a class") {
    val h = Privacy.kAnonymityHistogram(tbl, Seq("zip", "band"))
      .orderBy("class_size").collect()
    // sizes: two singleton classes (AA×2 and null×1), one pair, one triple
    assert(h.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 2L), (2L, 1L, 2L), (3L, 1L, 3L)))
    // k level = first row's class_size = 1 (re-identifiable rows exist)
    assert(h.head.getLong(0) == 1L)
    // cumulative: 2/7, 4/7, 7/7 in exact ppm (integral div)
    assert(h.map(_.getLong(3)).toSeq == Seq(2L, 4L, 7L))
    assert(h.map(_.getLong(4)).toSeq ==
      Seq(2000000L / 7, 4000000L / 7, 1000000L))
  }

  test("lDiversityHistogram: distinct sensitive per class, null sensitive excluded") {
    val h = Privacy.lDiversityHistogram(tbl, Seq("zip", "band"), "sensitive")
      .orderBy("l").collect()
    // AA×1 has {s1,s2} → l=2 (3 rows); the other three classes l=1
    assert(h.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 4L), (2L, 1L, 3L)))
    // a class whose sensitives are all null lands at l = 0, not l = 1
    val withNull = Seq(("CC", 9L, null.asInstanceOf[String]),
      ("CC", 9L, null.asInstanceOf[String])).toDF("zip", "band", "sensitive")
    val h0 = Privacy.lDiversityHistogram(withNull, Seq("zip", "band"),
      "sensitive").collect()
    assert(h0.map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((0L, 2L)))
  }

  test("tClosenessHistogram: hand-computed TVD bands, zero for a global-matching class") {
    import spark.implicits._
    // global: a×3, b×1 (N=4). class q1 = {a,a}: tvd = ½(|1−¾| + |0−¼|)
    // = 0.25 → 250000 ppm; class q2 = {a,b}: ½(|½−¾| + |½−¼|) = 0.25
    // too — both land in band 5 at the default 50000-ppm width
    val rows = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"))
      .toDF("q", "sensitive")
    val h = Privacy.tClosenessHistogram(rows, Seq("q"), "sensitive")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(h == Seq((5L, 2L, 4L)), h)
    // one class holding ALL the data matches the global distribution
    // exactly: tvd 0, band 0
    val solo = Seq((1L, "a"), (1L, "a"), (1L, "b")).toDF("q", "sensitive")
    val h1 = Privacy.tClosenessHistogram(solo, Seq("q"), "sensitive")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(h1 == Seq((0L, 1L, 3L)), h1)
  }
}
