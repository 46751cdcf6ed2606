package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusLmSpec extends SparkSpec {
  import spark.implicits._

  test("bigramNll: hand-checked corpus bigram MLE") {
    // corpus bigrams: (a b)×2, (a c)×1 → P(b|a)=2/3, P(c|a)=1/3
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = CorpusLm.bigramNll(docs, "text", "doc_id")
      .select("doc_id", "n_bigrams", "lm_score")
      .as[(Long, Long, Double)].collect()
      .map { case (d, n, s) => d -> ((n, s)) }.toMap
    assert(out(1L) == ((1L, math.rint(-math.log(2.0 / 3) * 1e4) / 1e4)))
    assert(out(3L) == ((1L, math.rint(-math.log(1.0 / 3) * 1e4) / 1e4)))
  }

  test("docs with fewer than two tokens emit no row") {
    val docs = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val out = CorpusLm.bigramNll(docs, "text", "doc_id")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("pplBuckets: ANSI ntile sizes and the head/middle keep gate") {
    // 10 docs, k=3 → buckets of 4/3/3; keep = bucket < 3
    val scored = (1 to 10).map(i =>
      (i.toLong, 5L, i.toDouble)).toDF("doc_id", "n_bigrams", "lm_score")
    val out = CorpusLm.pplBuckets(scored, "doc_id", k = 3)
    val sizes = out.groupBy("ppl_bucket").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes == Map(1L -> 4L, 2L -> 3L, 3L -> 3L))
    assert(out.where(col("keep") =!= (col("ppl_bucket") < 3)).count() == 0)
    // lowest scores land in bucket 1, highest in bucket 3
    val b = out.select("doc_id", "ppl_bucket").as[(Long, Long)]
      .collect().toMap
    assert(b(1L) == 1L && b(10L) == 3L)
  }

  test("pplBuckets ordering is monotone: no doc in a later bucket has a lower score") {
    val scored = (1 to 23).map(i =>
      (i.toLong, 5L, ((i * 7) % 10).toDouble)).toDF("doc_id", "n_bigrams", "lm_score")
    val rows = CorpusLm.pplBuckets(scored, "doc_id", k = 3)
      .select("lm_score", "ppl_bucket").as[(Double, Long)].collect()
    val maxByBucket = rows.groupBy(_._2).view.mapValues(_.map(_._1).max)
    val minByBucket = rows.groupBy(_._2).view.mapValues(_.map(_._1).min)
    assert(maxByBucket(1L) <= minByBucket(2L))
    assert(maxByBucket(2L) <= minByBucket(3L))
  }

  test("bigramKnNll: hand-checked interpolated Kneser-Ney (D = 0.5)") {
    // bigrams: (a b)×2, (a c)×1, (b a)×1 → c1(a)=3, N1+(a·)=2; c1(b)=1,
    // N1+(b·)=1; N1+(·a)=1, N1+(·b)=1, N1+(·c)=1; types nt=3
    val docs = Seq((1L, "a b"), (2L, "a b a c")).toDF("doc_id", "text")
    val out = CorpusLm.bigramKnNll(docs, "text", "doc_id")
      .select("doc_id", "n_bigrams", "kn_score")
      .as[(Long, Long, Double)].collect()
      .map { case (d, n, s) => d -> ((n, s)) }.toMap
    def p(c12: Double, c1: Double, n1f: Double, n1b: Double) =
      math.max(c12 - 0.5, 0.0) / c1 + (0.5 * n1f / c1) * (n1b / 3.0)
    def snap(x: Double) = BigDecimal(-math.log(x))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = math.rint(snap(p(2, 3, 2, 1)) * 1e4) / 1e4
    assert(out(1L) == ((1L, d1)))
    val doc2 = Seq(p(2, 3, 2, 1), p(1, 1, 1, 1), p(1, 3, 2, 1)).map(snap).sum / 3
    assert(out(2L) == ((3L, math.rint(doc2 * 1e4) / 1e4)))
  }

  test("KN assigns rare continuations more mass than the MLE's zero-backoff shape") {
    // 'c' follows only 'a'; KN shifts discount mass onto continuation
    // probability, so P_KN(c|a) < P_MLE(c|a) but stays positive
    val docs = Seq((1L, "a b a c a b")).toDF("doc_id", "text")
    val mle = CorpusLm.bigramNll(docs, "text", "doc_id")
      .head().getAs[Double]("lm_score")
    val kn = CorpusLm.bigramKnNll(docs, "text", "doc_id")
      .head().getAs[Double]("kn_score")
    assert(kn > 0 && mle > 0 && kn != mle)
  }

  test("pplBuckets with n < k still assigns 1-based buckets") {
    val scored = Seq((1L, 2L, 0.5), (2L, 2L, 0.9))
      .toDF("doc_id", "n_bigrams", "lm_score")
    val out = CorpusLm.pplBuckets(scored, "doc_id", k = 3)
      .select("doc_id", "ppl_bucket").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L))
  }

  test("bigramKnHeldout: every unseen branch gets positive finite mass; familiar text scores lower") {
    val train = Seq(
      (2L, "the cat sat on the mat"),
      (4L, "the dog sat on the rug"),
      (6L, "the cat ate the fish")).toDF("doc_id", "text")
    val test = Seq(
      (1L, "the cat sat on the mat"),     // all bigrams seen
      (3L, "the cat sat on zzz qqq"),     // unseen continuation + unseen w1
      (5L, "xx yy zz ww vv uu")           // nothing seen at all
    ).toDF("doc_id", "text")
    val out = CorpusLm.bigramKnHeldout(train, test, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("heldout_score"))).toMap
    assert(out.keySet == Set(1L, 3L, 5L))
    // finite (no -ln(0)): every unseen branch carries smoothed mass
    assert(out.values.forall { case (_, s) => !s.isNaN && !s.isInfinite })
    // fully-familiar beats partially-unseen beats fully-novel
    assert(out(1L)._2 < out(3L)._2 && out(3L)._2 < out(5L)._2, out)
    // self-scoring the train half stays positive and finite too
    val self = CorpusLm.bigramKnHeldout(train, train, "text", "doc_id")
      .collect()
    assert(self.length == 3 &&
      self.forall(r => r.getAs[Double]("heldout_score") > 0))
  }
}
