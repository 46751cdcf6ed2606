package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.CorpusPrep

/** PII redaction + curriculum ordering + sketch-vs-exact invariants on
  * crafted rows (the query-level oracle checks corpus-wide agreement; here
  * the redaction semantics are pinned on known PII shapes).
  */
class TextOpsPiiSpec extends SparkSpec {

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextOps.redactPii(col("t"))).head().getString(0)
  }

  private def counts(s: String): (Long, Long, Long) = {
    import spark.implicits._
    val r = Seq(s).toDF("t").select(TextOps.piiCounts(col("t")).as("p"))
      .select("p.n_emails", "p.n_ips", "p.n_phones").head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("redactPii scrubs emails, IPv4s and phone-like runs") {
    assert(redact("mail a.user+tag@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(redact("host 192.168.001.1 down") == "host <IP> down")
    assert(redact("call +1 555 0123 99 or 555-123-4567 now")
      == "call <PHONE> or <PHONE> now")
    // email digits and IP dots must not leak into the phone pattern
    assert(redact("u12345678@example.com at 10.0.0.1") == "<EMAIL> at <IP>")
    assert(redact("no pii in this sentence at all") == "no pii in this sentence at all")
  }

  test("piiCounts counts per kind on the raw text") {
    assert(counts("a@b.com c@d.org 10.0.0.1 call 555-123-4567") == ((2L, 1L, 1L)))
    assert(counts("nothing sensitive here") == ((0L, 0L, 0L)))
  }

  test("curriculumOrder: stage buckets clamp at maxStage, key is deterministic") {
    import spark.implicits._
    val rows = Seq((1L, 10L), (2L, 64L), (3L, 130L), (4L, 9999L))
      .toDF("id", "difficulty")
    val out = CorpusPrep.curriculumOrder(rows, "id", "difficulty", 64L, 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L)._1 == 0L && out(2L)._1 == 1L && out(3L)._1 == 2L)
    assert(out(4L)._1 == 3L) // clamped
    // the shuffle key is the md5 of the id string — engine-agnostic
    assert(out(1L)._2 == java.security.MessageDigest.getInstance("MD5")
      .digest("1".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val again = CorpusPrep.curriculumOrder(rows, "id", "difficulty", 64L, 3L)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again == out.view.mapValues(_._2).toMap)
  }

  test("approx_count_distinct stays within 5% of exact on the documents table") {
    val d = graft.sources.Tables.documents(spark, sf("sf0.01"))
      .agg(approx_count_distinct(col("text")).as("approx"),
        countDistinct(col("text")).as("exact")).head()
    val (approx, exact) = (d.getLong(0), d.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, (approx, exact))
  }
}
