package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 30L)
    .map(i => (i, (1 to 60).map(j => s"w${i}_$j").mkString(" ")))
    .toDF("doc_id", "text")

  private def collectPairs(noisePct: Int = 15) =
    SpanCorrupt.pairs(docs, "text", "doc_id", noisePct)
      .as[(Long, String, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("input + target reconstruct the original token sequence") {
    val orig = docs.as[(Long, String)].collect().toMap
    collectPairs().foreach { case (id, (_, in, tgt, _, _)) =>
      // parse target into span_k -> tokens
      val spans = scala.collection.mutable.Map[Int, Vector[String]]()
      var cur = -1
      tgt.split(" ").filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t.stripPrefix("<extra_id_").stripSuffix(">").toInt; spans(cur) = Vector() }
        else spans(cur) :+= t
      }
      val rebuilt = in.split(" ").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_"))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Vector(t)
      }.mkString(" ")
      assert(rebuilt == orig(id), s"doc $id reconstruction failed")
    }
  }

  test("sentinel numbering is 1..n_spans in order, in both input and target") {
    collectPairs().foreach { case (_, (_, in, tgt, _, nSpans)) =>
      def ks(s: String) = s.split(" ").filter(_.startsWith("<extra_id_"))
        .map(_.stripPrefix("<extra_id_").stripSuffix(">").toInt).toSeq
      assert(ks(in) == (1 to nSpans.toInt), s"input sentinels: ${ks(in)}")
      assert(ks(tgt) == (1 to nSpans.toInt), s"target sentinels: ${ks(tgt)}")
    }
  }

  test("noise mass ≈ noisePct and spans ≤ noise tokens") {
    val ps = collectPairs()
    val totalNoise = ps.values.map(_._4).sum.toDouble
    val totalTok = 30 * 60.0
    assert(totalNoise / totalTok > 0.08 && totalNoise / totalTok < 0.25,
      s"15% Bernoulli mask way off: ${totalNoise / totalTok}")
    ps.values.foreach { case (_, _, _, nNoise, nSpans) =>
      assert(nSpans <= nNoise)
    }
  }

  test("mask is a pure function of (doc_id, pos): partitioning-invariant") {
    val a = SpanCorrupt.pairs(docs.coalesce(1), "text", "doc_id")
      .orderBy("doc_id").as[(Long, String, String, Long, Long)].collect().toSeq
    val b = SpanCorrupt.pairs(docs.repartition(7), "text", "doc_id")
      .orderBy("doc_id").as[(Long, String, String, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("FIM: PSM reorder is a permutation of the doc; non-FIM rows pass through") {
    val out = SpanCorrupt.fimTransform(docs, "text", "doc_id",
      ratePermille = 500)
      .select("doc_id", "fim", "out_text")
      .as[(Long, Boolean, String)].collect()
    val orig = docs.as[(Long, String)].collect().toMap
    assert(out.exists(_._2) && out.exists(!_._2), "fixture: want both arms")
    out.foreach { case (id, fim, text) =>
      if (!fim) assert(text == orig(id))
      else {
        val sent = Seq("<fim_prefix>", "<fim_suffix>", "<fim_middle>")
        assert(sent.forall(text.contains), s"missing sentinel in: $text")
        val rebuilt = text.split(" ").filterNot(t => sent.contains(t) || t.isEmpty)
        val pre = text.indexOf("<fim_prefix>"); val suf = text.indexOf("<fim_suffix>")
        val mid = text.indexOf("<fim_middle>")
        assert(pre < suf && suf < mid, "PSM order violated")
        // P ++ S ++ M is a permutation of the tokens; P ++ M ++ S restores
        val p = text.substring(pre + 13, suf).trim
        val sfx = text.substring(suf + 13, mid).trim
        val m = text.substring(mid + 13).trim
        val restored = Seq(p, m, sfx).filter(_.nonEmpty).mkString(" ")
        assert(restored == orig(id), s"doc $id: $restored != ${orig(id)}")
        assert(rebuilt.length == orig(id).split(" ").count(_.nonEmpty))
      }
    }
  }

  test("FIM at rate 0 is the identity; at rate 1000 every row transforms") {
    val all = SpanCorrupt.fimTransform(docs, "text", "doc_id", 1000)
    assert(all.where(!col("fim")).count() == 0)
    val none = SpanCorrupt.fimTransform(docs, "text", "doc_id", 0)
    assert(none.where(col("fim")).count() == 0)
    val orig = docs.as[(Long, String)].collect().toMap
    none.select("doc_id", "out_text").as[(Long, String)].collect()
      .foreach { case (id, t) => assert(t == orig(id)) }
  }

  test("a doc with no masked token passes through with empty target") {
    // find one noise-free doc at 1% noise (60 tokens ⇒ ~55% chance/doc)
    val ps = SpanCorrupt.pairs(docs, "text", "doc_id", noisePct = 1)
      .as[(Long, String, String, Long, Long)].collect()
    val clean = ps.filter(_._4 == 0L)
    assert(clean.nonEmpty, "fixture: expected at least one noise-free doc at 1%")
    val orig = docs.as[(Long, String)].collect().toMap
    clean.foreach { case (id, in, tgt, _, nSpans) =>
      assert(in == orig(id) && tgt == "" && nSpans == 0L)
    }
  }
}
