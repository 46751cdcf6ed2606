package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  test("packContiguous lays rows end-to-end with exact spillover math") {
    // L=10; docs of 4, 10, 3, 15, 8 tokens in id order:
    //   id 1: [0,4)   seq 0 off 0, spans 1
    //   id 2: [4,14)  seq 0 off 4, spans 2 (boundary at 10)
    //   id 3: [14,17) seq 1 off 4, spans 1
    //   id 4: [17,32) seq 1 off 7, spans 3 (crosses 20 and 30)
    //   id 5: [32,40) seq 3 off 2, spans 1
    val d = Seq((1L, 4L), (2L, 10L), (3L, 3L), (4L, 15L), (5L, 8L))
      .toDF("doc_id", "n_tokens")
    val got = SequencePack.packContiguous(d, "n_tokens", 10L, "doc_id")
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("start_tok"), col("seq_id"),
        col("seq_offset"), col("n_seqs"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 0L, 1L),
      (2L, 4L, 0L, 4L, 2L),
      (3L, 14L, 1L, 4L, 1L),
      (4L, 17L, 1L, 7L, 3L),
      (5L, 32L, 3L, 2L, 1L)))
  }

  test("layout is partition-invariant and zero-token rows drop") {
    val d = (1L to 200L).map(i => (i, (i % 7) + 1)).toDF("doc_id", "n_tokens")
      .withColumn("n_tokens", col("n_tokens").cast("long"))
    val a = SequencePack.packContiguous(d, "n_tokens", 16L, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val b = SequencePack.packContiguous(d.repartition(13), "n_tokens", 16L,
        "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
    val withZero = d.unionAll(Seq((999L, 0L)).toDF("doc_id", "n_tokens"))
    val z = SequencePack.packContiguous(withZero, "n_tokens", 16L, "doc_id")
    assert(z.where(col("doc_id") === 999L).count() == 0)
    assert(z.count() == 200)
  }

  test("sequences are gap-free and exactly full: offsets tile the token stream") {
    val d = (1L to 50L).map(i => (i, (i % 5) + 2)).toDF("doc_id", "n_tokens")
      .withColumn("n_tokens", col("n_tokens").cast("long"))
    val packed = SequencePack.packContiguous(d, "n_tokens", 8L, "doc_id")
      .orderBy(col("start_tok"))
      .select(col("start_tok"), col("n_tokens")).as[(Long, Long)]
      .collect().toSeq
    // consecutive rows abut exactly: start_{i+1} = start_i + n_i
    packed.sliding(2).foreach {
      case Seq((s1, n1), (s2, _)) => assert(s2 == s1 + n1)
      case _ => ()
    }
    assert(packed.head._1 == 0L)
  }

  test("seqCensus counts doc starts and boundary-spanners per sequence") {
    val d = Seq((1L, 4L), (2L, 10L), (3L, 3L), (4L, 15L), (5L, 8L))
      .toDF("doc_id", "n_tokens")
    val census = SequencePack.seqCensus(
        SequencePack.packContiguous(d, "n_tokens", 10L, "doc_id"))
      .orderBy(col("seq_id"))
      .as[(Long, Long, Long)].collect().toSeq
    // seq 0: docs 1,2 start (2 starts, doc 2 spans); seq 1: docs 3,4
    // (doc 4 spans); seq 3: doc 5. seq 2 has no starts (pure payload).
    assert(census == Seq((0L, 2L, 1L), (1L, 2L, 1L), (3L, 1L, 0L)))
  }
}
