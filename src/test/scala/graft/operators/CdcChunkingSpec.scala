package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CdcChunkingSpec extends SparkSpec {
  import spark.implicits._

  // a "passage" long enough to contain interior content boundaries
  private val passage = (1 to 40).map(i => s"p$i").mkString(" ")

  test("chunks reassemble to the original text, in order") {
    val docs = Seq((1L, passage), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val back = CdcChunking.chunks(docs, "text", "doc_id")
      .groupBy(col("doc"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
        x => x.getField("chunk_text")), " ").as("rebuilt"))
      .as[(Long, String)].collect().toMap
    assert(back(1L) == passage)
    assert(back(2L) == "a b")
    assert(back(3L) == "solo")
  }

  test("shift invariance: a shared passage chunks identically at any offset") {
    // same passage behind different-length prefixes — fixed-size chunking
    // would misalign every chunk; CDC must re-synchronize after one
    // boundary, so the two docs share all interior passage fingerprints
    val docs = Seq(
      (1L, s"x1 $passage"),
      (2L, s"y1 y2 y3 y4 y5 y6 y7 $passage")).toDF("doc_id", "text")
    val ch = CdcChunking.chunks(docs, "text", "doc_id")
      .select(col("doc"), col("chunk_text")).as[(Long, String)].collect()
    val a = ch.filter(_._1 == 1L).map(_._2).toSet
    val b = ch.filter(_._1 == 2L).map(_._2).toSet
    val shared = a intersect b
    // every shared chunk must be pure passage content, and there must be
    // at least one (the passage is 40 tokens ≈ 5 expected chunks)
    assert(shared.nonEmpty, s"no shared chunks between shifted copies: a=$a b=$b")
    assert(shared.forall(_.split(" ").forall(_.startsWith("p"))))
  }

  test("boundary draw is content-only: duplicate docs share every fingerprint") {
    val docs = Seq((10L, passage), (99L, passage)).toDF("doc_id", "text")
    val perDoc = CdcChunking.chunks(docs, "text", "doc_id")
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(col("chunk_md5"))).as("fps"))
      .as[(Long, Seq[String])].collect().toMap
    assert(perDoc(10L) == perDoc(99L))
  }

  test("dedupReport accounts every token once per instance") {
    val docs = Seq((1L, passage), (2L, passage), (3L, "unique text here"))
      .toDF("doc_id", "text")
    val rows = CdcChunking.chunks(docs, "text", "doc_id")
    val rep = CdcChunking.dedupReport(rows).head()
    val totalTokens = rep.getAs[Long]("total_tokens")
    assert(totalTokens == 40 + 40 + 3)
    // duplicated passage halves its unique token mass
    assert(rep.getAs[Long]("unique_tokens") == 40 + 3)
    assert(rep.getAs[Long]("n_chunks") > rep.getAs[Long]("n_unique_chunks"))
  }

  test("short docs (< gram width) form exactly one whole-doc chunk") {
    val docs = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val ch = CdcChunking.chunks(docs, "text", "doc_id")
      .select(col("doc"), col("chunk_idx"), col("chunk_text"))
      .as[(Long, Int, String)].collect()
    assert(ch.count(_._1 == 1L) == 1 && ch.find(_._1 == 1L).get._3 == "a b c")
    assert(ch.count(_._1 == 2L) == 1)
  }

  test("chunking is partitioning-invariant (pure column math)") {
    val docs = (1L to 50L).map(i => (i, s"$passage tail$i")).toDF("doc_id", "text")
    val one = CdcChunking.chunks(docs.coalesce(1), "text", "doc_id")
      .select(col("doc"), col("chunk_idx"), col("chunk_md5"))
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    val many = CdcChunking.chunks(docs.repartition(13), "text", "doc_id")
      .select(col("doc"), col("chunk_idx"), col("chunk_md5"))
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(one == many)
  }

  test("maintained chunk store over batches ≡ one-shot dedupReport") {
    val docs = (1L to 60L).map(i => (i, s"$passage tail${i % 9}"))
      .toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("cdc-spec")
    val dirStore = s"$base/chunks"
    graft.streaming.ChunkStoreStream.applyBatch(
      docs.where(col("doc_id") <= 20), "text", "doc_id", dirStore, 0)
    graft.streaming.ChunkStoreStream.applyBatch(
      docs.where(col("doc_id") > 20 && col("doc_id") <= 40), "text",
      "doc_id", dirStore, 1)
    graft.streaming.ChunkStoreStream.applyBatch(
      docs.where(col("doc_id") > 40), "text", "doc_id", dirStore, 2)
    val maintained = graft.streaming.ChunkStoreStream.report(spark, dirStore)
      .collect().head
    val oneShot = CdcChunking.dedupReport(
      CdcChunking.chunks(docs, "text", "doc_id")).collect().head
    assert(maintained.toSeq == oneShot.toSeq)
    // a crash-replayed batch recomputes from the prior snapshot: re-fold
    // batch 2 and the report must not double-count
    graft.streaming.ChunkStoreStream.applyBatch(
      docs.where(col("doc_id") > 40), "text", "doc_id", dirStore, 2)
    val replayed = graft.streaming.ChunkStoreStream.report(spark, dirStore)
      .collect().head
    assert(replayed.toSeq == oneShot.toSeq)
  }
}
