package graft.multimodal

import graft.SparkSpec
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("binary payload plumbing: schema, batching, deterministic stub decode") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val feats = Multimodal.documentFeatures(spark, docs, partitions = 8)
    assert(feats.columns.toSeq ==
      Seq("media_id", "modality", "n_bytes", "width", "height", "checksum"))
    assert(feats.count() == docs.count())
    val r = feats.orderBy("media_id").head()
    assert(r.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 1920)
    // deterministic: same input → same checksum on a second run
    val again = Multimodal.documentFeatures(spark, docs, partitions = 3)
      .orderBy("media_id").head()
    assert(again.getAs[Long]("checksum") == r.getAs[Long]("checksum"))
  }
}
