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

  test("real PNG payloads decode to true dimensions; junk bytes take the stub arm") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xFF8800)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png(37, 21), "test"),
      Multimodal.MediaRow(2L, "image", png(640, 480), "test"),
      Multimodal.MediaRow(3L, "image", "not an image at all".getBytes, "test")
    ).toDS()
    val feats = Multimodal.decode(media).collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).width == 37 && feats(1L).height == 21)
    assert(feats(2L).width == 640 && feats(2L).height == 480)
    // unknown bytes: deterministic stub features, same as decodeStub
    val stub = Multimodal.decodeStub(media).collect()
      .find(_.media_id == 3L).get
    assert(feats(3L) == stub)
  }
}
