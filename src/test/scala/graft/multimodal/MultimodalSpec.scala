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

  test("real WAV payloads decode true sample rate/frames; junk bytes take the stub arm") {
    import spark.implicits._
    def wav(sampleRate: Float, channels: Int, nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav(8000f, 1, 4000), "test"),
      Multimodal.MediaRow(2L, "audio", wav(44100f, 2, 44100), "test"),
      Multimodal.MediaRow(3L, "audio", "definitely not audio".getBytes, "test")
    ).toDS()
    val feats = Multimodal.decodeAudio(media).collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).sample_rate == 8000 && feats(1L).channels == 1)
    assert(feats(1L).n_frames == 4000 && feats(1L).duration_ms == 500)
    assert(feats(2L).sample_rate == 44100 && feats(2L).channels == 2)
    assert(feats(2L).duration_ms == 1000)
    assert(feats(3L).duration_ms == -1L) // stub arm marker
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

  test("sampleFrames: exactly N rows per clip, monotone offsets, deterministic") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "video", Array.tabulate(1000)(_.toByte), "t"),
      Multimodal.MediaRow(2L, "video", Array.tabulate(10)(_.toByte), "t"),
      Multimodal.MediaRow(3L, "video", Array.emptyByteArray, "t")).toDS()
    val frames = Multimodal.sampleFrames(media, frames = 4).collect()
    assert(frames.length == 12) // 1 → N expansion for every clip, even empty
    val byClip = frames.groupBy(_.media_id)
    byClip.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
      val offs = fs.sortBy(_.frame_idx).map(_.byte_offset)
      assert(offs.zip(offs.tail).forall { case (a, b) => a <= b })
    }
    assert(byClip(1L).map(_.byte_offset).distinct.length == 4) // spaced
    val again = Multimodal.sampleFrames(media, 4).collect()
    assert(frames.map(f => (f.media_id, f.frame_idx, f.frame_checksum)).toSet ==
      again.map(f => (f.media_id, f.frame_idx, f.frame_checksum)).toSet)
  }

  test("extractWaveform: sine-wave RMS/peak/zero-crossings match the math") {
    import spark.implicits._
    // 1 second of a 440 Hz sine at amplitude 0.5, 16-bit mono, 8 kHz
    val sr = 8000
    def sineWav(amp: Double, freq: Double): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
      val pcm = new Array[Byte](sr * 2)
      for (i <- 0 until sr) {
        val s = (amp * math.sin(2 * math.Pi * freq * i / sr) * 32767).toInt
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, sr.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", sineWav(0.5, 440.0), "test"),
      Multimodal.MediaRow(2L, "audio", "not audio at all".getBytes, "test")
    ).toDS()
    val f = Multimodal.extractWaveform(media).collect().map(w => w.media_id -> w).toMap
    assert(f(1L).n_samples == sr)
    // sine RMS = amp/√2, peak = amp, crossings = 2·freq·seconds (±1)
    assert(math.abs(f(1L).rms - 0.5 / math.sqrt(2)) < 0.005, f(1L).rms)
    assert(math.abs(f(1L).peak - 0.5) < 0.005, f(1L).peak)
    assert(math.abs(f(1L).zero_crossings - 880L) <= 2L, f(1L).zero_crossings)
    assert(f(2L).n_samples == -1L) // explicit miss, never fabricated stats
  }

  // deterministic gradient test image with an optional per-pixel tweak
  private def gradientPng(w: Int, h: Int, invert: Boolean = false,
      noiseAt: Seq[(Int, Int)] = Nil): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * 255) / (w - 1)
      val v = if (invert) 255 - base else base
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    noiseAt.foreach { case (x, y) =>
      val v = (img.getRGB(x, y) & 0xff) ^ 0x10
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("dHash64: perceptual — resilient to pixel noise, far for different content, " +
      "resolution-invariant for the same content") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", gradientPng(64, 48), "t"),
      Multimodal.MediaRow(2L, "image", gradientPng(64, 48,
        noiseAt = Seq((5, 5), (30, 20), (60, 40))), "t"),
      Multimodal.MediaRow(3L, "image", gradientPng(64, 48, invert = true), "t"),
      Multimodal.MediaRow(4L, "image", gradientPng(128, 96), "t"), // same scene, 2×
      Multimodal.MediaRow(5L, "image", "junk bytes".getBytes, "t")
    ).toDS()
    val h = Multimodal.dHash64(media).collect().map(r => r.media_id -> r).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1L).decoded && !h(5L).decoded)
    assert(ham(h(1L).dhash, h(2L).dhash) <= 3,
      s"noise moved the hash ${ham(h(1L).dhash, h(2L).dhash)} bits")
    assert(h(1L).dhash == h(4L).dhash, "same scene at 2x resolution must agree")
    assert(ham(h(1L).dhash, h(3L).dhash) > 16,
      "inverted gradient should be far")
    // deterministic across runs
    val again = Multimodal.dHash64(media).collect().map(r => r.media_id -> r.dhash).toMap
    assert(again(1L) == h(1L).dhash && again(5L) == h(5L).dhash)
  }

  test("imageNearDuplicates: banded Hamming join finds the noisy twin, " +
      "skips stubs and distinct scenes") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", gradientPng(64, 48), "t"),
      Multimodal.MediaRow(2L, "image", gradientPng(64, 48,
        noiseAt = Seq((10, 10))), "t"),
      Multimodal.MediaRow(3L, "image", gradientPng(64, 48, invert = true), "t"),
      Multimodal.MediaRow(4L, "image", "junk A".getBytes, "t"),
      Multimodal.MediaRow(5L, "image", "junk B".getBytes, "t")
    ).toDS()
    val pairs = Multimodal.imageNearDuplicates(media)
      .collect().map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }
}
