package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` payload columns with typed metadata, processed per-partition
  * in batches (the Scala analog of `mapInPandas` batch processing).
  *
  * Image decode is REAL for the formats the JDK ships readers for
  * (PNG/JPEG/GIF/BMP via javax.imageio — no external dependency);
  * payloads no reader accepts (audio/video/unknown bytes — those codecs
  * aren't in this container) fall back to deterministic stub features.
  * The schema, typed rows, per-partition batching and partition sizing
  * are the same either way, so further codecs drop in by extending one
  * function.
  */
object Multimodal {

  /** An opaque media payload + metadata. */
  final case class MediaRow(
      media_id: Long, modality: String, payload: Array[Byte],
      source: String)

  /** Decoded/extracted features per media item. */
  final case class MediaFeatures(
      media_id: Long, modality: String, n_bytes: Long,
      width: Int, height: Int, checksum: Long)

  /** Wrap any table into media rows (payload = a binary column). */
  def toMediaRows(df: DataFrame, idCol: String, binCol: String,
      modality: String, sourceCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(binCol).cast("binary").as("payload"),
      col(sourceCol).cast("string").as("source")).as[MediaRow]
  }

  private def contentChecksum(payload: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
    sum
  }

  /** Deterministic pseudo-features for payloads no installed codec can
    * read (fake dimensions derived only from the bytes) — the fallback
    * arm of [[decode]] and a codec-free baseline for tests.
    */
  private def stubFeatures(r: MediaRow): MediaFeatures = {
    val sum = contentChecksum(r.payload)
    // floorMod, not abs+%: abs(Long.MinValue) is negative, which would
    // turn the stub dimensions negative on that one checksum value
    MediaFeatures(r.media_id, r.modality, r.payload.length.toLong,
      width = Math.floorMod(sum, 1920L).toInt + 1,
      height = Math.floorMod(sum / 7, 1080L).toInt + 1,
      checksum = sum)
  }

  /** Decode per partition batch: real PNG/JPEG/GIF/BMP decode through the
    * JDK's javax.imageio (zero extra dependencies), yielding true
    * width/height; payloads no reader accepts fall back to the
    * deterministic stub features. Codec setup happens once per partition
    * (not per row) — the whole point of the mapPartitions shape; the
    * in-memory cache setting avoids per-image temp files on executors.
    */
  def decode(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      rows.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: java.io.IOException => null }
        if (img != null)
          MediaFeatures(r.media_id, r.modality, r.payload.length.toLong,
            width = img.getWidth, height = img.getHeight,
            checksum = contentChecksum(r.payload))
        else stubFeatures(r)
      }
    }
  }

  /** Decoded audio features (WAV/AIFF/AU via the JDK's
    * javax.sound.sampled — zero extra dependencies).
    */
  final case class AudioFeatures(
      media_id: Long, modality: String, n_bytes: Long,
      sample_rate: Int, channels: Int, n_frames: Long, duration_ms: Long,
      checksum: Long)

  /** Real audio header decode per partition batch: sample rate, channel
    * count, frame count and duration from the JDK's sampled-audio stack.
    * Payloads no audio reader accepts fall back to deterministic
    * bytes-derived pseudo-features with `duration_ms = -1` marking the
    * stub arm. Same mapPartitions batch shape as [[decode]]: only the
    * header is parsed — the PCM body is never materialized, so a row's
    * cost is O(header), not O(payload).
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            val fmt = ais.getFormat
            val frames = ais.getFrameLength
            val durMs =
              if (fmt.getFrameRate > 0 && frames >= 0)
                (frames * 1000.0 / fmt.getFrameRate).toLong
              else -1L
            AudioFeatures(r.media_id, r.modality, r.payload.length.toLong,
              fmt.getSampleRate.toInt, fmt.getChannels, frames, durMs,
              contentChecksum(r.payload))
          } finally ais.close()
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException
             | _: java.io.IOException =>
            val sum = contentChecksum(r.payload)
            // floorMod: abs(Long.MinValue) % n is negative (see stubFeatures)
            AudioFeatures(r.media_id, r.modality, r.payload.length.toLong,
              sample_rate = Math.floorMod(sum, 48000L).toInt + 1,
              channels = Math.floorMod(sum / 7, 2L).toInt + 1,
              n_frames = Math.floorMod(sum / 11, 100000L),
              duration_ms = -1L, checksum = sum)
        }
      }
    }
  }

  /** Waveform-level audio features from REAL PCM samples (not just the
    * header): RMS level, peak amplitude and zero-crossing count over the
    * mono mix, normalized to [-1, 1]. Any format javax.sound can read is
    * first converted to signed 16-bit PCM through the JDK's own
    * conversion chain, so WAV/AIFF/AU payloads of any PCM flavor work.
    * One pass over the samples; payloads are already in-memory byte
    * arrays, so the O(payload) cost is the floor any feature extractor
    * pays. Undecodable payloads yield `n_samples = -1` (explicit miss,
    * not a fake number — feature rows feed models, where a fabricated
    * RMS would be poison).
    */
  final case class WaveformFeatures(
      media_id: Long, modality: String, n_samples: Long,
      rms: Double, peak: Double, zero_crossings: Long, checksum: Long)

  def extractWaveform(media: Dataset[MediaRow]): Dataset[WaveformFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        try {
          val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val src = raw.getFormat
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, src.getChannels,
            src.getChannels * 2, src.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem
            .getAudioInputStream(target, raw)
          try {
            val bytes = pcm.readAllBytes()
            val ch = target.getChannels
            val nFrames = bytes.length / (2 * ch)
            var i = 0
            var sumSq = 0.0
            var peak = 0.0
            var zc = 0L
            var prevSign = 0
            while (i < nFrames) {
              // mono mix of the frame's channels
              var c = 0
              var acc = 0.0
              while (c < ch) {
                val off = (i * ch + c) * 2
                val s = ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort
                acc += s / 32768.0
                c += 1
              }
              val v = acc / ch
              sumSq += v * v
              if (math.abs(v) > peak) peak = math.abs(v)
              val sign = if (v > 0) 1 else if (v < 0) -1 else prevSign
              if (prevSign != 0 && sign != prevSign) zc += 1
              prevSign = sign
              i += 1
            }
            val rms = if (nFrames > 0) math.sqrt(sumSq / nFrames) else 0.0
            WaveformFeatures(r.media_id, r.modality, nFrames.toLong,
              rms, peak, zc, contentChecksum(r.payload))
          } finally pcm.close()
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException
             | _: java.io.IOException
             | _: IllegalArgumentException =>
            WaveformFeatures(r.media_id, r.modality, -1L, 0.0, 0.0, 0L,
              contentChecksum(r.payload))
        }
      }
    }
  }

  /** The former all-stub decoder — kept for codec-free environments. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(rows => rows.map(stubFeatures))
  }

  /** One sampled video frame: byte offset into the payload + features. */
  final case class FrameRow(
      media_id: Long, frame_idx: Int, byte_offset: Long,
      frame_checksum: Long)

  /** Frame sampling: the 1 → N expansion a video pipeline runs (sample
    * N frames per clip, featurize each). No video codec ships in this
    * container, so the DECODE is a deterministic stub (evenly-spaced
    * byte offsets stand in for timestamps; the per-frame checksum reads
    * a window at the offset) — but the Spark shape is the real thing:
    * a compiled flatMap expanding each payload row into `frames` rows
    * inside the same partition batch, output keyed (media_id,
    * frame_idx) so downstream groupBys co-locate a clip's frames. Swap
    * the window-checksum for a JCodec/FFmpeg grab and nothing else
    * changes.
    */
  def sampleFrames(media: Dataset[MediaRow], frames: Int): Dataset[FrameRow] = {
    require(frames > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = r.payload.length
      (0 until frames).iterator.map { i =>
        // evenly spaced offsets, clipped for payloads shorter than N
        val off = if (n == 0) 0L else (n.toLong * i) / frames
        val end = math.min(n, off.toInt + 64)
        var sum = 0L
        var j = off.toInt
        while (j < end) { sum = sum * 31 + (r.payload(j) & 0xff); j += 1 }
        FrameRow(r.media_id, i, off, sum)
      }
    }
  }

  /** End-to-end pipeline over `documents` (text bytes as the payload):
    * partition by id for even batches, decode (text bytes take the stub
    * fallback arm — no image reader accepts them), return features.
    */
  def documentFeatures(spark: SparkSession, documents: DataFrame, partitions: Int = 32): DataFrame = {
    val media = toMediaRows(
      documents, idCol = "doc_id", binCol = "text",
      modality = "image", sourceCol = "source")
      .repartition(partitions, col("media_id"))
    decode(media).toDF()
  }

  /** Perceptual 64-bit difference hash per image. `decoded = false`
    * marks payloads no installed codec reads — their hash derives from
    * the byte checksum (deterministic, but NOT perceptual: two distinct
    * undecodable payloads never hash near each other).
    */
  final case class ImageHash(media_id: Long, dhash: Long, decoded: Boolean)

  /** dHash: area-averaged 9×8 grayscale grid; bit (y,x) set iff
    * cell(y,x) < cell(y,x+1). All-integer luminance/average math over
    * the decoded raster — no Graphics2D rendering pipeline — so hashes
    * are bit-identical across JVMs, executors, and retries. Small
    * pixel-level perturbations flip at most a few of the 64 gradient
    * bits, which is exactly what the banded Hamming join
    * ([[graft.operators.Dedup.hammingPairs64]]) needs from a signature.
    * Same mapPartitions batch shape (and codec init discipline) as
    * [[decode]].
    */
  def dHash64(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: java.io.IOException => null }
        if (img != null) ImageHash(r.media_id, dHashOf(img), decoded = true)
        else ImageHash(r.media_id, contentChecksum(r.payload), decoded = false)
      }
    }
  }

  private[multimodal] def dHashOf(img: java.awt.image.BufferedImage): Long = {
    val (gw, gh) = (9, 8)
    val w = img.getWidth
    val h = img.getHeight
    val cells = Array.ofDim[Long](gh, gw)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * h / gh
      val y1 = math.max(y0 + 1, (gy + 1) * h / gh) // ≥1 pixel for tiny images
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw
        val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            // integer BT.601 luma
            sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)) / 1000L
            x += 1
          }
          y += 1
        }
        val n = (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0)
        cells(gy)(gx) = if (n > 0) sum / n else 0L
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    var bit = 0
    var yy = 0
    while (yy < gh) {
      var xx = 0
      while (xx < gw - 1) {
        if (cells(yy)(xx) < cells(yy)(xx + 1)) hash |= (1L << bit)
        bit += 1
        xx += 1
      }
      yy += 1
    }
    hash
  }

  /** Image near-duplicate pairs: perceptual dHash + the banded Hamming
    * join — the multimodal arm of the dedup family. Only DECODED images
    * participate (stub hashes are checksums, not perceptual; pairing
    * them would conflate byte-equality with visual similarity — exact
    * byte dups are [[graft.operators.Dedup.exact]]'s job). Returns
    * (media_a, media_b, hamming); no false negatives at Hamming ≤ 3
    * with the default 4 × 16-bit bands.
    */
  def imageNearDuplicates(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    graft.operators.Dedup.hammingPairs64(
        dHash64(media).filter(_.decoded).toDF(), "media_id", "dhash", maxHamming)
      .withColumnRenamed("doc_a", "media_a")
      .withColumnRenamed("doc_b", "media_b")
}
