package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: opaque binary payloads (image / audio /
  * video bytes) carried as `BinaryType` columns with typed metadata,
  * processed batch-wise via `Dataset.mapPartitions` (the Scala
  * equivalent of a pandas/Arrow batch UDF: one iterator per partition,
  * codec state initialized once per partition, rows streamed through).
  *
  * The image path is REAL: PNG payloads are decoded with the JDK's
  * `javax.imageio` (no external codec needed) into width / height /
  * per-channel means. Containers the JDK cannot parse (JPEG-XL, MP4,
  * WAV…) would plug into the same [[decodeImages]] batch seam with an
  * external codec binding; [[byteStats]] covers the codec-agnostic
  * byte-level metadata either way.
  */
object Multimodal {

  /** codec-agnostic byte-level metadata for one media payload */
  final case class ByteStats(
      doc_id: Long,
      n_bytes: Long,
      magic: String,
      checksum: Long)

  /** decoded raster features for one image payload */
  final case class ImageFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      mean_r: Int,
      mean_g: Int,
      mean_b: Int)

  /** decoded + sampled frame features for one video payload */
  final case class VideoFrameFeatures(
      doc_id: Long,
      frame_no: Int,
      width: Int,
      height: Int,
      mean_r: Int,
      mean_g: Int,
      mean_b: Int)

  /** decoded waveform features for one audio payload */
  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      peak: Int)

  /** 64-bit perceptual average-hash of one image payload, split into
    * two non-negative 32-bit halves so SQL engines never shift into a
    * BIGINT sign bit */
  final case class PerceptualHash(
      doc_id: Long,
      ahash_hi: Long,
      ahash_lo: Long)

  object MediaCodec {
    /** Deterministic solid-RGB PNG for a document id — the fixture
      * generator (this container ships no media files, so the tests
      * synthesize real PNG bytes and round-trip them through the real
      * decoder). Dimensions and channel values are pure functions of
      * the id, which is what lets a SQL oracle verify the decode. */
    def encodePng(docId: Long): Array[Byte] = {
      val w = (docId % 13).toInt + 4
      val h = (docId % 7).toInt + 3
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (((docId % 256).toInt) << 16) |
        ((((docId * 7) % 256).toInt) << 8) | ((docId * 13) % 256).toInt
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** REAL image decode via the JDK's ImageIO (PNG/BMP/GIF): raster
      * dimensions + integer mean of each RGB channel. None for bytes
      * no installed reader understands — a poisoned payload must not
      * kill a 100 TB job. */
    def decodeImage(docId: Long, bytes: Array[Byte]): Option[ImageFeatures] = {
      // NonFatal, not just IOException: the JDK codecs throw runtime
      // exceptions (IllegalArgument, NegativeArraySize, …) on
      // malformed headers — any of them escaping kills the whole job
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      Option(img).map { im =>
        val (w, h) = (im.getWidth, im.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = im.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        ImageFeatures(docId, w, h,
          (sr / n).toInt, (sg / n).toInt, (sb / n).toInt)
      }
    }

    /** Deterministic 16x16 grayscale-gradient PNG for a document id:
      * pixel (x, y) carries (docId + 16x + 7y) mod 256 in all three
      * channels. Unlike the solid fixture, the gradient makes the
      * average-hash non-degenerate, and because the value depends on
      * docId only mod 256, ids congruent mod 256 produce IDENTICAL
      * images — real perceptual-duplicate groups for the dedup
      * operator, all derivable in closed form by a SQL oracle. */
    def encodeGradientPng(docId: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) {
          val g = ((docId + 16L * x + 7L * y) % 256).toInt
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** REAL perceptual average-hash (aHash) via the JDK decoder: the
      * raster is binned into an 8x8 grid, each cell's mean gray is
      * compared against the whole image's mean gray, and the 64
      * brighter-than-average bits pack into a hash — near-identical
      * images land at small Hamming distance. All comparisons are
      * integer cross-multiplications (cellSum * totalPixels >=
      * totalSum * cellPixels), so the bits are exact and
      * oracle-reproducible. None for undecodable payloads. */
    def aHash(docId: Long, bytes: Array[Byte]): Option[PerceptualHash] = {
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      Option(img).map { im =>
        val (w, h) = (im.getWidth, im.getHeight)
        val sums = new Array[Long](64)
        val cnts = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < h) {
          val by = y * 8 / h
          var x = 0
          while (x < w) {
            val p = im.getRGB(x, y)
            val gray = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) +
              (p & 0xff)) / 3
            val b = by * 8 + x * 8 / w
            sums(b) += gray; cnts(b) += 1; total += gray
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        var hi = 0L; var lo = 0L
        var b = 0
        while (b < 64) {
          // cell mean >= image mean, in exact integer math; empty
          // cells (images narrower than the 8x8 grid) stay 0
          if (cnts(b) > 0 && sums(b) * n >= total * cnts(b)) {
            if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
          }
          b += 1
        }
        PerceptualHash(docId, hi, lo)
      }
    }

    def stats(docId: Long, bytes: Array[Byte]): ByteStats = {
      val magic = new String(bytes.take(4), "UTF-8")
      val checksum = bytes.take(16).foldLeft(0L)((a, b) => a + (b & 0xff))
      ByteStats(docId, bytes.length.toLong, magic, checksum)
    }

    /** Deterministic 16-bit mono PCM WAV for a document id — constant
      * amplitude, so the decoded peak is an exact function of the id
      * and a SQL oracle can verify the decode. */
    def encodeWav(docId: Long): Array[Byte] = {
      val nSamples = (docId % 50).toInt + 20
      val amp = ((docId % 1000) * 16).toInt // within 16-bit range
      val pcm = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) { // little-endian 16-bit signed
        pcm(2 * i) = (amp & 0xff).toByte
        pcm(2 * i + 1) = ((amp >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
        true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Deterministic "video" container for a document id: a `GVID`
      * magic + frame count header followed by length-prefixed REAL PNG
      * frames (each encoded by [[encodePng]] with a per-frame id, so
      * every frame's dimensions and color are pure functions of
      * (doc_id, frame_no) — SQL-oracle-verifiable through the real
      * image decoder). Container-with-keyframe-index is the shape real
      * video formats share; a production codec binding would replace
      * the per-frame PNG decode, not the container walk. */
    def encodeVideo(docId: Long): Array[Byte] = {
      val nFrames = (docId % 4).toInt + 2
      val bos = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(bos)
      dos.writeBytes("GVID")
      dos.writeInt(nFrames)
      var i = 0
      while (i < nFrames) {
        val png = encodePng(docId * 31 + i)
        dos.writeInt(png.length)
        dos.write(png)
        i += 1
      }
      dos.flush()
      bos.toByteArray
    }

    /** Walk a GVID container and decode every `everyK`-th frame with
      * the real image decoder — frame SAMPLING happens on the
      * container index (undecoded frames are skipped, not parsed),
      * which is what makes sampling cheap on real containers too.
      * Unparseable containers yield no rows, never an exception. */
    def decodeVideoFrames(docId: Long, bytes: Array[Byte], everyK: Int)
        : Seq[VideoFrameFeatures] = {
      // caller bug, not poisoned data — must NOT be swallowed by the
      // NonFatal net below (everyK=0 would otherwise silently yield
      // zero frames for every container in the corpus)
      require(everyK > 0, s"everyK ($everyK) must be positive")
      try {
        val dis = new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val magic = new Array[Byte](4)
        dis.readFully(magic)
        if (new String(magic, "UTF-8") != "GVID") Nil
        else {
          val n = dis.readInt()
          if (n < 0 || n > (1 << 20)) Nil // poisoned header, not fatal
          else (0 until n).flatMap { i =>
            val len = dis.readInt()
            if (len < 0 || len > bytes.length) return Nil
            if (i % everyK == 0) {
              val frame = new Array[Byte](len)
              dis.readFully(frame)
              decodeImage(docId, frame).map(f => VideoFrameFeatures(
                docId, i, f.width, f.height, f.mean_r, f.mean_g, f.mean_b))
            } else {
              // sampling must cost index-walk time, not container
              // size: skipped frames are never copied out
              var left = len
              while (left > 0) {
                val sk = dis.skipBytes(left)
                if (sk <= 0) return Nil // truncated container
                left -= sk
              }
              None
            }
          }
        }
      } catch {
        case scala.util.control.NonFatal(_) => Nil
      }
    }

    /** REAL audio decode via the JDK's javax.sound.sampled (WAV/AIFF):
      * container-parsed format + frame count + peak amplitude from the
      * PCM samples. None for payloads no installed reader parses. */
    def decodeAudio(docId: Long, bytes: Array[Byte]): Option[AudioFeatures] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        val n = ais.getFrameLength
        val data = ais.readAllBytes()
        ais.close()
        var peak = 0
        if (fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian) {
          var i = 0
          while (i + 1 < data.length) {
            val s = ((data(i + 1) << 8) | (data(i) & 0xff))
            if (math.abs(s) > peak) peak = math.abs(s)
            i += 2
          }
        }
        Some(AudioFeatures(docId, fmt.getSampleRate.toInt,
          fmt.getChannels, n, peak))
      } catch {
        case scala.util.control.NonFatal(_) => None
      }
  }

  /** Decode an image payload column into raster features. Batch-shaped
    * like a vectorized UDF: one decoder pass per partition iterator,
    * no per-row driver involvement, output a typed Dataset. Undecodable
    * payloads are dropped, not fatal. */
  def decodeImages(df: DataFrame, idCol: String, binCol: String)
      : Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .na.drop()
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point for an expensive external codec;
        // ImageIO readers are looked up per call, nothing to hoist
        it.flatMap { case (id, bytes) => MediaCodec.decodeImage(id, bytes) }
      }
  }

  /** Perceptual average-hash over an image payload column — same
    * mapPartitions batch shape as [[decodeImages]]; undecodable
    * payloads dropped, not fatal. */
  def aHashImages(df: DataFrame, idCol: String, binCol: String)
      : Dataset[PerceptualHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .na.drop()
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodec.aHash(id, bytes) })
  }

  /** Decode an audio payload column into waveform features — same
    * batch shape as [[decodeImages]]; undecodable payloads dropped. */
  def decodeAudioCol(df: DataFrame, idCol: String, binCol: String)
      : Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .na.drop()
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodec.decodeAudio(id, bytes) })
  }

  /** Decode a video payload column into sampled frame features — one
    * row per sampled frame, same mapPartitions batch shape as
    * [[decodeImages]]; unparseable containers dropped. */
  def decodeVideoCol(df: DataFrame, idCol: String, binCol: String,
      everyK: Int): Dataset[VideoFrameFeatures] = {
    require(everyK > 0, s"everyK ($everyK) must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .na.drop()
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodec.decodeVideoFrames(id, bytes, everyK) })
  }

  /** Codec-agnostic byte-level metadata from a binary payload column
    * (works for payloads no decoder understands). */
  def byteStats(df: DataFrame, idCol: String, binCol: String)
      : Dataset[ByteStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    // one bad row (null id / null payload) must not kill a 100 TB job
    // — drop it before the typed decode
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .na.drop()
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => MediaCodec.stats(id, bytes) })
  }

  /** Frame sampling for video-like payloads: emit every k-th chunk of
    * the payload as its own row (binary slicing stays distributed). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      chunkBytes: Int, everyK: Int): DataFrame = {
    require(chunkBytes > 0 && everyK > 0, // fail on the driver, not mid-job
      s"chunkBytes ($chunkBytes) and everyK ($everyK) must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .na.drop()
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(chunkBytes).zipWithIndex
          .filter(_._2 % everyK == 0)
          .map { case (chunk, i) => (id, i, chunk.length, chunk) }
      }
      .toDF(idCol, "frame_no", "frame_bytes_len", "frame_bytes")
  }
}
