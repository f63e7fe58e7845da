package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: opaque binary payloads (image / audio /
  * video bytes) carried as `BinaryType` columns with typed metadata,
  * processed batch-wise via `Dataset.mapPartitions` (the Scala
  * equivalent of a pandas/Arrow batch UDF: one iterator per partition,
  * codec state initialized once per partition, rows streamed through).
  *
  * The actual media decode is a STUB — this container has no
  * image/audio codecs. [[MediaDecoder.decodeStub]] derives
  * deterministic fake metadata from the raw bytes so the Spark-side
  * plumbing (schema, batching, partitioning, typed output) is real and
  * testable end-to-end; swap `decodeStub` for a real codec binding in
  * production.
  */
object Multimodal {

  /** typed metadata extracted from one media payload */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      magic: String,
      width: Int,
      height: Int,
      frames: Int,
      checksum: Long)

  object MediaDecoder {
    /** STUB: a real implementation would parse the container format
      * (JPEG/PNG/WAV/MP4) here. The fake is a pure deterministic
      * function of the bytes — ??? marks the seam for a real codec. */
    def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
      // real codec goes here:  val img = ImageIO.read(...)   (???)
      val n = bytes.length
      val width = (n % 64) + 16
      val height = (n % 48) + 16
      val frames = (n % 7) + 1
      (width, height, frames)
    }

    def features(docId: Long, bytes: Array[Byte]): MediaFeatures = {
      val (w, h, f) = decodeStub(bytes)
      val magic = new String(bytes.take(4), "UTF-8")
      val checksum = bytes.take(16).foldLeft(0L)((a, b) => a + (b & 0xff))
      MediaFeatures(docId, bytes.length.toLong, magic, w, h, f, checksum)
    }
  }

  /** Extract typed metadata from a binary payload column. Batch-shaped
    * like a vectorized UDF: one decoder pass per partition iterator,
    * no per-row driver involvement, output is a typed Dataset.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String)
      : Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    // one bad row (null id / null payload) must not kill a 100 TB job
    // — drop it before the typed decode
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .na.drop()
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point for a real codec (expensive state
        // is created once here, not per row)
        it.map { case (id, bytes) => MediaDecoder.features(id, bytes) }
      }
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
