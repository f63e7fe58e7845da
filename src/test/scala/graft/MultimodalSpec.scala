package graft

import graft.functions.Multimodal
import graft.functions.Multimodal.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec multimodal path: PNG bytes synthesized per doc_id are
  * decoded back through javax.imageio inside the mapPartitions batch
  * shape; raster dimensions and channel means must round-trip exactly.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("PNG encode/decode round-trips dimensions and channel means") {
    for (id <- Seq(0L, 1L, 12L, 255L, 256L, 1234L)) {
      val bytes = MediaCodec.encodePng(id)
      // genuinely a PNG container, not a fake
      assert(bytes.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P', 'N', 'G'))
      val f = MediaCodec.decodeImage(id, bytes).get
      assert(f.width == (id % 13).toInt + 4)
      assert(f.height == (id % 7).toInt + 3)
      assert(f.mean_r == (id % 256).toInt)
      assert(f.mean_g == ((id * 7) % 256).toInt)
      assert(f.mean_b == ((id * 13) % 256).toInt)
    }
  }

  test("undecodable payloads are dropped, not fatal") {
    import spark.implicits._
    val df = Seq(
      (1L, MediaCodec.encodePng(1L)),
      (2L, Array[Byte](1, 2, 3, 4)), // garbage — no ImageIO reader
      (3L, null.asInstanceOf[Array[Byte]])) // null payload
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeImages(df, "doc_id", "payload").collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L))
  }

  test("q28 decodes every document's PNG distributed") {
    val rows = QueriesExt.q28_multimodal(spark, dir).collect()
    val n = Tables.table(spark, dir, "documents").count()
    assert(rows.length == n, "every payload must decode")
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 13).toInt + 4)
      assert(r.getInt(4) == ((id * 7) % 256).toInt)
    }
  }

  test("frame sampling emits every k-th chunk with correct sizes") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val df = Seq((7L, payload)).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(df, "doc_id", "payload", 16, 2)
      .collect()
    // chunks: 7 of 16 bytes (last 4) — every 2nd kept: 0, 2, 4, 6
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4, 6))
    assert(frames.last.getInt(2) == 4)
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(df, "doc_id", "payload", 0, 2)
    }
  }

  test("WAV encode/decode round-trips format, frames and peak") {
    for (id <- Seq(0L, 1L, 49L, 999L, 1000L, 4321L)) {
      val bytes = MediaCodec.encodeWav(id)
      assert(new String(bytes.take(4), "UTF-8") == "RIFF")
      val f = MediaCodec.decodeAudio(id, bytes).get
      assert(f.sample_rate == 8000 && f.channels == 1)
      assert(f.n_samples == (id % 50) + 20)
      assert(f.peak == (id % 1000).toInt * 16)
    }
    // garbage is dropped, not fatal
    assert(MediaCodec.decodeAudio(7L, Array[Byte](9, 9, 9, 9)).isEmpty)
  }

  test("q90 decodes every document's WAV distributed") {
    val rows = QueriesExt.q90_audio(spark, dir).collect()
    val n = Tables.table(spark, dir, "documents").count()
    assert(rows.length == n)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(3) == (id % 50) + 20)
      assert(r.getInt(4) == (id % 1000).toInt * 16)
    }
  }

  test("GVID encode/decode walks the container and samples frames") {
    for (id <- Seq(0L, 1L, 3L, 255L, 1234L)) {
      val bytes = MediaCodec.encodeVideo(id)
      assert(new String(bytes.take(4), "UTF-8") == "GVID")
      val nFrames = (id % 4).toInt + 2
      // everyK=1 decodes every frame; each is the PNG of id*31+frame
      val all = MediaCodec.decodeVideoFrames(id, bytes, 1)
      assert(all.map(_.frame_no) == (0 until nFrames))
      all.foreach { f =>
        val fid = id * 31 + f.frame_no
        assert(f.width == (fid % 13).toInt + 4)
        assert(f.height == (fid % 7).toInt + 3)
        assert(f.mean_r == (fid % 256).toInt)
      }
      // everyK=2 samples the even frames only
      val sampled = MediaCodec.decodeVideoFrames(id, bytes, 2)
      assert(sampled.map(_.frame_no) == (0 until nFrames by 2))
    }
    // garbage containers yield no rows, never an exception
    assert(MediaCodec.decodeVideoFrames(7L, Array[Byte](9, 9), 1).isEmpty)
    assert(MediaCodec.decodeVideoFrames(7L,
      "GVIDgarbage-after-magic".getBytes("UTF-8"), 1).isEmpty)
    // truncated mid-frame: header says 2 frames, payload cut short
    val good = MediaCodec.encodeVideo(5L)
    assert(MediaCodec.decodeVideoFrames(5L, good.take(20), 1).isEmpty)
  }

  test("q94 samples and decodes every document's video distributed") {
    val rows = QueriesExt.q94_video_frames(spark, dir).collect()
    val expected = Tables.table(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
      .map(id => ((id % 4) + 2 + 1) / 2).sum // ceil(nFrames/2) sampled
    assert(rows.length == expected)
    rows.foreach { r =>
      val fid = r.getLong(0) * 31 + r.getInt(1)
      assert(r.getInt(1) % 2 == 0, "only even frames are sampled")
      assert(r.getInt(2) == (fid % 13).toInt + 4)
      assert(r.getInt(5) == ((fid * 7) % 256).toInt)
    }
  }

  test("byte stats survive payloads no decoder understands") {
    import spark.implicits._
    val df = Seq((9L, "RIFFxxxx-not-an-image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val s = Multimodal.byteStats(df, "doc_id", "payload").collect().head
    assert(s.magic == "RIFF" && s.n_bytes == 21L)
  }
}
