package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def mediaDf(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)

  private def meta(w: Integer, h: Integer, sr: Integer, nf: Integer) = Row(w, h, sr, nf)

  describe("Multimodal.decodeFeatures") {
    it("computes byte stats and pixel counts from payload + metadata") {
      val df = mediaDf(Seq(
        Row(1L, "image", Array[Byte](0, 10, 100), meta(4, 3, null, null)),
        Row(2L, "audio", Array[Byte](-1), meta(null, null, 16000, null))))
      val out = df.transform(Multimodal.decodeFeatures(_))
        .collect().map(r => r.getLong(0) -> r).toMap
      val img = out(1L)
      assert(img.getLong(2) == 3L)      // n_bytes
      assert(img.getLong(3) == 110L)    // byte_sum
      assert(img.getInt(4) == 0 && img.getInt(5) == 100)
      assert(img.getLong(6) == 12L)     // n_pixels = 4*3
      assert(img.isNullAt(7))           // not video
      val aud = out(2L)
      assert(aud.getLong(3) == 255L)    // unsigned byte handling
      assert(aud.isNullAt(6))           // no dimensions
    }

    it("handles null/empty payloads and caps video frame sampling") {
      val df = mediaDf(Seq(
        Row(3L, "video", null, meta(2, 2, null, Int.box(1000))),
        Row(4L, "video", Array[Byte](1), meta(2, 2, null, Int.box(25)))))
      val out = df.transform(Multimodal.decodeFeatures(_, frameEveryK = 10, frameCap = 16))
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(out(3L).getLong(2) == 0L)  // null payload → 0 bytes
      assert(out(3L).getInt(7) == 16)   // 1000/10 = 100, capped at 16
      assert(out(4L).getInt(7) == 3)    // ceil(25/10)
    }
  }
}
