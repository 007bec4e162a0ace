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

    it("decodes a real PNG: raster pixel stats and Graphics2D resize dims") {
      // golden 3x2 gradient: pixel(x,y) = 10*y + x →
      // rows (0,1,2) and (10,11,12); min 0, max 12, sum 36
      val png = Multimodal.ImageCodec.encodeGrayPng(3, 2)((x, y) => 10 * y + x)
      val df = mediaDf(Seq(Row(1L, "image", png, meta(999, 999, null, null))))
      val r = df.transform(Multimodal.decodeFeatures(_, resizeTargetW = 6)).collect().head
      assert(r.getInt(10) == 3 && r.getInt(11) == 2)  // decoded_w/h from the REAL image,
      assert(r.getLong(6) == 6L)                      // n_pixels = 3*2, not the lying meta
      assert(r.getInt(12) == 0 && r.getInt(13) == 12) // px_min / px_max
      assert(r.getLong(14) == 36L)                    // px_sum
      assert(r.getInt(8) == 6 && r.getInt(9) == 4)    // resize 3x2 → 6x4 (aspect kept)
    }

    it("constant-color PNG survives resize with identical pixel values") {
      val png = Multimodal.ImageCodec.encodeGrayPng(8, 4)((_, _) => 77)
      val img = Multimodal.ImageCodec.decode(png).get
      val resized = Multimodal.ImageCodec.resize(img, 16)
      val st = Multimodal.ImageCodec.stats(resized)
      assert(st.width == 16 && st.height == 8)
      assert(st.pxMin == 77 && st.pxMax == 77) // real rescale of real pixels
    }

    it("an undecodable image payload falls back to metadata-derived stats") {
      val df = mediaDf(Seq(Row(2L, "image", Array[Byte](1, 2, 3), meta(4, 3, null, null))))
      val r = df.transform(Multimodal.decodeFeatures(_)).collect().head
      assert(r.getLong(6) == 12L)                    // meta n_pixels fallback
      assert(r.isNullAt(10) && r.isNullAt(14))       // no decoded_* columns
      assert(r.getInt(8) == 32)                      // stub resize dims
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
