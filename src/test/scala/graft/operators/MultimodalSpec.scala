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

    it("decodes a real WAV: channel-0 sample stats from a PCM round-trip") {
      // samples 0, -100, 200, 300, -400 at 8 kHz
      val vals = Array(0, -100, 200, 300, -400)
      val wav = Multimodal.AudioCodec.encodePcm16Wav(8000, vals.length)(vals(_))
      val df = mediaDf(Seq(Row(1L, "audio", wav, meta(null, null, 8000, null))))
      val r = df.transform(Multimodal.decodeFeatures(_)).collect().head
      assert(r.getInt(15) == 8000)     // sample_rate from the REAL header
      assert(r.getLong(16) == 5L)      // n_samples
      assert(r.getInt(17) == -400 && r.getInt(18) == 300) // smp_min / smp_max
      assert(r.getLong(19) == 0L)      // smp_sum
      assert(r.getLong(20) == 0L)      // 5 samples / 8000 Hz → 0 ms (floor)
    }

    it("a stereo WAV reports channel-0 stats only") {
      // interleave L = i*10, R = 9999 by hand-building a 2-channel stream
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val n = 4
      val fmt = new AudioFormat(16000f, 16, 2, true, false)
      val bytes = new Array[Byte](n * 4)
      for (i <- 0 until n) {
        val l = i * 10; val rr = 9999
        bytes(4 * i) = (l & 0xff).toByte; bytes(4 * i + 1) = ((l >> 8) & 0xff).toByte
        bytes(4 * i + 2) = (rr & 0xff).toByte; bytes(4 * i + 3) = ((rr >> 8) & 0xff).toByte
      }
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, n.toLong),
        AudioFileFormat.Type.WAVE, baos)
      val d = Multimodal.AudioCodec.decode(baos.toByteArray).get
      assert(d.nSamples == 4 && d.smpMin == 0 && d.smpMax == 30 && d.smpSum == 60)
    }

    it("decodes a real animated GIF: true frame count, sampling, pixel stats") {
      // 3 frames of 2x2, frame fr constant color 50*fr → values 0,50,100
      val gif = Multimodal.VideoCodec.encodeGrayGif(2, 2, 3)((fr, _, _) => 50 * fr)
      val df = mediaDf(Seq(Row(1L, "video", gif, meta(9, 9, null, Int.box(999)))))
      // everyK=2 → sample frames 0 and 2 (values 0 and 100), not frame 1
      val r = df.transform(Multimodal.decodeFeatures(_, frameEveryK = 2, frameCap = 16))
        .collect().head
      assert(r.getInt(21) == 3)        // n_frames from the REAL container, not meta
      assert(r.getInt(7) == 2)         // frames_sampled
      assert(r.getInt(10) == 2 && r.getInt(11) == 2) // decoded frame dims
      assert(r.getLong(6) == 4L)       // n_pixels per frame
      assert(r.getInt(12) == 0 && r.getInt(13) == 100) // px over SAMPLED frames only
      assert(r.getLong(14) == (0 + 100) * 4L)
    }

    it("ingests a real media directory via binaryFile end-to-end into decoded features") {
      withTempDir { dir =>
        val png = Multimodal.ImageCodec.encodeGrayPng(3, 2)((x, y) => 10 * y + x)
        val wav = Multimodal.AudioCodec.encodePcm16Wav(8000, 3)(i => i * 100)
        val gif = Multimodal.VideoCodec.encodeGrayGif(2, 2, 3)((fr, _, _) => 40 * fr)
        java.nio.file.Files.write(dir.toPath.resolve("a.png"), png)
        java.nio.file.Files.write(dir.toPath.resolve("b.wav"), wav)
        java.nio.file.Files.write(dir.toPath.resolve("c.gif"), gif)
        java.nio.file.Files.write(dir.toPath.resolve("d.xyz"), Array[Byte](1, 2, 3))
        val media = Multimodal.readMediaDir(spark, dir.getAbsolutePath)
        val out = media.transform(Multimodal.decodeFeatures(_, frameEveryK = 2))
          .collect().map(r => r.getString(1) -> r).toMap
        assert(out.keySet == Set("image", "audio", "video", "unknown"))
        assert(out("image").getInt(10) == 3 && out("image").getLong(14) == 36L) // decoded_w, px_sum
        assert(out("audio").getLong(16) == 3L && out("audio").getInt(18) == 200) // n_samples, smp_max
        assert(out("video").getInt(21) == 3 && out("video").getInt(7) == 2) // n_frames, sampled
        assert(out("unknown").getLong(2) == 3L) // byte-stats fallback
        // metadata pushdown: glob filter prunes to one file at the source
        assert(Multimodal.readMediaDir(spark, dir.getAbsolutePath, Some("*.wav")).count() == 1)
      }
    }

    it("frame cap bounds decoded frames; undecodable video falls back to meta arithmetic") {
      val gif = Multimodal.VideoCodec.encodeGrayGif(2, 1, 10)((fr, _, _) => fr)
      val capped = Multimodal.VideoCodec.decodeFrames(gif, everyK = 1, cap = 4).get
      assert(capped.nFrames == 10 && capped.framesSampled == 4 && capped.pxMax == 3)
      // cap <= 0 would return sentinel stats as real values — must throw
      intercept[IllegalArgumentException] {
        Multimodal.VideoCodec.decodeFrames(gif, everyK = 1, cap = 0)
      }
      val df = mediaDf(Seq(Row(5L, "video", Array[Byte](1, 2, 3), meta(2, 2, null, Int.box(25)))))
      val r = df.transform(Multimodal.decodeFeatures(_, frameEveryK = 10, frameCap = 16))
        .collect().head
      assert(r.isNullAt(21))           // no real container → no true frame count
      assert(r.getInt(7) == 3)         // metadata fallback: ceil(25/10)
    }
  }

  describe("Multimodal.ImageCodec.dhash64 + imagePhash") {
    import Multimodal.ImageCodec

    it("computes the documented box-mean comparison bits on a cell-aligned image") {
      // 18×16 → 9×8 cells of 2×2; cell value = r*9 + c (row-major ramp):
      // every horizontal comparison is an increase → all 64 bits set
      val up = ImageCodec.encodeGrayPng(18, 16)((x, y) => (y / 2) * 9 + (x / 2))
      assert(ImageCodec.dhash64(ImageCodec.decode(up).get) == -1L)
      // reversed ramp → no increase anywhere → 0
      val down = ImageCodec.encodeGrayPng(18, 16)((x, y) => 80 - ((y / 2) * 9 + (x / 2)))
      assert(ImageCodec.dhash64(ImageCodec.decode(down).get) == 0L)
    }

    it("is robust to uniform scaling and brightness shift, unlike byte hashes") {
      def ramp(scale: Int, bright: Int) =
        ImageCodec.encodeGrayPng(18 * scale, 16 * scale)(
          (x, y) => (y / (2 * scale)) * 9 + x / (2 * scale) + bright)
      val base = ImageCodec.dhash64(ImageCodec.decode(ramp(1, 0)).get)
      assert(ImageCodec.dhash64(ImageCodec.decode(ramp(2, 0)).get) == base)
      assert(ImageCodec.dhash64(ImageCodec.decode(ramp(1, 40)).get) == base)
    }

    it("hashes through the DataFrame seam; undecodable payloads go null") {
      val df = mediaDf(Seq(
        Row(1L, "image", ImageCodec.encodeGrayPng(18, 16)((x, _) => x), meta(18, 16, null, null)),
        Row(2L, "image", Array[Byte](1, 2, 3), meta(9, 8, null, null))))
      val out = Multimodal.imagePhash(df).collect().map(r => r.getLong(0) -> r).toMap
      assert(!out(1L).isNullAt(1))
      assert(out(2L).isNullAt(1))
    }
  }

  describe("Multimodal.AudioCodec.energyHash64 + audioPhash") {
    import Multimodal.AudioCodec

    it("computes the documented frame-mean comparison bits through a real WAV round-trip") {
      // 520 samples = 65 frames of 8; frame value = f (rising energy):
      // every consecutive-frame comparison increases → all 64 bits set
      val up = AudioCodec.encodePcm16Wav(8000, 520)(i => i / 8)
      assert(AudioCodec.energyHash64(AudioCodec.decodeSamples(up).get) == -1L)
      // falling energy → no increase anywhere → 0
      val down = AudioCodec.encodePcm16Wav(8000, 520)(i => 64 - i / 8)
      assert(AudioCodec.energyHash64(AudioCodec.decodeSamples(down).get) == 0L)
      // energy means use |sample|: negated waveform hashes identically
      val upNeg = AudioCodec.encodePcm16Wav(8000, 520)(i => -(i / 8))
      assert(AudioCodec.energyHash64(AudioCodec.decodeSamples(upNeg).get) == -1L)
    }

    it("is exactly invariant to uniform gain, and total on short clips") {
      def wav(gain: Int) = AudioCodec.encodePcm16Wav(8000, 333)(
        i => gain * (((i * 37) % 101) - 50))
      val base = AudioCodec.energyHash64(AudioCodec.decodeSamples(wav(1)).get)
      assert(AudioCodec.energyHash64(AudioCodec.decodeSamples(wav(2)).get) == base)
      // clips shorter than 65 samples: empty frames read mean 0 (total)
      val tiny = AudioCodec.encodePcm16Wav(8000, 3)(i => i + 1)
      assert(AudioCodec.decodeSamples(tiny).get.length == 3)
      AudioCodec.energyHash64(AudioCodec.decodeSamples(tiny).get) // must not throw
      assert(AudioCodec.energyHash64(Array.empty[Int]) == 0L)
    }

    it("hashes through the DataFrame seam; undecodable payloads go null") {
      val df = mediaDf(Seq(
        Row(1L, "audio", AudioCodec.encodePcm16Wav(8000, 520)(i => i / 8), meta(null, null, 8000, null)),
        Row(2L, "audio", Array[Byte](1, 2, 3), meta(null, null, 8000, null))))
      val out = Multimodal.audioPhash(df).collect().map(r => r.getLong(0) -> r).toMap
      assert(out(1L).getLong(1) == -1L)
      assert(out(2L).isNullAt(1))
    }
  }

  describe("Multimodal.incrementalPhash") {
    // id -> a distinct tiny PNG; `variant` flips content without changing id
    def png(id: Long, variant: Int = 0) =
      Multimodal.ImageCodec.encodeGrayPng(8, 8)((x, y) =>
        ((id * 31 + variant * 97 + x * 5 + y * 11) % 200).toInt)
    def media(rows: (Long, Int)*) =
      mediaDf(rows.map { case (id, v) => Row(id, "image", png(id, v), meta(8, 8, null, null)) })

    it("decodes EXACTLY the added+changed delta, retains the rest, drops removed") {
      val prev = media((1L, 0), (2L, 0), (3L, 0), (4L, 0), (9L, 0))
      val store = Multimodal.phashStore(prev, Multimodal.imagePhash)
      // next crawl: 9 removed; 3 changed (variant 1); 5, 6 added; 1,2,4 unchanged
      val next = media((1L, 0), (2L, 0), (3L, 1), (4L, 0), (5L, 0), (6L, 0))
      var decoded: Set[Long] = Set.empty
      val countingFp: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        m => {
          decoded = m.select("media_id").collect().map(_.getLong(0)).toSet
          Multimodal.imagePhash(m)
        }
      val out = Multimodal.incrementalPhash(next, store, countingFp)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
      assert(decoded == Set(3L, 5L, 6L), "decode set must be the delta only")
      val full = Multimodal.imagePhash(next)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out.view.mapValues(_._1).toMap == full,
        "maintained store must equal a full recompute")
      assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L)) // 9 dropped
      assert(out.filter(_._2._2 == "decoded").keySet == Set(3L, 5L, 6L))
      assert(out.filter(_._2._2 == "retained").keySet == Set(1L, 2L, 4L))
    }

    it("is a fixpoint on an unchanged crawl: zero decodes") {
      val m = media((1L, 0), (2L, 0))
      val store = Multimodal.phashStore(m, Multimodal.imagePhash)
      var called = false
      val out = Multimodal.incrementalPhash(m, store,
        df => { called = df.select("media_id").count() > 0; Multimodal.imagePhash(df) })
      assert(out.filter(out("src") === "retained").count() == 2)
      assert(!called, "no payload may reach decode on an unchanged crawl")
    }
  }
}
