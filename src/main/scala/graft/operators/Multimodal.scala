package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling: payloads are opaque
  * `binary` columns with a typed metadata struct, processed per-partition
  * in batches — the Spark-side plumbing (schema, partitioning, iterator
  * batch shape) a production media pipeline needs.
  *
  * The IMAGE path is REAL: [[ImageCodec]] decodes PNG/BMP/JPEG payloads
  * with the JDK's `javax.imageio`, computes pixel statistics from the
  * raster, and resizes through `Graphics2D` — executed inside the same
  * `mapPartitions` batch shape. Audio/video decoding stays STUBBED
  * ([[FakeCodec]], clearly marked: no sound/video libraries in this
  * container); an image payload that does not parse falls back to the
  * stub's byte-level stats, so feature extraction is total.
  */
object Multimodal {

  /** media row schema: payload + typed metadata (the pattern: keep bytes
    * opaque, type the envelope). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("byte_min", IntegerType, nullable = false),
    StructField("byte_max", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = true),
    StructField("frames_sampled", IntegerType, nullable = true),
    StructField("resized_w", IntegerType, nullable = true),
    StructField("resized_h", IntegerType, nullable = true),
    // real-decode columns (null when the payload isn't a decodable image)
    StructField("decoded_w", IntegerType, nullable = true),
    StructField("decoded_h", IntegerType, nullable = true),
    StructField("px_min", IntegerType, nullable = true),
    StructField("px_max", IntegerType, nullable = true),
    StructField("px_sum", LongType, nullable = true)))

  /** REAL image codec on the JDK's javax.imageio — no external deps.
    * Pixel statistics read band 0 of the decoded raster (the gray
    * channel for grayscale images; red for RGB — deterministic either
    * way); resize is a real `Graphics2D` nearest-neighbor rescale.
    */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayInputStream

    final case class Decoded(width: Int, height: Int, pxMin: Int, pxMax: Int, pxSum: Long)

    def decode(payload: Array[Byte]): Option[BufferedImage] =
      if (payload == null || payload.isEmpty) None
      else try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: Exception => None }

    def stats(img: BufferedImage): Decoded = {
      val raster = img.getRaster
      val (w, h) = (img.getWidth, img.getHeight)
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = raster.getSample(x, y, 0)
          if (v < mn) mn = v
          if (v > mx) mx = v
          sum += v
          x += 1
        }
        y += 1
      }
      Decoded(w, h, mn, mx, sum)
    }

    /** Aspect-preserving resize to `targetW` (floor division, min height
      * 1 — the same dims contract as the stub's arithmetic). */
    def resize(img: BufferedImage, targetW: Int): BufferedImage = {
      val targetH = math.max(1, img.getHeight * targetW / img.getWidth)
      val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_BYTE_GRAY)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      out
    }

    /** Deterministic 8-bit grayscale PNG: pixel(x, y) = f(x, y). Used by
      * the synthetic-image generator and golden tests (PNG gray is
      * lossless, so decode returns exactly these samples). */
    def encodeGrayPng(width: Int, height: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { raster.setSample(x, y, 0, f(x, y) & 0xff); x += 1 }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
  }

  /** STUB codec — deterministic fake for the audio/video paths (and the
    * byte-level fallback when an image payload doesn't parse). */
  object FakeCodec {
    /** "Decode": byte-stream stats standing in for sample decoding. A real
      * implementation would parse the container format here.
      */
    def decode(payload: Array[Byte]): (Long, Long, Int, Int) = {
      var sum = 0L
      var mn = 255
      var mx = 0
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        sum += b
        if (b < mn) mn = b
        if (b > mx) mx = b
        i += 1
      }
      if (payload.isEmpty) (0L, 0L, 0, 0) else (payload.length.toLong, sum, mn, mx)
    }

    /** "Frame sampling": every k-th frame, capped — pure arithmetic on
      * the metadata, the real version would seek the container. */
    def sampleFrames(nFrames: Int, everyK: Int, cap: Int): Int =
      math.min(cap, if (nFrames <= 0) 0 else (nFrames + everyK - 1) / everyK)

    /** "Resize" to a target width preserving aspect ratio (floor
      * division, min height 1) — the real version would rescale pixels.
      */
    def resizeDims(width: Int, height: Int, targetW: Int): (Int, Int) =
      (targetW, math.max(1, height * targetW / width))
  }

  /** Per-partition batched feature extraction over the binary payloads.
    * `mapPartitions` (not a per-row UDF) so decoder/library initialization
    * amortizes per partition — the standard shape for native-lib media
    * work in Spark; payload bytes never hit the driver.
    *
    * kind = image: real `javax.imageio` decode → raster pixel stats +
    * `Graphics2D` resize (decoded_* / px_* / resized_* from the actual
    * image); undecodable payloads fall back to metadata-derived dims.
    * kind = audio/video: stub (see [[FakeCodec]]).
    */
  def decodeFeatures(media: DataFrame, frameEveryK: Int = 10, frameCap: Int = 16,
                     resizeTargetW: Int = 32): DataFrame = {
    val spark = media.sparkSession
    val rows: Dataset[Row] = media.select("media_id", "kind", "payload", "meta.width", "meta.height", "meta.n_frames")
    val out = rows.queryExecution.toRdd.mapPartitions { it =>
      // per-partition init would go here (native codec handles, buffers)
      it.map { internal =>
        val mediaId = internal.getLong(0)
        val kind = internal.getUTF8String(1).toString
        val payload = if (internal.isNullAt(2)) Array.empty[Byte] else internal.getBinary(2)
        val width = if (internal.isNullAt(3)) None else Some(internal.getInt(3))
        val height = if (internal.isNullAt(4)) None else Some(internal.getInt(4))
        val nFrames = if (internal.isNullAt(5)) None else Some(internal.getInt(5))
        val (n, sum, mn, mx) = FakeCodec.decode(payload)
        val decoded = kind match {
          case "image" => ImageCodec.decode(payload).map { img =>
            (ImageCodec.stats(img), ImageCodec.resize(img, resizeTargetW))
          }
          case _ => None
        }
        val nPixels = decoded match {
          case Some((d, _)) => Some(d.width.toLong * d.height)
          case None         => for (w <- width; h <- height) yield w.toLong * h
        }
        val sampled = kind match {
          case "video" => nFrames.map(f => FakeCodec.sampleFrames(f, frameEveryK, frameCap))
          case _       => None
        }
        val resized = decoded match {
          case Some((_, r)) => Some((r.getWidth, r.getHeight))
          case None if kind == "image" =>
            for (w <- width; h <- height if w > 0) yield FakeCodec.resizeDims(w, h, resizeTargetW)
          case None => None
        }
        Row(mediaId, kind, n, sum, mn, mx, nPixels.orNull, sampled.orNull,
          resized.map(_._1).orNull, resized.map(_._2).orNull,
          decoded.map(_._1.width).orNull, decoded.map(_._1.height).orNull,
          decoded.map(_._1.pxMin).orNull, decoded.map(_._1.pxMax).orNull,
          decoded.map(_._1.pxSum).orNull)
      }
    }
    spark.createDataFrame(out, featureSchema)
  }

  /** Synthesize a deterministic media table from the documents corpus
    * (payload = UTF-8 bytes of the text; metadata derived from doc
    * stats) — the offline stand-in for reading real media files.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 100 + 1).cast("int").as("n_frames")).as("meta"))

  /** Synthesize REAL grayscale PNG payloads, one per doc: width
    * `id%16+4`, height `id%12+4`, row-gradient pixel `(id+y)%256`. The
    * closed-form pixel function makes decoded statistics predictable by
    * a SQL oracle while the payload is a genuine PNG container that only
    * a real decoder can read. Encoded per-partition (same batch shape as
    * the decode side).
    */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val ids: Dataset[Row] = docs.select(col("doc_id"))
    val out = ids.queryExecution.toRdd.mapPartitions { it =>
      it.map { internal =>
        val id = internal.getLong(0)
        val w = (id % 16 + 4).toInt
        val h = (id % 12 + 4).toInt
        val png = ImageCodec.encodeGrayPng(w, h)((_, y) => ((id + y) % 256).toInt)
        Row(id, "image", png, Row(w, h, null, null))
      }
    }
    spark.createDataFrame(out, mediaSchema)
  }
}
