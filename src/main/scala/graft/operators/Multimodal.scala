package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling: payloads are opaque
  * `binary` columns with a typed metadata struct, processed per-partition
  * in batches — the Spark-side plumbing (schema, partitioning, iterator
  * batch shape) a production media pipeline needs.
  *
  * The actual codec step is STUBBED: this container has no image/audio
  * libraries, so `decodeFeatures` computes a deterministic fake
  * "decode" from the raw bytes (dimensions from the metadata struct,
  * intensity stats from the byte stream). The stub is clearly marked and
  * isolated in [[FakeCodec]] — swapping in a real JNI/JavaCV decoder
  * changes only that object; the dataflow, schema and batching stay.
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
    StructField("resized_h", IntegerType, nullable = true)))

  /** STUB codec — deterministic fake in place of a real decoder. */
  object FakeCodec {
    /** "Decode": byte-stream stats standing in for pixel decoding. A real
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
    * `mapPartitions` (not a per-row UDF) so a real decoder could amortize
    * codec/library initialization per partition — the standard shape for
    * native-lib media work in Spark; payload bytes never hit the driver.
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
        val nPixels = for (w <- width; h <- height) yield w.toLong * h
        val sampled = kind match {
          case "video" => nFrames.map(f => FakeCodec.sampleFrames(f, frameEveryK, frameCap))
          case _       => None
        }
        val resized = kind match {
          case "image" =>
            for (w <- width; h <- height if w > 0) yield FakeCodec.resizeDims(w, h, resizeTargetW)
          case _ => None
        }
        Row(mediaId, kind, n, sum, mn, mx, nPixels.orNull, sampled.orNull,
          resized.map(_._1).orNull, resized.map(_._2).orNull)
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
}
