package graft.pipeline

import java.time.Instant
import org.scalatest.funspec.AnyFunSpec

/** Mirrors the reference's DynamicPathSpec.scala:20-53 +
  * KinesisS3EmitterSpec.scala getBaseFilename goldens.
  */
class DynamicPathSpec extends AnyFunSpec {
  private val time = Instant.ofEpochMilli(100000L)

  describe("decorateDirectoryWithTime") {
    it("decorates a single time pattern") {
      assert(DynamicPath.decorateDirectoryWithTime("something/{YYYY}/bar.gz", time)
        == "something/1970/bar.gz")
    }
    it("decorates multiple time patterns") {
      assert(DynamicPath.decorateDirectoryWithTime("something/{YYYY}/{mm}dy={dd}/bar.gz", time)
        == "something/1970/01dy=01/bar.gz")
    }
    it("keeps literal content of invalid patterns, braces stripped") {
      assert(DynamicPath.decorateDirectoryWithTime("something/{YYYY}/{foo}/bar.gz", time)
        == "something/1970/foo/bar.gz")
    }
    it("handles paths with no patterns") {
      assert(DynamicPath.decorateDirectoryWithTime("bar.gz", time) == "bar.gz")
    }
    it("falls back on patterns that compile but throw at format time") {
      // 'p' is the pad modifier: ofPattern accepts it, format throws
      // (DateTimeException "exceeds pad width") — must literal-fallback
      assert(DynamicPath.decorateDirectoryWithTime("x/{ph}/bar.gz", time) == "x/ph/bar.gz")
      assert(DynamicPath.decorateDirectoryWithTime("{pN}", time) == "pN")
    }
    it("normalizes redundant separators") {
      assert(DynamicPath.decorateDirectoryWithTime("a//b/./bar.gz", time) == "a/b/bar.gz")
    }
  }

  describe("baseFilename") {
    val s3Full = S3OutputConfig("s3://no-bucket/outputDirectory", Some("{YYYY}/{MM}/{dd}/{HH}"),
      Some("fileNamePrefix"), Compression.Gzip, 0)

    it("formats with all optional components") {
      val actual = DynamicPath.baseFilename(s3Full, "firstSeq", "lastSeq", Some("com.acme.example-1"), time)
      assert(actual == "outputDirectory/{YYYY}/{MM}/{dd}/{HH}/fileNamePrefix-com.acme.example-1-1970-01-01-000140-firstSeq-lastSeq")
    }
    it("formats without optional components") {
      val s3 = S3OutputConfig("s3://no-bucket", None, None, Compression.Gzip, 0)
      assert(DynamicPath.baseFilename(s3, "f", "l", None, time) == "1970-01-01-000140-f-l")
    }
    it("formats with path but no optionals") {
      val s3 = S3OutputConfig("s3://no-bucket/outputDirectory", None, None, Compression.Gzip, 0)
      assert(DynamicPath.baseFilename(s3, "f", "l", None, time) == "outputDirectory/1970-01-01-000140-f-l")
    }
    it("formats with path and partition") {
      val s3 = S3OutputConfig("s3://no-bucket/outputDirectory", None, None, Compression.Gzip, 0)
      assert(DynamicPath.baseFilename(s3, "f", "l", Some("com.acme1.example1/jsonschema-2"), time)
        == "outputDirectory/com.acme1.example1/jsonschema-2-1970-01-01-000140-f-l")
    }
    it("relativeKey drops the outputDirectory but keeps dateFormat") {
      assert(DynamicPath.relativeKey(s3Full, "f", "l", None, time)
        == "{YYYY}/{MM}/{dd}/{HH}/fileNamePrefix-1970-01-01-000140-f-l")
    }
  }
}
