package graft.pipeline

import java.io.{ByteArrayInputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import scala.sys.process._

import graft.SparkSpec

/** Round-trip with the EXTERNAL gunzip binary as the decompression
  * oracle, mirroring the reference's GZipSerializerSpec.scala:32-75.
  */
class GZipLinesSpec extends SparkSpec {

  private val records = List(
    "snowplow-like line one",
    "another\trecord\twith\ttabs",
    "третья запись — utf8 ✓",
    "")

  describe("GZipLines") {
    it("round-trips through its own gunzip") {
      val bytes = GZipLines.gzip(records.map(_.getBytes(UTF_8)))
      val back = GZipLines.gunzipLines(new ByteArrayInputStream(bytes))
      assert(back == records)
    }

    it("round-trips through the external gunzip binary") {
      withTempDir { dir =>
        val f = new File(dir, "out.gz")
        val fos = new FileOutputStream(f)
        fos.write(GZipLines.gzip(records.map(_.getBytes(UTF_8))))
        fos.close()
        val plain = new File(dir, "out.txt")
        // redirect to a file and compare bytes — `.!!` decodes with the
        // platform charset, which mangles the UTF-8 record
        assert(Seq("bash", "-c", s"gunzip -c '${f.getAbsolutePath}' > '${plain.getAbsolutePath}'").! == 0)
        val expected = records.mkString("", "\n", "\n").getBytes(UTF_8)
        assert(java.nio.file.Files.readAllBytes(plain.toPath).sameElements(expected))
      }
    }

    it("empty input produces an empty (but valid) gzip stream") {
      val back = GZipLines.gunzipLines(new ByteArrayInputStream(GZipLines.gzip(Nil)))
      assert(back == Nil)
    }
  }
}
