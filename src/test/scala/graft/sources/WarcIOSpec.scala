package graft.sources

import graft.SparkSpec

class WarcIOSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(rows: Seq[(Long, Option[String])],
                        dir: java.io.File): Seq[(Long, Option[String])] = {
    val path = s"${dir.getAbsolutePath}/warc"
    WarcIO.write(rows.toDF("doc_id", "payload"), path)
    WarcIO.read(spark, path)
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
  }

  describe("WarcIO (length-framed web-archive round-trip)") {
    it("round-trips unicode, embedded CRLF, empty string, and null") {
      withTempDir { dir =>
        val rows = Seq(
          (1L, Some("plain ascii")),
          (2L, Some("snowman ☃ and étude")), // multibyte: Content-Length is BYTES
          (3L, Some("line one\r\nline two\nline three")),
          (4L, Some("")),
          (5L, None))
        assert(roundTrip(rows, dir) == rows)
      }
    }

    it("a payload CONTAINING a well-formed WARC record travels verbatim") {
      // the case that shears every delimiter-splitting reader: the
      // framing must come from Content-Length, never from scanning
      val trojan = "before\r\nWARC/1.1\r\nWARC-Type: resource\r\n" +
        "WARC-Record-ID: <urn:graft:doc:999>\r\nContent-Length: 0\r\n" +
        "\r\n\r\n\r\nafter"
      withTempDir { dir =>
        val rows = Seq((7L, Some(trojan)), (8L, Some("tail record")))
        assert(roundTrip(rows, dir) == rows)
      }
    }

    it("null and empty string stay distinct through the extension header") {
      withTempDir { dir =>
        val rows = Seq((1L, Some("")), (2L, None), (3L, Some("v")))
        assert(roundTrip(rows, dir) == rows)
      }
    }

    it("a fully empty frame still round-trips (zero-record archive)") {
      withTempDir { dir =>
        assert(roundTrip(Seq.empty, dir) == Seq.empty)
      }
    }

    it("one archive per non-empty partition; reads fan out one file per task") {
      withTempDir { dir =>
        val path = s"${dir.getAbsolutePath}/warc"
        val df = (0L until 100L).map(i => (i, Some(s"doc $i")))
          .toDF("doc_id", "payload").repartition(4)
        WarcIO.write(df, path)
        val files = new java.io.File(path).listFiles()
          .filter(_.getName.matches("part-\\d+\\.warc"))
        assert(files.length == 4, files.map(_.getName).mkString(","))
        assert(WarcIO.read(spark, path).count() == 100L)
      }
    }

    it("a wrong-shaped frame fails loudly BEFORE the overwrite-delete") {
      withTempDir { dir =>
        val path = s"${dir.getAbsolutePath}/warc"
        WarcIO.write(Seq((1L, Some("keep me"))).toDF("doc_id", "payload"), path)
        val ex = intercept[IllegalArgumentException] {
          WarcIO.write(Seq((1, "x")).toDF("doc_id", "payload"), path)
        } // doc_id INT, not LONG
        assert(ex.getMessage.contains("doc_id LONG"), ex.getMessage)
        // the prior archive is intact
        assert(WarcIO.read(spark, path)
          .as[(Long, Option[String])].collect().toSeq
          == Seq((1L, Some("keep me"))))
      }
    }

    it("a truncated payload fails loudly with file and offset, never resyncs") {
      withTempDir { dir =>
        val path = s"${dir.getAbsolutePath}/warc"
        WarcIO.write(Seq((1L, Some("twelve bytes"))).toDF("doc_id", "payload"), path)
        val f = new java.io.File(path).listFiles()
          .filter(_.getName.endsWith(".warc")).head
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        java.nio.file.Files.write(f.toPath, bytes.dropRight(6)) // shear the tail
        val ex = intercept[org.apache.spark.SparkException] {
          WarcIO.read(spark, path).collect()
        }
        assert(ex.getMessage.contains("WarcIO"), ex.getMessage)
      }
    }

    it("bad record magic fails loudly") {
      withTempDir { dir =>
        val path = s"${dir.getAbsolutePath}/warc"
        new java.io.File(path).mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(path, "part-00000.warc"),
          "ARC/1.0\r\n\r\n".getBytes("UTF-8"))
        val ex = intercept[org.apache.spark.SparkException] {
          WarcIO.read(spark, path).collect()
        }
        assert(ex.getMessage.contains("bad record magic"), ex.getMessage)
      }
    }
  }
}
