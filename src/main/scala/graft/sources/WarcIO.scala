package graft.sources

import java.io.{DataInputStream, EOFException}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (ISO 28500 Web ARChive) source/sink — the container format
  * web-crawl corpora ARRIVE in (Common Crawl publishes WARC/WET; every
  * crawl-derived training set starts by reading it). Implemented
  * directly on Hadoop streams: plain per-partition imperative I/O,
  * the RDD/`mapPartitions` escape hatch's intended case (same stance
  * as [[AvroIO]]).
  *
  * Why it earns a third round-trip leg next to CSV/JSON (q95/q96) and
  * Avro (q314): WARC is LENGTH-FRAMED — each record declares
  * `Content-Length` in BYTES and the payload travels verbatim, so
  * there are NO quoting, escaping, or delimiter rules at all. The
  * killer case the q317 pin exercises: a payload that CONTAINS a
  * well-formed WARC record (headers, blank line, terminator) — a
  * delimiter-splitting reader shears it; the length-framed reader
  * never looks at payload bytes.
  *
  * Scope: `resource` records carrying one document each, the WET
  * (extracted-text) shape: schema is fixed at
  * `(doc_id LONG NOT NULL, payload STRING NULL)`. Richer row schemas
  * are [[AvroIO]]'s job; WARC is the WEB-ARCHIVE interchange, not a
  * general row format. WARC has no null — absence is recorded as a
  * zero-length record with the extension header
  * `WARC-Graft-Payload-Null: 1` (extension fields are legal per the
  * standard), so null and `""` both survive.
  *
  * Write protocol: the [[AvroIO]] dest-exists-wins task commit — each
  * task stages its partition to an attempt-unique `.tmp` and renames
  * to the partition-keyed final name; duplicate attempts produce
  * identical bytes, the loser drops its stage. Convention-note: real
  * archives gzip each record as an independent gzip member; that
  * composes through the codec seam (`Serializers`, the O11/O12
  * story) and is orthogonal to the framing pinned here.
  *
  * Read side lists `part-*.warc` and fans out one file per task
  * (member-gzipped WARCs are splittable at member boundaries in
  * principle; file-per-task matches the writer's sizing, the
  * [[AvroIO]] judgment). The parser is STRICT: bad magic, a missing
  * Content-Length, a short payload, or a missing record terminator
  * fail loudly with the file and byte offset — a crawl reader that
  * silently resynchronizes manufactures truncated documents.
  *
  * Reference: kinesis-s3 has no archive source; framing follows the
  * public WARC/1.1 standard (ISO 28500:2017) as used by Common Crawl.
  */
object WarcIO {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  private val CRLF = "\r\n"

  /** Write `df` — exactly `(doc_id LONG, payload STRING)` — as WARC
    * resource records under `path` (overwrite). */
  def write(df: DataFrame, path: String): Unit = {
    val fields = df.schema.fields
    require(fields.length == 2
        && fields(0).name == "doc_id" && fields(0).dataType == LongType
        && fields(1).name == "payload" && fields(1).dataType == StringType,
      s"WarcIO.write needs exactly (doc_id LONG, payload STRING), got " +
        df.schema.catalogString + " — WARC carries one document per " +
        "record; richer rows are AvroIO's job")
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val outDir = new Path(path)
    val fs = outDir.getFileSystem(conf)
    // schema validated above, BEFORE the overwrite-delete (the AvroIO
    // hardening: never destroy the prior dataset on a doomed write)
    if (fs.exists(outDir)) fs.delete(outDir, true)
    fs.mkdirs(outDir)
    val confBc = spark.sparkContext.broadcast(new SerializableWritable(conf))
    import spark.implicits._
    val receipts = df.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val c = confBc.value.value
        val dir = new Path(path)
        val f = dir.getFileSystem(c)
        val tmp = new Path(dir, f".part-$pid%05d-a${tc.attemptNumber()}.warc.tmp")
        val dst = new Path(dir, f"part-$pid%05d.warc")
        val out = f.create(tmp, true)
        var written = 0L
        try {
          rows.foreach { r =>
            val id = r.getLong(0)
            val isNull = r.isNullAt(1)
            val body =
              if (isNull) Array.emptyByteArray
              else r.getString(1).getBytes(UTF_8)
            val hdr = new StringBuilder()
              .append("WARC/1.1").append(CRLF)
              .append("WARC-Type: resource").append(CRLF)
              .append(s"WARC-Record-ID: <urn:graft:doc:$id>").append(CRLF)
              .append("Content-Type: text/plain; charset=utf-8").append(CRLF)
            if (isNull) hdr.append("WARC-Graft-Payload-Null: 1").append(CRLF)
            hdr.append(s"Content-Length: ${body.length}").append(CRLF)
              .append(CRLF)
            out.write(hdr.toString.getBytes(UTF_8))
            out.write(body)
            out.write((CRLF + CRLF).getBytes(UTF_8))
            written += 1
          }
        } finally out.close()
        if (f.exists(dst)) f.delete(tmp, false)
        else if (!f.rename(tmp, dst) && !f.exists(dst))
          throw new java.io.IOException(s"WarcIO: rename $tmp -> $dst failed")
        Iterator.single((pid, written))
      }
    }.collect() // bounded: one row per non-empty partition
    confBc.destroy()
    if (receipts.isEmpty) {
      // fully empty frame: a zero-record .warc keeps the round-trip total
      fs.create(new Path(outDir, "part-00000.warc"), true).close()
    }
  }

  /** Read the WARC files under `path` back as
    * `(doc_id LONG, payload STRING)`. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val files = fs.globStatus(new Path(dir, "part-*.warc"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"WarcIO.read: no part-*.warc files under $path")
    val confBc = spark.sparkContext.broadcast(new SerializableWritable(conf))
    val rows = spark.sparkContext
      .parallelize(files.toSeq, files.length) // one archive per task
      .flatMap { file =>
        val c = confBc.value.value
        val in = new DataInputStream(new java.io.BufferedInputStream(
          new Path(file).getFileSystem(c).open(new Path(file)), 1 << 16))
        var closed = false
        var offset = 0L
        def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        def die(msg: String): Nothing = {
          closeOnce()
          throw new java.io.IOException(
            s"WarcIO: $msg at byte $offset of $file")
        }
        // one header line up to CRLF (header lines are ASCII per spec);
        // returns null at clean EOF before any byte of a new record
        def readLine(atRecordStart: Boolean): String = {
          val sb = new java.lang.StringBuilder()
          var b = in.read()
          if (b < 0) {
            if (atRecordStart) return null
            else die("truncated header (EOF mid-record)")
          }
          while (b >= 0 && b != '\r') { sb.append(b.toChar); b = in.read(); offset += 1 }
          if (b != '\r' || in.read() != '\n') die("header line not CRLF-terminated")
          offset += 2
          sb.toString
        }
        new Iterator[Row] {
          private var nextRow: Row = null
          private def advance(): Unit = if (nextRow == null && !closed) {
            val magic = readLine(atRecordStart = true)
            if (magic == null) { closeOnce() }
            else {
              if (magic != "WARC/1.1") die(s"bad record magic '$magic'")
              var len = -1L
              var isNull = false
              var id = Long.MinValue
              var line = readLine(atRecordStart = false)
              while (line.nonEmpty) {
                val i = line.indexOf(':')
                if (i < 0) die(s"malformed header '$line'")
                val (k, v) = (line.substring(0, i), line.substring(i + 1).trim)
                k match {
                  case "Content-Length" => len = v.toLong
                  case "WARC-Graft-Payload-Null" => isNull = v == "1"
                  case "WARC-Record-ID" =>
                    val p = "<urn:graft:doc:"
                    if (!(v.startsWith(p) && v.endsWith(">")))
                      die(s"unrecognized record id '$v'")
                    id = v.substring(p.length, v.length - 1).toLong
                  case _ => () // WARC-Type / Content-Type / extensions
                }
                line = readLine(atRecordStart = false)
              }
              if (len < 0) die("record missing Content-Length")
              if (id == Long.MinValue) die("record missing WARC-Record-ID")
              if (len > Int.MaxValue - 16) die(s"payload of $len bytes " +
                "exceeds the single-document bound — shard upstream")
              val body = new Array[Byte](len.toInt)
              try in.readFully(body)
              catch { case _: EOFException => die(s"payload truncated (wanted $len bytes)") }
              offset += len
              val term = new Array[Byte](4)
              try in.readFully(term)
              catch { case _: EOFException => die("record terminator missing") }
              if (!java.util.Arrays.equals(term,
                  Array[Byte]('\r', '\n', '\r', '\n')))
                die("record not CRLF CRLF terminated — Content-Length lies")
              offset += 4
              nextRow = Row(id,
                if (isNull) null else new String(body, UTF_8))
            }
          }
          def hasNext: Boolean = { advance(); nextRow != null }
          def next(): Row = {
            advance()
            if (nextRow == null) throw new NoSuchElementException
            val r = nextRow; nextRow = null; r
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
