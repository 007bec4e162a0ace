package graft.pipeline

import java.io.{ByteArrayOutputStream, InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import scala.collection.mutable.ListBuffer

/** Newline-joined gzip encoding of record batches — the reference's
  * serialized file body (GZipSerializer.scala:23-50: each record then
  * `\n`, 64 KiB stream buffer).
  *
  * The hot path does NOT go through this: the pipeline writes via
  * Spark's text writer with the gzip codec, which produces the identical
  * `record\n` framing distributed. This small util exists for unit tests
  * (round-trip vs external gunzip, like GZipSerializerSpec.scala:32-75)
  * and driver-side one-off emits.
  */
object GZipLines {

  val BufferSize: Int = 64 * 1024

  def gzip(records: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos, BufferSize)
    records.foreach { r => gz.write(r); gz.write('\n') }
    gz.close()
    bos.toByteArray
  }

  def gunzipLines(in: InputStream): List[String] = {
    val gz = new GZIPInputStream(in, BufferSize)
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](BufferSize)
    var n = gz.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = gz.read(buf) }
    gz.close()
    val s = new String(bos.toByteArray, "UTF-8")
    val out = ListBuffer.empty[String]
    if (s.nonEmpty) s.stripSuffix("\n").split("\n", -1).foreach(out += _)
    out.toList
  }
}
