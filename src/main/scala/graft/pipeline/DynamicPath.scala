package graft.pipeline

import java.nio.file.Paths
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

/** Output-path time decoration (behavior of reference DynamicPath.scala:35-64):
  * `{pattern}` segments are rendered with java.time DateTimeFormatter in
  * UTC at emit time; a brace group that is not a valid pattern keeps its
  * literal content with the braces stripped (`{foo}` → `foo`,
  * reference DynamicPathSpec.scala:40-53); the result is path-normalized.
  *
  * Plain Scala on purpose — runs on the driver once per written file, not
  * per row, so it needs no Catalyst expression (SURVEY §7.4).
  */
object DynamicPath {

  private val Braced = "\\{([^}]*)}".r

  def decorateDirectoryWithTime(fileName: String, decoratorDateTime: Instant): String = {
    val decorated = Braced.replaceAllIn(fileName, m => {
      val pattern = m.group(1)
      // NonFatal, not just IllegalArgumentException: some patterns
      // compile in ofPattern but throw at FORMAT time (e.g. a `p` pad
      // modifier → DateTimeException/ClassCastException on narrower
      // output) — those must fall back to the literal too.
      val rendered =
        try DateTimeFormatter.ofPattern(pattern).withZone(ZoneOffset.UTC).format(decoratorDateTime)
        catch { case scala.util.control.NonFatal(_) => pattern }
      java.util.regex.Matcher.quoteReplacement(rendered)
    })
    normalize(decorated)
  }

  def normalize(pathStr: String): String = Paths.get(pathStr).normalize.toString

  /** File name `[prefix-][partition-]yyyy-MM-dd-HHmmss-firstSeq-lastSeq`
    * under `[outputDirectory/][dateFormat/]` (reference
    * KinesisS3Emitter.scala:226-244). `dateFormat` brace groups stay
    * un-decorated here; decoration happens at put time via
    * [[decorateDirectoryWithTime]], like the reference's getRequest.
    */
  def baseFilename(
    s3: S3OutputConfig,
    firstSeq: String,
    lastSeq: String,
    partition: Option[String],
    now: Instant): String =
    normalize(join(List(s3.outputDirectory, s3.dateFormat).flatten.mkString("/"),
      fileName(s3, firstSeq, lastSeq, partition, now)))

  /** Like [[baseFilename]] but relative to the configured output path —
    * what the emitter resolves against `s3.path` (bucket/outputDirectory
    * split being an S3-API artifact; the resulting absolute layout is
    * identical).
    */
  def relativeKey(
    s3: S3OutputConfig,
    firstSeq: String,
    lastSeq: String,
    partition: Option[String],
    now: Instant): String =
    normalize(join(s3.dateFormat.getOrElse(""), fileName(s3, firstSeq, lastSeq, partition, now)))

  private def fileName(
    s3: S3OutputConfig,
    firstSeq: String,
    lastSeq: String,
    partition: Option[String],
    now: Instant): String = {
    val time = DateTimeFormatter.ofPattern("yyyy-MM-dd-HHmmss").withZone(ZoneOffset.UTC).format(now)
    (s3.filenamePrefix.toList ++ partition.toList ++ List(time, firstSeq, lastSeq)).mkString("-")
  }

  private def join(dir: String, file: String): String =
    List(dir, file).filterNot(_.isEmpty).mkString("/")
}
