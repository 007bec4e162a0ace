package graft.pipeline

import java.time.Instant

/** Engine configuration, mirroring the reference's HOCON model
  * (reference Config.scala:42-247) re-expressed for the Spark engine:
  * the Kinesis-specific fields (appName→checkpoint name, streamName→input
  * path in the offline file-source mode) keep their names so a reference
  * user's config carries over.
  *
  * Loaded by [[Hocon]], a dependency-free HOCON-subset parser (the
  * offline jar set has no typesafe-config), with readable per-path
  * errors like the reference's pureconfig `prettyPrint` messages
  * (reference ConfigSpec.scala:131-139).
  */
final case class PipelineConfig(
  region: Option[String],
  purpose: Purpose,
  input: InputConfig,
  output: OutputConfig,
  buffer: BufferConfig,
  monitoring: Option[MonitoringConfig])

/** Pipeline behavior selector (reference Config.scala:110-130). */
sealed trait Purpose extends Product with Serializable
object Purpose {
  /** Bytes through, 1:1, no inspection. */
  case object Raw extends Purpose
  /** Self-describing JSON: partition by embedded Iglu schema key. */
  case object SelfDescribingJson extends Purpose
  /** Snowplow enriched TSV: collector-tstamp metrics enabled. */
  case object Enriched extends Purpose

  def parse(s: String): Either[String, Purpose] = s.toLowerCase match {
    case "raw"             => Right(Raw)
    case "self_describing" => Right(SelfDescribingJson)
    case "enriched_events" => Right(Enriched)
    case other => Left(s"Cannot parse '$other' into supported purpose (RAW, SELF_DESCRIBING, ENRICHED_EVENTS)")
  }
}

/** Where to start consuming (reference Config.scala:62-106). For the file
  * source, TrimHorizon = read everything present; Latest = only files
  * arriving after start; AtTimestamp = files modified after the instant.
  */
sealed trait InitialPosition extends Product with Serializable
object InitialPosition {
  case object Latest extends InitialPosition
  case object TrimHorizon extends InitialPosition
  final case class AtTimestamp(tstamp: Instant) extends InitialPosition
}

final case class InputConfig(
  appName: String,
  streamName: String, // offline file-source mode: a directory of line files
  position: InitialPosition,
  maxRecords: Int)

final case class S3OutputConfig(
  path: String,
  dateFormat: Option[String],
  filenamePrefix: Option[String],
  compression: Compression,
  maxTimeout: Long) {
  private val scheme = "s3://"
  private val withoutPrefix =
    if (path.startsWith(scheme)) path.drop(scheme.length) else path
  /** Bucket (or local root dir) without deeper path. */
  def bucketName: String = withoutPrefix.split("/").head
  /** Base directory below the bucket, if any. */
  def outputDirectory: Option[String] = {
    val rest = withoutPrefix.split("/").toList.drop(1).mkString("/")
    if (rest.isEmpty) None else Some(rest)
  }
}

final case class BadOutputConfig(streamName: String) // dead-letter dir/stream

final case class OutputConfig(s3: S3OutputConfig, bad: BadOutputConfig)

sealed trait Compression extends Product with Serializable
object Compression {
  case object Gzip extends Compression
  case object Lzo extends Compression

  /** Splittable codec the reference lacks: Hadoop's built-in pure-Java
    * bzip2. Fills indexed LZO's role (parallel re-reads of one object)
    * with zero extra dependencies, and proves the [[Serializers]] seam
    * with a second REAL codec next to the fake SerializersSpec drives. */
  case object Bzip2 extends Compression

  def parse(s: String): Either[String, Compression] = s.toLowerCase match {
    case "gzip"  => Right(Gzip)
    case "lzo"   => Right(Lzo)
    case "bzip2" => Right(Bzip2)
    case other   => Left(s"Cannot parse '$other' into supported compression (GZIP, LZO, BZIP2)")
  }
}

/** Flush control (reference Config.scala:172). In Spark, `timeLimit`
  * becomes the micro-batch trigger interval and `recordLimit`/`byteLimit`
  * map to source admission options (maxFilesPerTrigger etc.) — exact
  * byte-limit flush is a documented divergence (SURVEY §7.5.2).
  */
final case class BufferConfig(byteLimit: Long, recordLimit: Long, timeLimit: Long)

final case class StatsDConfig(
  hostname: String,
  port: Int,
  tags: Map[String, String],
  prefix: Option[String])

/** Lifecycle tracking adapter (reference SnowplowMonitoring: collector
  * URI + appId; here: appId + local tracking file path). */
final case class SnowplowConfig(appId: String, path: String)

final case class MonitoringConfig(
  statsd: Option[StatsDConfig],
  snowplow: Option[SnowplowConfig] = None)

object PipelineConfig {
  /** Load + validate from a HOCON(-subset) file. */
  def load(path: java.nio.file.Path): Either[String, PipelineConfig] =
    for {
      text <- try Right(new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
              catch { case e: Exception => Left(s"Failed to read config from $path: ${e.getMessage}") }
      cfg <- fromString(text)
    } yield cfg

  def fromString(text: String): Either[String, PipelineConfig] =
    Hocon.parse(text).flatMap(decode)

  private def decode(root: Hocon.Value): Either[String, PipelineConfig] = {
    val c = new Hocon.Cursor(root, Nil)
    for {
      region <- c.optString("region")
      purposeStr <- c.string("purpose")
      purpose <- Purpose.parse(purposeStr).left.map(e => s"at purpose: $e")
      input <- decodeInput(c.down("input"))
      output <- decodeOutput(c.down("output"))
      buffer <- decodeBuffer(c.down("buffer"))
      monitoring <- decodeMonitoring(c)
      _ <- if (buffer.recordLimit <= 0) Left("at buffer.recordLimit: must be positive") else Right(())
      _ <- if (buffer.timeLimit < 0) Left("at buffer.timeLimit: must be >= 0") else Right(())
      _ <- if (input.maxRecords <= 0) Left("at input.maxRecords: must be positive") else Right(())
    } yield PipelineConfig(region, purpose, input, output, buffer, monitoring)
  }

  private def decodeInput(c: Hocon.Cursor): Either[String, InputConfig] =
    for {
      appName <- c.string("appName")
      streamName <- c.string("streamName")
      posV <- c.any("position")
      position <- decodePosition(posV, c.path :+ "position")
      maxRecords <- c.int("maxRecords")
    } yield InputConfig(appName, streamName, position, maxRecords)

  private def decodePosition(v: Hocon.Value, path: List[String]): Either[String, InitialPosition] =
    v match {
      case Hocon.Str(s) => s.toLowerCase match {
        case "latest"       => Right(InitialPosition.Latest)
        case "trim_horizon" => Right(InitialPosition.TrimHorizon)
        case other          => Left(s"at ${path.mkString(".")}: initial position '$other' cannot be decoded")
      }
      case Hocon.Obj(fields) =>
        fields.collectFirst { case (k, vv) if k.toLowerCase == "at_timestamp" => vv } match {
          case Some(Hocon.Obj(inner)) =>
            inner.collectFirst { case ("timestamp", Hocon.Str(ts)) => ts } match {
              case Some(ts) =>
                try Right(InitialPosition.AtTimestamp(Instant.parse(ts)))
                catch { case _: Exception => Left(s"at ${path.mkString(".")}: cannot parse timestamp '$ts' (expected e.g. 2020-06-03T00:00:00Z)") }
              case None => Left(s"at ${path.mkString(".")}: AT_TIMESTAMP requires a 'timestamp' string")
            }
          case _ => Left(s"at ${path.mkString(".")}: initial position can be LATEST, TRIM_HORIZON or {AT_TIMESTAMP: {timestamp: ...}}")
        }
      case other => Left(s"at ${path.mkString(".")}: unexpected ${other.kind}")
    }

  private def decodeOutput(c: Hocon.Cursor): Either[String, OutputConfig] =
    for {
      s3c <- Right(c.down("s3"))
      path <- s3c.string("path")
      dateFormat <- s3c.optString("dateFormat")
      filenamePrefix <- s3c.optString("filenamePrefix")
      compressionStr <- s3c.string("compression")
      compression <- Compression.parse(compressionStr).left.map(e => s"at output.s3.compression: $e")
      maxTimeout <- s3c.long("maxTimeout")
      badStream <- c.down("bad").string("streamName")
    } yield OutputConfig(
      S3OutputConfig(path, dateFormat, filenamePrefix, compression, maxTimeout),
      BadOutputConfig(badStream))

  private def decodeBuffer(c: Hocon.Cursor): Either[String, BufferConfig] =
    for {
      byteLimit <- c.long("byteLimit")
      recordLimit <- c.long("recordLimit")
      timeLimit <- c.long("timeLimit")
    } yield BufferConfig(byteLimit, recordLimit, timeLimit)

  private def decodeMonitoring(c: Hocon.Cursor): Either[String, Option[MonitoringConfig]] =
    c.opt("monitoring") match {
      case None => Right(None)
      case Some(m) =>
        val mc = new Hocon.Cursor(m, List("monitoring"))
        for {
          statsd <- decodeStatsD(mc)
          snowplow <- decodeSnowplow(mc)
        } yield Some(MonitoringConfig(statsd, snowplow))
    }

  private def decodeSnowplow(mc: Hocon.Cursor): Either[String, Option[SnowplowConfig]] =
    mc.opt("snowplow") match {
      case None => Right(None)
      case Some(_) =>
        val sc = mc.down("snowplow")
        for {
          appId <- sc.string("appId")
          path <- sc.string("path")
        } yield Some(SnowplowConfig(appId, path))
    }

  private def decodeStatsD(mc: Hocon.Cursor): Either[String, Option[StatsDConfig]] =
    mc.opt("metrics") match {
      case None => Right(None)
      case Some(metrics) =>
        val cc = new Hocon.Cursor(metrics, List("monitoring", "metrics"))
        cc.opt("statsd") match {
          case None => Right(None)
          case Some(_) =>
            val sc = cc.down("statsd")
            for {
              host <- sc.string("hostname")
              port <- sc.int("port")
              prefix <- sc.optString("prefix")
              tags <- sc.opt("tags") match {
                case Some(Hocon.Obj(fields)) =>
                  val bad = fields.collectFirst { case (k, v) if !v.isInstanceOf[Hocon.Str] => k }
                  bad match {
                    case Some(k) => Left(s"at monitoring.metrics.statsd.tags.$k: expected string")
                    case None => Right(fields.collect { case (k, Hocon.Str(v)) => k -> v }.toMap)
                  }
                case Some(other) => Left(s"at monitoring.metrics.statsd.tags: expected object, got ${other.kind}")
                case None => Right(Map.empty[String, String])
              }
            } yield Some(StatsDConfig(host, port, tags, prefix))
        }
    }
}
