package graft.pipeline

import java.nio.file.Paths

import graft.Sessions

/** CLI entry (reference Main.scala:26-47): `--config <file> [--drain]`.
  *
  * `--drain` processes everything currently in the input directory and
  * exits (Trigger.AvailableNow) — the offline/test mode. Without it the
  * pipeline runs continuously with the buffer's timeLimit as the
  * micro-batch interval.
  */
object Main {
  def main(args: Array[String]): Unit = {
    parseArgs(args.toList) match {
      case Left(err) =>
        System.err.println(err)
        System.err.println("Usage: graft.pipeline.Main --config <file.hocon> [--drain]")
        sys.exit(1)
      case Right((configPath, drain)) =>
        PipelineConfig.load(Paths.get(configPath)) match {
          case Left(err) =>
            System.err.println(s"Configuration error: $err")
            sys.exit(1)
          case Right(config) =>
            // Startup serializer resolution (reference S3Loader.scala:41-44)
            // through the plug-in registry: LZO becomes usable the moment
            // an adapter registers its codec, with no change here.
            Serializers.resolve(config.output.s3.compression) match {
              case Left(msg) =>
                System.err.println(msg)
                sys.exit(1)
              case Right(_) => ()
            }
            val spark = Sessions.local("graft-pipeline")
            try {
              if (drain) {
                val result = Pipeline.runOnce(spark, config)
                val files = result.batches.flatMap(_.files)
                val n = result.batches.map(_.count).sum
                val bad = result.batches.map(_.badCount).sum
                println(s"Drained $n records into ${files.size} files ($bad bad rows)")
              } else {
                Pipeline.runContinuous(spark, config)
              }
            } finally spark.stop()
        }
    }
  }

  private def parseArgs(args: List[String]): Either[String, (String, Boolean)] = {
    def loop(rest: List[String], config: Option[String], drain: Boolean): Either[String, (String, Boolean)] =
      rest match {
        case Nil => config.toRight("Missing required option: --config").map(c => (c, drain))
        case "--config" :: path :: tail => loop(tail, Some(path), drain)
        case "--config" :: Nil => Left("--config requires a value")
        case "--drain" :: tail => loop(tail, config, drain = true)
        case other :: _ => Left(s"Unknown argument: $other")
      }
    loop(args, None, drain = false)
  }
}
