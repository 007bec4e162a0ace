package graft.pipeline

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The source seam (SURVEY §7.1): the pipeline composes a [[Source]]
  * without knowing the transport, so a Kinesis adapter (reference
  * `KinesisSourceExecutor.scala:44-151` — buildable only where the
  * connector jar exists) is an added implementation, not an edit to
  * [[Pipeline]].
  *
  * Contract: [[Source.lines]] returns a STREAMING frame with one record
  * per row in a `value: string` column, already positioned per
  * `config.input.position` and admission-limited per the buffer/fetch
  * config. A source whose transport carries per-record sequence numbers
  * as metadata (Kinesis does; see [[ShardedSource]]) additionally
  * returns them in a `seq: string` column, which [[Pipeline.records]]
  * prefers over any caller-supplied payload expression.
  */
trait Source {
  /** @param checkpointDir the query's checkpoint location, when known —
    *                      initial-position state that must survive a
    *                      restart (e.g. LATEST's cutoff instant) is
    *                      persisted alongside it */
  def lines(spark: SparkSession, config: PipelineConfig,
            checkpointDir: Option[String] = None): DataFrame
}

/** File-directory implementation (the offline stand-in for the Kinesis
  * stream; `input.streamName` is a directory of line files).
  *
  * Initial position (reference `Config.scala:62-106`):
  *  - TRIM_HORIZON → every file present;
  *  - LATEST → only files modified at/after source construction (the
  *    stream-tip analog: history present at startup is skipped);
  *  - AT_TIMESTAMP(ts) → only files modified at/after `ts` (the
  *    reference's timestamp seek, `Config.scala:72-77`).
  *  LATEST/AT_TIMESTAMP filter on the `_metadata.file_modification_time`
  *  column — a row-level predicate on file metadata (Spark can prune
  *  whole files from it); a native Kinesis source would instead seek.
  *
  * Admission (reference buffer semantics, `Config.scala:172`): the
  * buffer's `byteLimit` maps to `maxBytesPerTrigger` — the micro-batch
  * IS the buffer, so its flush-at-bytes cap is the faithful knob (the
  * two trigger caps are mutually exclusive in Spark, and a byte cap is
  * the one the file source can honor exactly). With `byteLimit <= 0`
  * the fetch-side `maxRecords` cap degrades to `maxFilesPerTrigger`.
  * `timeLimit` maps to the ProcessingTime trigger in
  * [[Pipeline.runContinuous]]; `recordLimit` has no file-source
  * equivalent (documented divergence, SURVEY §7.5.2).
  */
object FileSource extends Source {

  def lines(spark: SparkSession, config: PipelineConfig,
            checkpointDir: Option[String] = None): DataFrame = {
    val reader =
      if (config.buffer.byteLimit > 0)
        spark.readStream.option("maxBytesPerTrigger", config.buffer.byteLimit)
      else
        spark.readStream.option("maxFilesPerTrigger", math.max(1, config.input.maxRecords))
    val all = reader.text(config.input.streamName)
    val positioned = config.input.position match {
      case InitialPosition.TrimHorizon => all
      case InitialPosition.Latest =>
        all.where(col("_metadata.file_modification_time") >=
          lit(java.sql.Timestamp.from(latestCutoff(spark, checkpointDir))))
      case InitialPosition.AtTimestamp(ts) =>
        all.where(col("_metadata.file_modification_time") >=
          lit(java.sql.Timestamp.from(ts)))
    }
    positioned.select(col("value"))
  }

  /** LATEST's cutoff must be decided ONCE — at first start — and reused
    * on every restart, exactly like a stream position: re-evaluating
    * `now()` after a crash would silently drop every record that arrived
    * while the pipeline was down, even though the file-source checkpoint
    * marks those files processed (permanent loss). The cutoff is
    * persisted next to the checkpoint THROUGH THE SAME Hadoop FileSystem
    * the checkpoint uses (a driver-local java.nio write would not
    * survive a driver replacement when the checkpoint lives on
    * s3a/hdfs), written atomically (temp + rename) so a crash mid-write
    * cannot leave a truncated marker. A present-but-unparseable marker
    * fails loudly: guessing a fresh cutoff there IS the data-loss path.
    * Without a checkpoint dir the query has no restart identity, so a
    * fresh cutoff is the correct (and only possible) semantics.
    */
  private def latestCutoff(spark: SparkSession, checkpointDir: Option[String]): Instant =
    checkpointDir match {
      case None => Instant.now()
      case Some(dir) =>
        import org.apache.hadoop.fs.Path
        val marker = new Path(PipelinePaths.stripScheme(dir), "graft_latest_cutoff")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(marker)) readMarker(fs, marker)
        else {
          val cutoff = Instant.now()
          val tmp = new Path(marker.getParent, "graft_latest_cutoff.tmp")
          val out = fs.create(tmp, true)
          try out.write(cutoff.toString.getBytes("UTF-8")) finally out.close()
          if (fs.rename(tmp, marker)) cutoff
          else if (fs.exists(marker)) {
            // lost a creation race (TOCTOU past the exists check): the
            // winner's persisted value IS the query's cutoff — using our
            // own here would make this run filter differently from
            // every future restart
            fs.delete(tmp, false)
            readMarker(fs, marker)
          } else
            throw new IllegalStateException(s"Could not persist LATEST cutoff marker at $marker")
        }
    }

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
                         marker: org.apache.hadoop.fs.Path): Instant = {
    val in = fs.open(marker)
    val content =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
      finally in.close()
    try Instant.parse(content)
    catch {
      case e: Exception => throw new IllegalStateException(
        s"Corrupt LATEST cutoff marker at $marker ('$content'). Restore it to the " +
          "original cutoff instant (ISO-8601) if known; writing a fresh/later instant " +
          "DROPS every record that arrived before it that the checkpoint has not yet " +
          "committed — the data-loss path this marker exists to prevent", e)
    }
  }
}
