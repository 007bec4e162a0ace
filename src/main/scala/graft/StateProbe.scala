package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** State-store capacity probe (VERDICT r10 #7): drives the v2 state
  * family's per-key-timer shape ([[graft.queries.SessionTimerProcessor]],
  * q202's processor verbatim) at SPARK_GRAFT_PROBE_KEYS distinct keys
  * (default 10⁷) through three batches — open K sessions (K ValueState
  * rows + K timers), extend all K (delete + re-register every timer),
  * then one watermark-pusher row that expires all K timers — and prints
  * ONE JSON line with per-batch latency, state rows, RocksDB custom
  * metrics, and the on-disk checkpoint state size. The per-key state is
  * bounded by construction; this turns that argument into numbers.
  *
  * Not part of the driver contract — a targeted bench leg recorded in
  * BASELINE.md. Run: `sbt "runMain graft.StateProbe"`.
  */
object StateProbe {

  def main(args: Array[String]): Unit = {
    val keys = sys.env.getOrElse("SPARK_GRAFT_PROBE_KEYS", "10000000").toLong
    val spark = Sessions.local("graft-state-probe")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_state_probe")
    val srcDir = root.resolve("src"); val chkDir = root.resolve("chk")
    java.nio.file.Files.createDirectories(srcDir)

    // Three batch files, mtime-ordered so maxFilesPerTrigger=1 replays
    // them as three deterministic micro-batches.
    val t0 = 1700000000000L
    def writeBatch(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val staged = root.resolve(s"stage_$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(staged)
      val sd = java.nio.file.Paths.get(staged)
      val part = java.nio.file.Files.list(sd)
      try part.filter(_.getFileName.toString.endsWith(".parquet"))
        .forEach(f => java.nio.file.Files.move(f, srcDir.resolve(name)))
      finally part.close()
      Thread.sleep(1100) // distinct mtimes => stable file order
    }
    val base = spark.range(keys)
    writeBatch("b0.parquet", base.select(
      timestamp_millis(lit(t0)).as("ts"), col("id").as("user_id"),
      (col("id") % 997).cast("double").as("value")))
    writeBatch("b1.parquet", base.select(
      timestamp_millis(lit(t0) + 600000L).as("ts"), col("id").as("user_id"),
      (col("id") % 131).cast("double").as("value")))
    // watermark pusher: ts far enough that wm = ts - 1h passes last+gap
    writeBatch("b2.parquet", spark.range(1).select(
      timestamp_millis(lit(t0) + 600000L + 1800000L + 3600000L + 60000L).as("ts"),
      lit(-1L).as("user_id"), lit(0.0).as("value")))

    val stream = spark.readStream
      .schema("ts timestamp, user_id bigint, value double")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .withWatermark("ts", "1 hour")
      .select(col("user_id").cast("long").as("user"),
        unix_millis(col("ts")).as("ms"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)]
    val sess = stream.groupByKey(_._1)
      .transformWithState(new graft.queries.SessionTimerProcessor,
        TimeMode.EventTime(), OutputMode.Append())

    val t = System.nanoTime()
    val q = sess.toDF("user_id", "start_ms", "n_events", "sum_cents")
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", chkDir.toString)
      .start()
    q.processAllAvailable()
    val wallSec = (System.nanoTime() - t) / 1e9
    // keep data batches AND the zero-input batch where the advanced
    // watermark fires the K timers (updated/removed > 0)
    val progs = q.recentProgress.filter(p => p.numInputRows > 0 ||
      p.stateOperators.exists(so => so.numRowsUpdated + so.numRowsRemoved > 0))
    q.stop()

    def dirBytes(p: java.nio.file.Path): Long =
      if (!java.nio.file.Files.exists(p)) 0L
      else {
        val w = java.nio.file.Files.walk(p)
        try w.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally w.close()
      }
    val stateBytes = dirBytes(chkDir.resolve("state"))

    val batches = progs.map { p =>
      val so = p.stateOperators.headOption
      val custom = so.map(_.customMetrics)
      def cm(k: String): Long =
        custom.flatMap(m => Option(m.get(k)).map(_.longValue())).getOrElse(-1L)
      s"""{"batch":${p.batchId},"input_rows":${p.numInputRows},""" +
        s""""batch_ms":${p.durationMs.getOrDefault("triggerExecution", -1L)},""" +
        s""""state_rows":${so.map(_.numRowsTotal).getOrElse(-1L)},""" +
        s""""updated":${so.map(_.numRowsUpdated).getOrElse(-1L)},""" +
        s""""removed":${so.map(_.numRowsRemoved).getOrElse(-1L)},""" +
        s""""rocksdb_sst_bytes":${cm("rocksdbSstFileSize")},""" +
        s""""rocksdb_pinned_mem_bytes":${cm("rocksdbPinnedBlocksMemoryUsage")},""" +
        s""""expired_timers":${cm("numExpiredTimers")},""" +
        s""""commit_ms":${so.map(_.commitTimeMs).getOrElse(-1L)}}"""
    }.mkString("[", ",", "]")
    // full RocksDB custom-metric map of the final stateful batch (the
    // authoritative size/latency numbers for the BASELINE record)
    val lastCustom = progs.lastOption.flatMap(_.stateOperators.headOption)
      .map(_.customMetrics).map { m =>
        import scala.jdk.CollectionConverters._
        m.asScala.toSeq.filterNot(_._1.startsWith("SnapshotLastUploaded"))
          .sortBy(_._1)
          .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      }.getOrElse("{}")
    // ONE machine-readable line (the Bench contract's shape)
    println(s"""{"metric":"state_probe","keys":$keys,"wall_sec":$wallSec,""" +
      s""""checkpoint_state_bytes":$stateBytes,"batches":$batches,""" +
      s""""last_batch_rocksdb":$lastCustom}""")
    graft.Staging.deleteRecursively(root)
    spark.stop()
  }
}
