package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** State-store capacity probe (VERDICT r10 #7, extended r13 to every
  * v2 state shape): drives one of the three stateful shapes at
  * SPARK_GRAFT_PROBE_KEYS scale and prints ONE JSON line with per-batch
  * latency, state rows, RocksDB custom metrics, and the on-disk
  * checkpoint state size. `SPARK_GRAFT_PROBE_SHAPE` picks the shape:
  *
  *  - `value` (default): q202's per-key ValueState + one event-time
  *    timer ([[graft.queries.SessionTimerProcessor]]) at KEYS keys —
  *    open, extend (delete + re-register every timer), expire-all;
  *  - `map`: q204's `MapState[String, Long]`
  *    ([[graft.queries.TypeCountsProcessor]]) at KEYS ENTRIES
  *    (KEYS/10 users × 10 types), then a second batch that point-updates
  *    ONE existing type per user — per-entry growth and point-write
  *    cost are what the run measures;
  *  - `list`: q205's k-bounded `ListState`
  *    ([[graft.queries.LastKProcessor]], k = 3) at KEYS ENTRIES
  *    (KEYS/3 users × 3 buffered rows), then a second batch of 3 MORE
  *    events per user — the k-truncation claim is the flat state size
  *    across the two batches.
  *
  * Not part of the driver contract — a targeted bench leg recorded in
  * BASELINE.md. Run: `sbt "runMain graft.StateProbe"`.
  */
object StateProbe {

  def main(args: Array[String]): Unit = {
    val keys = sys.env.getOrElse("SPARK_GRAFT_PROBE_KEYS", "10000000").toLong
    val shape = sys.env.getOrElse("SPARK_GRAFT_PROBE_SHAPE", "value")
    val spark = Sessions.local("graft-state-probe")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_state_probe")
    val srcDir = root.resolve("src"); val chkDir = root.resolve("chk")
    java.nio.file.Files.createDirectories(srcDir)

    // Batch files, mtime-ordered so maxFilesPerTrigger=1 replays them as
    // deterministic micro-batches.
    val t0 = 1700000000000L
    def writeBatch(name: String, df: DataFrame): Unit = {
      val staged = root.resolve(s"stage_$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(staged)
      val sd = java.nio.file.Paths.get(staged)
      val part = java.nio.file.Files.list(sd)
      try part.filter(_.getFileName.toString.endsWith(".parquet"))
        .forEach(f => java.nio.file.Files.move(f, srcDir.resolve(name)))
      finally part.close()
      Thread.sleep(1100) // distinct mtimes => stable file order
    }

    val (out: DataFrame, mode: String) = shape match {
      case "value" =>
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
        (stream.groupByKey(_._1)
          .transformWithState(new graft.queries.SessionTimerProcessor,
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "start_ms", "n_events", "sum_cents"), "append")

      case "map" =>
        val users = math.max(1L, keys / 10L)
        val base = spark.range(users)
        // b0: 10 map entries per user (keys ≈ ENTRIES total)
        writeBatch("b0.parquet", base.select(col("id").as("user_id"))
          .crossJoin(spark.range(10).select(
            concat(lit("t"), col("id")).as("tpe"))))
        // b1: point-update ONE existing entry per user
        writeBatch("b1.parquet", base.select(col("id").as("user_id"),
          lit("t0").as("tpe")))
        val stream = spark.readStream
          .schema("user_id bigint, tpe string")
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir.toString)
          .as[(Long, String)]
        (stream.groupByKey(_._1)
          .transformWithState(new graft.queries.TypeCountsProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDF("user_id", "tpe", "n"), "update")

      case "list" =>
        val users = math.max(1L, keys / 3L)
        val base = spark.range(users)
        def events(offset: Long) = base.select(col("id").as("user_id"))
          .crossJoin(spark.range(3).select(col("id").as("i")))
          .select(col("user_id"), (col("i") + offset).as("ms"),
            (col("user_id") * 10 + col("i") + offset).as("eid"),
            ((col("user_id") + col("i") + offset) % 997).as("cents"))
        writeBatch("b0.parquet", events(0L))  // fills the k=3 buffer
        writeBatch("b1.parquet", events(3L))  // overflows → truncate to k
        val stream = spark.readStream
          .schema("user_id bigint, ms bigint, eid bigint, cents bigint")
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir.toString)
          .as[(Long, Long, Long, Long)]
        (stream.groupByKey(_._1)
          .transformWithState(new graft.queries.LastKProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDF("user_id", "lastk"), "update")

      case other =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_PROBE_SHAPE must be value|map|list, got '$other'")
    }

    val t = System.nanoTime()
    val q = out.writeStream.format("noop").outputMode(mode)
      .option("checkpointLocation", chkDir.toString)
      .start()
    q.processAllAvailable()
    val wallSec = (System.nanoTime() - t) / 1e9
    // keep data batches AND any zero-input batch with state activity
    // (the value shape's expire-all fires on an input-less batch)
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
    println(s"""{"metric":"state_probe","shape":"$shape","keys":$keys,""" +
      s""""wall_sec":$wallSec,""" +
      s""""checkpoint_state_bytes":$stateBytes,"batches":$batches,""" +
      s""""last_batch_rocksdb":$lastCustom}""")
    graft.Staging.deleteRecursively(root)
    spark.stop()
  }
}
