package graft.pipeline

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming health metrics: golden wire lines from a pinned
  * BatchHealth, and a real multi-batch drain emitting one metric group
  * per micro-batch with exact per-batch input-row counts.
  */
class StreamingMetricsSpec extends SparkSpec {

  private val config = StatsDConfig(hostname = "localhost", port = 8125,
    tags = Map("app" -> "graft"), prefix = Some("graft.loader"))

  describe("StreamingMetrics.metrics") {
    it("formats the full golden metric group (watermark + state)") {
      val h = StreamingMetrics.BatchHealth(
        batchId = 3, numInputRows = 250, inputRowsPerSecond = 125.0,
        processedRowsPerSecond = 500.25, triggerMs = 420,
        watermark = Some(Instant.parse("2021-04-30T11:59:30Z")),
        stateRows = Some(17), stateBytes = Some(4096))
      val now = Instant.parse("2021-04-30T12:00:00Z")
      val lines = StreamingMetrics.metrics(h, now).map(StatsD.format(config, _))
      assert(lines == List(
        "graft.loader.stream.input_rows:250|c|#app:graft",
        "graft.loader.stream.input_rows_per_sec:125.0|g|#app:graft",
        "graft.loader.stream.processed_rows_per_sec:500.3|g|#app:graft",
        "graft.loader.stream.trigger_ms:420|g|#app:graft",
        "graft.loader.stream.watermark_lag_sec:30|g|#app:graft",
        "graft.loader.stream.state_rows:17|g|#app:graft",
        "graft.loader.stream.state_bytes:4096|g|#app:graft"))
    }

    it("omits watermark/state lines when the query has neither") {
      val h = StreamingMetrics.BatchHealth(0, 10, 0.0, 0.0, 5, None, None, None)
      val keys = StreamingMetrics.metrics(h, Instant.EPOCH).map(_.key)
      assert(keys == List("stream.input_rows", "stream.input_rows_per_sec",
        "stream.processed_rows_per_sec", "stream.trigger_ms"))
    }
  }

  describe("StreamingMetrics listener on a live drain") {
    it("emits one metric group per micro-batch with exact input-row counts") {
      import spark.implicits._
      val dir = Files.createTempDirectory("graft-smetrics")
      // three files = three AvailableNow micro-batches of 2, 3, 4 rows
      Seq(2, 3, 4).zipWithIndex.foreach { case (n, i) =>
        Files.write(dir.resolve(s"f$i.txt"),
          (1 to n).map(j => s"b$i-$j").mkString("", "\n", "\n").getBytes("UTF-8"))
      }
      val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new StreamingMetrics(config, ls => { ls.foreach(captured.add); () },
        now = () => Instant.parse("2021-04-30T12:00:00Z"))
      spark.streams.addListener(listener)
      try {
        val q = spark.readStream.option("maxFilesPerTrigger", 1).text(dir.toString)
          .groupBy(col("value")).count()
          .writeStream.trigger(Trigger.AvailableNow())
          .outputMode("update")
          .format("noop").start()
        q.awaitTermination()
        // listener-bus delivery is async — poll for the three groups
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        def rows() = {
          import scala.jdk.CollectionConverters._
          captured.iterator().asScala.toSeq.filter(_.contains("stream.input_rows:"))
        }
        while (rows().size < 3 && System.nanoTime() < deadline) Thread.sleep(50)
        val counts = rows().map(_.split(":")(1).split('|')(0).toLong).sorted
        assert(counts == Seq(2L, 3L, 4L))
        // the stateful aggregation surfaces state-store size per batch
        import scala.jdk.CollectionConverters._
        val stateLines = captured.iterator().asScala.toSeq
          .filter(_.contains("stream.state_rows:"))
        assert(stateLines.size >= 3)
        val stateRows = stateLines.map(_.split(":")(1).split('|')(0).toLong)
        // distinct keys accumulate across batches to 9; per-batch order
        // follows file-admission order (not pinned), so assert growth
        assert(stateRows == stateRows.sorted && stateRows.last == 9L)
      } finally spark.streams.removeListener(listener)
    }
  }
}
