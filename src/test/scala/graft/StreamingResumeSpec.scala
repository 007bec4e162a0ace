package graft

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Cross-RESTART stateful streaming: a windowed aggregation drained in
  * one-file-per-trigger micro-batches, STOPPED after the first wave of
  * files, then resumed from the SAME checkpoint when more files arrive.
  * Window state (partial counts for still-open windows) must survive
  * the restart through the checkpoint + state store, and the final
  * emitted window set must equal a single uninterrupted drain — the
  * daily-restart production shape that q81–q84's single-process drains
  * don't cover.
  */
class StreamingResumeSpec extends SparkSpec {
  import spark.implicits._

  it("append window state survives a stop/resume across arriving files") {
    withTempDir { tmp =>
      val in = Paths.get(tmp.getAbsolutePath, "in")
      val ckpt = s"${tmp.getAbsolutePath}/ckpt"
      Files.createDirectories(in)

      // minute-windowed counts, 1-minute watermark; events in strict
      // time order split across four files. Window [08:00) stays OPEN
      // at the end of wave 1 (watermark = 08:59 - 1m = 07:59) and is
      // completed by wave 2's 08:30 row — the cross-restart handoff.
      def writeFile(idx: Int, rows: Seq[(String, Long)]): Unit = {
        val p = in.resolve(f"f$idx%02d.parquet")
        val tmpDir = in.resolve(s"build_$idx")
        rows.toDF("ts_s", "v")
          .select(col("ts_s").cast("timestamp").as("ts"), col("v"))
          .coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
        val listing = Files.list(tmpDir)
        val part =
          try listing.filter(_.getFileName.toString.endsWith(".parquet")).findFirst().orElseThrow()
          finally listing.close()
        Files.move(part, p)
        val walk = Files.walk(tmpDir)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
        finally walk.close()
        Files.setLastModifiedTime(p, FileTime.fromMillis(1600000000000L + idx * 60000L))
      }

      val schema = spark.read
        .parquet { writeFile(0, Seq(("2021-01-01 08:00:10", 1L))); in.resolve("f00.parquet").toString }
        .schema
      writeFile(1, Seq(("2021-01-01 08:00:40", 2L), ("2021-01-01 08:59:00", 3L)))

      val results = collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      def drain(): Unit = {
        val windows = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(in.toString)
          .withWatermark("ts", "1 minute")
          .groupBy(window(col("ts"), "1 minute").as("w"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
        val q = windows.writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            results.synchronized {
              results ++= df.select(col("w.start").cast("string"), col("n"), col("sum_v"))
                .as[(String, Long, Long)].collect()
            }
            ()
          }
          .outputMode(OutputMode.Append())
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }

      drain() // wave 1: watermark 08:58 closes nothing from 08:00? it closes 08:00 only if wm >= 08:01
      // wave-1 watermark = 08:59:00 - 1m = 08:58 → window [08:00,08:01)
      // (n=2: the 08:00:10 and 08:00:40 rows) emits; [08:59,09:00) stays open
      val afterWave1 = results.toSeq
      assert(afterWave1.contains(("2021-01-01 08:00:00", 2L, 3L)),
        s"wave 1 should emit the closed 08:00 window, got $afterWave1")
      assert(!afterWave1.exists(_._1 == "2021-01-01 08:59:00"),
        "the 08:59 window must still be open (held in state) after wave 1")

      // wave 2: a row EXTENDING the open 08:59 window (state restored
      // from the checkpoint must still hold its n=1 partial) plus a
      // later row that advances the watermark past it
      writeFile(2, Seq(("2021-01-01 08:59:30", 10L)))
      writeFile(3, Seq(("2021-01-01 09:30:00", 4L)))
      drain()

      val all = results.toSeq
      // the resumed drain must emit 08:59 with BOTH rows (2 across the
      // restart boundary): state lost → n=1; state double-applied → n=3
      assert(all.contains(("2021-01-01 08:59:00", 2L, 13L)),
        s"resumed state should complete the 08:59 window with both rows, got $all")
      // no window emitted twice across the restart
      assert(all.map(_._1).distinct.size == all.size, s"duplicate emissions: $all")
    }
  }
}
