package graft.pipeline

import java.nio.file.{Files, Paths}
import java.time.Instant
import org.scalatest.funspec.AnyFunSpec

class LifecycleSpec extends AnyFunSpec {

  private def withTracker[A](heartbeatMs: Long)(f: (Lifecycle, String) => A): A = {
    val dir = Files.createTempDirectory("graft-lifecycle")
    val path = dir.resolve("tracking.jsonl").toString
    val lc = new Lifecycle(path, "test-app", heartbeatMs,
      clock = () => Instant.parse("2021-04-30T12:00:00Z"))
    try f(lc, path)
    finally lc.shutdown()
  }

  private def lines(path: String): List[String] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(Paths.get(path))) Nil
    else Files.readAllLines(Paths.get(path)).asScala.toList
  }

  describe("Lifecycle") {
    it("emits app_initialized then app_shutdown as self-describing events") {
      withTracker(heartbeatMs = 3600000L) { (lc, path) =>
        lc.start()
        lc.shutdown()
        val ls = lines(path)
        assert(ls.size == 2)
        assert(ls.head.contains(""""schema":"iglu:com.graft/app_initialized/jsonschema/1-0-0""""))
        assert(ls.head.contains(""""applicationName":"test-app""""))
        assert(ls.last.contains("app_shutdown"))
      }
    }

    it("emits heartbeats on the configured interval") {
      withTracker(heartbeatMs = 50L) { (lc, path) =>
        lc.start()
        Thread.sleep(400)
        lc.shutdown()
        assert(lines(path).count(_.contains("app_heartbeat")) >= 2)
      }
    }

    it("records storage failures with the message") {
      withTracker(heartbeatMs = 3600000L) { (lc, path) =>
        lc.storageWriteFailed("S3 said \"no\"")
        val l = lines(path).head
        assert(l.contains("storage_write_failed"))
        assert(l.contains("""S3 said \"no\""""))
      }
    }

    it("shutdown is idempotent") {
      withTracker(heartbeatMs = 3600000L) { (lc, path) =>
        lc.start()
        lc.shutdown(); lc.shutdown()
        assert(lines(path).count(_.contains("app_shutdown")) == 1)
      }
    }

    it("escapes control characters and backslashes into valid JSON") {
      withTracker(heartbeatMs = 3600000L) { (lc, path) =>
        lc.storageWriteFailed("line1\nline2\tC:\\temp")
        val l = lines(path).head
        assert(l.contains("""line1\nline2\tC:\\temp"""))
        assert(!l.contains('\n'.toString + "line2")) // one physical line
      }
    }
  }

  describe("CrashListener (O19)") {
    it("forwards a query-terminated exception to the lifecycle tracking file") {
      withTracker(heartbeatMs = 3600000L) { (lc, path) =>
        val spark = graft.TestSession.spark
        import spark.implicits._
        val listener = new CrashListener(lc)
        spark.streams.addListener(listener)
        try {
          val dir = Files.createTempDirectory("graft-crash")
          Files.write(dir.resolve("in.txt"), "boom\n".getBytes("UTF-8"))
          val q = spark.readStream.text(dir.toString).writeStream
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
              throw new RuntimeException("simulated storage failure")
            }
            .start()
          intercept[Exception] { q.awaitTermination() }
          // listener-bus delivery is async — poll briefly
          val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
          while (!lines(path).exists(_.contains("storage_write_failed"))
                 && System.nanoTime() < deadline) Thread.sleep(50)
          val l = lines(path).filter(_.contains("storage_write_failed"))
          assert(l.nonEmpty, "no failure event forwarded")
          assert(l.head.contains("simulated storage failure"))
        } finally spark.streams.removeListener(listener)
      }
    }
  }
}
