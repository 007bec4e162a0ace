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
  }
}
