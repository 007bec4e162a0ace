package graft.pipeline

import java.time.Instant
import org.scalatest.funspec.AnyFunSpec

/** Wire-format goldens per reference StatsD.scala:83-91. */
class StatsDSpec extends AnyFunSpec {
  private val cfg = StatsDConfig("localhost", 8125, Map("tag1" -> "v1"), None)

  describe("StatsD.format") {
    it("formats counts with default prefix and tags") {
      assert(StatsD.format(cfg, StatsD.Count("count", 42))
        == "graft.loader.count:42|c|#tag1:v1")
    }
    it("formats gauges with custom prefix, adding a trailing dot") {
      assert(StatsD.format(cfg.copy(prefix = Some("acme")), StatsD.Gauge("latency_collector_to_load", "7"))
        == "acme.latency_collector_to_load:7|g|#tag1:v1")
    }
    it("keeps an explicit trailing-dot/empty prefix as-is") {
      assert(StatsD.format(cfg.copy(prefix = Some("")), StatsD.Count("count", 1)) == "count:1|c|#tag1:v1")
    }
  }

  describe("StatsD.fromMeta") {
    it("emits latency gauge + count for enriched meta") {
      val now = Instant.parse("2020-01-01T00:01:40Z")
      val meta = StatsD.Meta(Some(Instant.parse("2020-01-01T00:00:00Z")), 9)
      assert(StatsD.fromMeta(meta, now) ==
        List(StatsD.Gauge("latency_collector_to_load", "100"), StatsD.Count("count", 9)))
    }
    it("emits only count when no tstamp") {
      assert(StatsD.fromMeta(StatsD.Meta(None, 3), Instant.EPOCH) == List(StatsD.Count("count", 3)))
    }
  }
}
