package graft.pipeline

import org.scalatest.funspec.AnyFunSpec

/** Config decode semantics (reference ConfigSpec.scala:28-139): golden
  * decode of the sample shape, defaults, and readable errors on invalid
  * input.
  */
class ConfigSpec extends AnyFunSpec {

  private val sample =
    """{
      |  # Optional, but recommended
      |  "region": "eu-central-1",
      |  "purpose": "ENRICHED_EVENTS",
      |  "input": {
      |    "appName": "acme-s3-loader",
      |    "streamName": "/data/in",   // local dir in file mode
      |    "position": "TRIM_HORIZON",
      |    "maxRecords": 10
      |  },
      |  "output": {
      |    "s3": {
      |      "path": "s3://acme-output/raw/",
      |      "dateFormat": "{YYYY}/{MM}",
      |      "filenamePrefix": "pre",
      |      "maxTimeout": 2000,
      |      "compression": "GZIP"
      |    },
      |    "bad": { "streamName": "/data/bad" }
      |  },
      |  "buffer": {
      |    "byteLimit": 2048,
      |    "recordLimit": 10,
      |    "timeLimit": 5000
      |  },
      |  "monitoring": {
      |    "metrics": {
      |      "statsd": {
      |        "hostname": "localhost",
      |        "port": 8125,
      |        "tags": { "app": "graft" }
      |      }
      |    }
      |  }
      |}""".stripMargin

  describe("PipelineConfig.fromString") {
    it("decodes the full sample") {
      val c = PipelineConfig.fromString(sample).fold(e => fail(e), identity)
      assert(c.region.contains("eu-central-1"))
      assert(c.purpose == Purpose.Enriched)
      assert(c.input == InputConfig("acme-s3-loader", "/data/in", InitialPosition.TrimHorizon, 10))
      assert(c.output.s3.path == "s3://acme-output/raw/")
      assert(c.output.s3.bucketName == "acme-output")
      // trailing slash collapses, like the reference's split/tail/mkString
      assert(c.output.s3.outputDirectory.contains("raw"))
      assert(c.output.s3.compression == Compression.Gzip)
      assert(c.output.bad.streamName == "/data/bad")
      assert(c.buffer == BufferConfig(2048, 10, 5000))
      assert(c.monitoring.flatMap(_.statsd).map(_.hostname).contains("localhost"))
      assert(c.monitoring.flatMap(_.statsd).map(_.tags).contains(Map("app" -> "graft")))
    }

    it("decodes AT_TIMESTAMP positions") {
      val c = PipelineConfig.fromString(sample.replace("\"TRIM_HORIZON\"",
        """{ "AT_TIMESTAMP": { "timestamp": "2020-06-03T00:00:00Z" } }"""))
        .fold(e => fail(e), identity)
      assert(c.input.position ==
        InitialPosition.AtTimestamp(java.time.Instant.parse("2020-06-03T00:00:00Z")))
    }

    it("reports a readable error for an invalid purpose") {
      val err = PipelineConfig.fromString(sample.replace("ENRICHED_EVENTS", "NONSENSE"))
        .swap.getOrElse(fail("expected error"))
      assert(err.contains("purpose") && err.toLowerCase.contains("nonsense"))
    }

    it("reports the full path of a missing required key") {
      val err = PipelineConfig.fromString(sample.replace("\"maxTimeout\": 2000,", ""))
        .swap.getOrElse(fail("expected error"))
      assert(err.contains("output.s3.maxTimeout"))
    }

    it("reports type mismatches with the expected type") {
      val err = PipelineConfig.fromString(sample.replace("\"byteLimit\": 2048", "\"byteLimit\": \"lots\""))
        .swap.getOrElse(fail("expected error"))
      assert(err.contains("buffer.byteLimit") && err.contains("number"))
    }

    it("rejects non-positive limits") {
      val err = PipelineConfig.fromString(sample.replace("\"recordLimit\": 10", "\"recordLimit\": 0"))
        .swap.getOrElse(fail("expected error"))
      assert(err.contains("recordLimit"))
    }

    it("decodes the optional snowplow lifecycle section") {
      val withSp = sample.replace("\"metrics\": {",
        "\"snowplow\": { \"appId\": \"angry-birds\", \"path\": \"/tmp/track.jsonl\" },\n    \"metrics\": {")
      val c = PipelineConfig.fromString(withSp).fold(e => fail(e), identity)
      assert(c.monitoring.flatMap(_.snowplow).contains(SnowplowConfig("angry-birds", "/tmp/track.jsonl")))
    }

    it("substitutes environment variables like ConfigFactory.resolve") {
      val path = sys.env.get("PATH")
      assume(path.nonEmpty)
      val c = PipelineConfig.fromString(sample.replace("acme-s3-loader", "${PATH}"))
        .fold(e => fail(e), identity)
      assert(c.input.appName == path.get)
      val c2 = PipelineConfig.fromString(sample.replace("acme-s3-loader", "${?GRAFT_UNSET_VAR_42}"))
        .fold(e => fail(e), identity)
      assert(c2.input.appName == "")
    }
  }

  describe("PipelineConfig.load") {
    it("decodes the shipped config/config.hocon.sample from disk") {
      val path = java.nio.file.Paths.get("config/config.hocon.sample")
      assume(java.nio.file.Files.exists(path)) // run from the repo root
      val c = PipelineConfig.load(path).fold(e => fail(e), identity)
      assert(c.purpose == Purpose.Enriched)
      assert(c.input.appName == "acme-s3-loader")
      assert(c.output.s3.compression == Compression.Gzip)
      assert(c.buffer == BufferConfig(2048, 10, 5000))
      assert(c.monitoring.flatMap(_.statsd).exists(_.prefix.contains("snowplow.monitoring")))
      assert(c.monitoring.flatMap(_.snowplow).exists(_.appId == "acme-loader"))
    }
  }
}
