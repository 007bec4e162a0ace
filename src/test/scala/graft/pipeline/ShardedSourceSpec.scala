package graft.pipeline

import java.io.File
import java.time.Instant
import scala.sys.process._

import graft.SparkSpec

/** The Kinesis-shaped [[ShardedSource]] double driven through the full
  * pipeline: per-shard sequence-number METADATA → `seq` column →
  * reference-style `firstSeq-lastSeq` object names (golden, reference
  * KinesisS3Emitter.scala:226-244); fetch caps → one micro-batch per
  * simulated fetch cycle; initial-position seeks. This is the executable
  * contract a real Kinesis adapter must meet (no connector jar offline).
  */
class ShardedSourceSpec extends SparkSpec {

  private def listFilesRec(dir: File): Seq[File] = {
    val these = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
    these.filter(_.isFile) ++ these.filter(_.isDirectory).flatMap(listFilesRec)
  }

  private def config(work: String, maxRecords: Int,
                     position: InitialPosition = InitialPosition.TrimHorizon) =
    PipelineConfig(
      region = None,
      purpose = Purpose.Raw,
      input = InputConfig("graft-shards", s"$work/unused", position, maxRecords = maxRecords),
      output = OutputConfig(
        S3OutputConfig(s"$work/out", dateFormat = None, filenamePrefix = Some("graft"),
          compression = Compression.Gzip, maxTimeout = 10000),
        BadOutputConfig(s"$work/bad")),
      buffer = BufferConfig(1 << 20, 1000, 0),
      monitoring = None)

  private val arrival = Instant.parse("2021-04-29T00:00:00Z")

  /** Two shards, interleaved sequence ranges — like two Kinesis shards
    * each counting its own monotonic sequence. */
  private def twoShards: Seq[ShardedSource.Record] =
    Seq(
      ShardedSource.Record("shardId-000000000000", 101L, "a-101", arrival),
      ShardedSource.Record("shardId-000000000000", 103L, "a-103", arrival),
      ShardedSource.Record("shardId-000000000001", 102L, "b-102", arrival),
      ShardedSource.Record("shardId-000000000001", 107L, "b-107", arrival))

  private def gunzip(f: File): Seq[String] =
    s"gunzip -c ${f.getAbsolutePath}".!!.split("\n", -1).dropRight(1).toSeq

  describe("ShardedSource.seqString") {
    it("rejects negative sequence numbers (the '-' would break lexicographic order)") {
      assert(ShardedSource.seqString(0L) == "0" * 20)
      val e = intercept[IllegalArgumentException] { ShardedSource.seqString(-1L) }
      assert(e.getMessage.contains("non-negative"))
    }
  }

  describe("ShardedSource through Pipeline.runOnce") {
    it("names objects with the batch's metadata seq range (golden reference-style name)") {
      withTempDir { tmp =>
        val work = tmp.getAbsolutePath
        val now = Instant.parse("2021-04-30T12:00:00Z")
        val source = new ShardedSource(twoShards, s"$work/stage")

        val result = Pipeline.runOnce(spark, config(work, maxRecords = 100),
          checkpointDir = Some(s"$work/checkpoint"),
          now = Some(now), source = source)

        assert(result.batches.map(_.count).sum == 4)
        val files = listFilesRec(new File(s"$work/out")).filter(_.getName.endsWith(".gz"))
        assert(files.size == 1)
        // GOLDEN: prefix-yyyy-MM-dd-HHmmss-firstSeq-lastSeq.gz where the
        // seqs are the zero-padded metadata numbers — min 101 (shard a),
        // max 107 (shard b): the flush's union range across shards.
        assert(files.head.getName ==
          "graft-2021-04-30-120000-00000000000000000101-00000000000000000107.gz")
        assert(gunzip(files.head).sorted == Seq("a-101", "a-103", "b-102", "b-107"))
      }
    }

    it("fetch cap maxRecords splits the drain into per-cycle micro-batches with per-cycle seq ranges") {
      withTempDir { tmp =>
        val work = tmp.getAbsolutePath
        val now = Instant.parse("2021-04-30T12:00:00Z")
        val records = (1 to 5).map(i =>
          ShardedSource.Record("shardId-000000000000", 200L + i, s"rec-$i", arrival))
        val source = new ShardedSource(records, s"$work/stage")

        val result = Pipeline.runOnce(spark, config(work, maxRecords = 2),
          checkpointDir = Some(s"$work/checkpoint"),
          now = Some(now), source = source)

        // 5 records / cap 2 → 3 fetch cycles → 3 flushes in sequence order
        assert(result.batches.map(_.count).sorted == Seq(1L, 2L, 2L))
        val files = listFilesRec(new File(s"$work/out")).filter(_.getName.endsWith(".gz"))
        val ranges = files.map(_.getName.stripSuffix(".gz").split("-").takeRight(2).toSeq)
          .map { case Seq(a, b) => (a.toLong, b.toLong) }.sorted
        assert(ranges == Seq((201L, 202L), (203L, 204L), (205L, 205L)))
        assert(files.flatMap(gunzip).sorted == (1 to 5).map(i => s"rec-$i"))
      }
    }

    it("unevenly-sized shards never exceed the per-shard cap in any micro-batch") {
      withTempDir { tmp =>
        val work = tmp.getAbsolutePath
        val now = Instant.parse("2021-04-30T12:00:00Z")
        // shard A: 6 records, shard B: 2 — B drains after cycle 0 while
        // A keeps producing cycles; each micro-batch is exactly one cycle
        val records =
          (1 to 6).map(i => ShardedSource.Record("shardId-000000000000", 300L + i, s"a-$i", arrival)) ++
          (1 to 2).map(i => ShardedSource.Record("shardId-000000000001", 400L + i, s"b-$i", arrival))
        val source = new ShardedSource(records, s"$work/stage")

        val result = Pipeline.runOnce(spark, config(work, maxRecords = 2),
          checkpointDir = Some(s"$work/checkpoint"),
          now = Some(now), source = source)

        // cycle0 = {a1,a2,b1,b2}, cycle1 = {a3,a4}, cycle2 = {a5,a6}
        assert(result.batches.map(_.count).sorted == Seq(2L, 2L, 4L))
        val files = listFilesRec(new File(s"$work/out")).filter(_.getName.endsWith(".gz"))
        val ranges = files.map(_.getName.stripSuffix(".gz").split("-").takeRight(2).toSeq)
          .map { case Seq(a, b) => (a.toLong, b.toLong) }.sorted
        assert(ranges == Seq((301L, 402L), (303L, 304L), (305L, 306L)))
        assert(files.flatMap(gunzip).sorted ==
          ((1 to 6).map(i => s"a-$i") ++ (1 to 2).map(i => s"b-$i")).sorted)
      }
    }

    it("initial position seeks: TRIM_HORIZON all, AT_TIMESTAMP from the seek point, LATEST = tip (empty)") {
      withTempDir { tmp =>
        val work = tmp.getAbsolutePath
        val early = Instant.parse("2021-04-29T00:00:00Z")
        val late = Instant.parse("2021-04-29T06:00:00Z")
        val records = Seq(
          ShardedSource.Record("shardId-000000000000", 1L, "old", early),
          ShardedSource.Record("shardId-000000000000", 2L, "new", late))

        def drained(sub: String, position: InitialPosition): Seq[String] = {
          val w = s"$work/$sub"
          val result = Pipeline.runOnce(spark,
            config(w, maxRecords = 100, position = position),
            checkpointDir = Some(s"$w/checkpoint"),
            source = new ShardedSource(records, s"$w/stage"))
          listFilesRec(new File(s"$w/out")).filter(_.getName.endsWith(".gz"))
            .flatMap(gunzip).sorted
        }

        assert(drained("trim", InitialPosition.TrimHorizon) == Seq("new", "old"))
        assert(drained("at", InitialPosition.AtTimestamp(late)) == Seq("new"))
        // LATEST = the stream tip at source construction: pre-existing
        // records are behind the tip, so a drain admits nothing.
        assert(drained("latest", InitialPosition.Latest) == Seq.empty)
      }
    }
  }
}
