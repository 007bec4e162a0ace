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

    it("a shard SPLIT holds both children until the parent drains (parent-before-child)") {
      withTempDir { tmp =>
        val work = tmp.getAbsolutePath
        val now = Instant.parse("2021-04-30T12:00:00Z")
        // parent P: 4 records (cap 2 → cycles 0,1); children C1 (3) and
        // C2 (2) may only start at cycle 2 — the first cycle after P's
        // last chunk — even though their records are all present
        val records =
          (1 to 4).map(i => ShardedSource.Record("P", 100L + i, s"p-$i", arrival)) ++
          (1 to 3).map(i => ShardedSource.Record("C1", 500L + i, s"c1-$i", arrival)) ++
          (1 to 2).map(i => ShardedSource.Record("C2", 600L + i, s"c2-$i", arrival))
        val source = new ShardedSource(records, s"$work/stage",
          parents = Map("C1" -> Seq("P"), "C2" -> Seq("P")))

        val result = Pipeline.runOnce(spark, config(work, maxRecords = 2),
          checkpointDir = Some(s"$work/checkpoint"),
          now = Some(now), source = source)

        // cycle0={p1,p2} cycle1={p3,p4} cycle2={c1-1,c1-2,c2-1,c2-2} cycle3={c1-3}
        assert(result.batches.map(_.count).sorted == Seq(1L, 2L, 2L, 4L))
        val files = listFilesRec(new File(s"$work/out")).filter(_.getName.endsWith(".gz"))
        val ranges = files.map(_.getName.stripSuffix(".gz").split("-").takeRight(2).toSeq)
          .map { case Seq(a, b) => (a.toLong, b.toLong) }.sorted
        assert(ranges == Seq((101L, 102L), (103L, 104L), (501L, 602L), (503L, 503L)))
      }
    }

    it("a shard MERGE holds the child until BOTH parents drain") {
      withTempDir { tmp =>
        val work = tmp.getAbsolutePath
        val now = Instant.parse("2021-04-30T12:00:00Z")
        // M1: 3 records (cycles 0,1); M2: 1 record (cycle 0); merged
        // child MM waits for the LATER parent → starts at cycle 2
        val records =
          (1 to 3).map(i => ShardedSource.Record("M1", 200L + i, s"m1-$i", arrival)) ++
          Seq(ShardedSource.Record("M2", 301L, "m2-1", arrival)) ++
          (1 to 3).map(i => ShardedSource.Record("MM", 400L + i, s"mm-$i", arrival))
        val source = new ShardedSource(records, s"$work/stage",
          parents = Map("MM" -> Seq("M1", "M2")))

        val result = Pipeline.runOnce(spark, config(work, maxRecords = 2),
          checkpointDir = Some(s"$work/checkpoint"),
          now = Some(now), source = source)

        // cycle0={m1-1,m1-2,m2-1} cycle1={m1-3} cycle2={mm-1,mm-2} cycle3={mm-3}
        assert(result.batches.map(_.count).sorted == Seq(1L, 1L, 2L, 3L))
        val files = listFilesRec(new File(s"$work/out")).filter(_.getName.endsWith(".gz"))
        val ranges = files.map(_.getName.stripSuffix(".gz").split("-").takeRight(2).toSeq)
          .map { case Seq(a, b) => (a.toLong, b.toLong) }.sorted
        assert(ranges == Seq((201L, 301L), (203L, 203L), (401L, 402L), (403L, 403L)))
      }
    }
  }

  describe("ShardedSource.startCycles") {
    it("chains depth-2 topologies and tolerates recordless parents") {
      // a → b → c with a empty: b starts at a's start (0), c after b
      val start = ShardedSource.startCycles(
        counts = Map("b" -> 3, "c" -> 1),
        parents = Map("b" -> Seq("a"), "c" -> Seq("b")), cap = 2)
      assert(start == Map("a" -> 0, "b" -> 0, "c" -> 2))
    }

    it("treats a topology-only parent as drained and rejects cyclic topologies") {
      // a parent named only in the topology is a closed, recordless
      // shard (Kinesis ListShards still enumerates it): child starts
      // immediately rather than deadlocking on a shard that never fetches
      val start = ShardedSource.startCycles(
        Map("a" -> 2), Map("a" -> Seq("ghost")), cap = 1)
      assert(start == Map("ghost" -> 0, "a" -> 0))
      val e = intercept[IllegalArgumentException] {
        ShardedSource.startCycles(Map("a" -> 1, "b" -> 1),
          Map("a" -> Seq("b"), "b" -> Seq("a")), cap = 1)
      }
      assert(e.getMessage.contains("cyclic"))
    }
  }

  describe("ShardedSource initial position") {
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
