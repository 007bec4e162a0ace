package graft.pipeline

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path, Paths}
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kinesis-SHAPED source double (reference
  * `KinesisSourceExecutor.scala:44-151`, `KinesisS3Emitter.scala:72-73`):
  * an in-repo [[Source]] that simulates the transport semantics a real
  * Kinesis adapter must provide — without the connector jar, which does
  * not exist offline (SURVEY §7.5.3).
  *
  * What it simulates, and what a real adapter must therefore supply:
  *  - **Per-shard sequence numbers as record METADATA**: each record
  *    carries an opaque, per-shard-monotonic sequence string (zero-padded
  *    so lexicographic order == numeric order, like Kinesis's fixed-width
  *    decimal sequence numbers). They surface as the contract's
  *    `seq: string` column — NOT parsed from the payload — and flow into
  *    the emitter's `firstSeq-lastSeq` file naming (O15). Divergence from
  *    the reference, by design: a KCL buffer is per-shard (one record
  *    processor per lease), so reference object names span one shard's
  *    range; a Spark micro-batch spans ALL shards, so the name covers the
  *    union range of the flush. Per-shard naming would reintroduce a
  *    per-shard coalesce — the exact-naming bottleneck — for no
  *    correctness gain.
  *  - **Fetch caps**: `input.maxRecords` is the per-shard GetRecords
  *    limit. Each fetch CYCLE (≤ `maxRecords` next-in-sequence records
  *    from every shard that still has any) is staged as ONE file with
  *    strictly increasing modification times per cycle, and the stream
  *    reads `maxFilesPerTrigger = 1` — so each micro-batch IS exactly
  *    one fetch cycle, honoring the per-shard cap by construction even
  *    when shards drain unevenly (a shard with more records keeps
  *    producing cycles after shorter shards run dry).
  *  - **Initial position** applied BEFORE admission, like a per-shard
  *    iterator seek (reference `Config.scala:62-106`): TRIM_HORIZON =
  *    everything retained; AT_TIMESTAMP(ts) = records with
  *    `arrival >= ts`; LATEST = the stream tip at source construction —
  *    for a fixed pre-existing record set that is the EMPTY set (only
  *    records arriving after startup qualify), which is exactly Kinesis
  *    LATEST semantics and is pinned by spec.
  *  - **Resharding with parent-before-child ordering**: `parents` maps a
  *    child shard to the shard(s) it was split or merged from. The KCL
  *    contract (reference `KinesisSourceExecutor.scala:63-93` lease
  *    semantics) is that a child shard's lease is not processed until
  *    every parent shard is fully consumed and checkpointed — otherwise
  *    per-key ordering breaks across the reshard boundary. The double
  *    enforces exactly that: a child contributes NOTHING to any fetch
  *    cycle before the cycle in which its last parent drains completely
  *    (a split's two children share one parent; a merge's one child
  *    waits on BOTH parents). Within a shard, admission stays
  *    sequence-ordered and fetch-capped as before.
  *
  * The double stages through parquet purely as the local transport; a
  * real adapter replaces `lines` with the connector's stream and keeps
  * the same output contract: `value: string` + `seq: string`, positioned
  * and admission-capped.
  */
final class ShardedSource(records: Seq[ShardedSource.Record], stageDir: String,
                          parents: Map[String, Seq[String]] = Map.empty) extends Source {

  /** Stream tip at construction — LATEST's cutoff (a real adapter gets
    * this from the LATEST shard iterator; restart identity would ride the
    * checkpoint exactly like [[FileSource]]'s persisted cutoff marker). */
  private val tip: Instant = Instant.now()

  def lines(spark: SparkSession, config: PipelineConfig,
            checkpointDir: Option[String] = None): DataFrame = {
    val positioned = config.input.position match {
      case InitialPosition.TrimHorizon     => records
      case InitialPosition.Latest          => records.filter(r => !r.arrival.isBefore(tip))
      case InitialPosition.AtTimestamp(ts) => records.filter(r => !r.arrival.isBefore(ts))
    }
    val cap = math.max(1, config.input.maxRecords)
    val shards = positioned.groupBy(_.shardId).toSeq.sortBy(_._1)
    val startCycle = ShardedSource.startCycles(
      shards.map { case (s, rs) => s -> rs.size }.toMap, parents, cap)
    val rows = shards.flatMap { case (shard, rs) =>
      val base = startCycle(shard)
      rs.sortBy(_.sequenceNumber).grouped(cap).zipWithIndex.flatMap { case (chunk, i) =>
        chunk.map(r => (r.data, ShardedSource.seqString(r.sequenceNumber), base + i))
      }
    }

    import spark.implicits._
    // One parquet file per fetch cycle (all shards' chunk for that
    // cycle together): the repartition puts each cycle wholly in one
    // task, so partitionBy emits exactly one file per cycle directory —
    // and maxFilesPerTrigger=1 below makes each micro-batch exactly one
    // cycle, even when shards have different cycle counts.
    rows.toDF("value", "seq", "cycle")
      .repartition(col("cycle"))
      .write.mode("overwrite").partitionBy("cycle").parquet(stageDir)
    ShardedSource.stampCycleTimes(Paths.get(stageDir))

    val schema = StructType(Seq(
      StructField("value", StringType),
      StructField("seq", StringType),
      StructField("cycle", IntegerType)))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageDir)
      .select(col("value"), col("seq"))
  }
}

object ShardedSource {

  /** One stream record: `sequenceNumber` is per-shard monotonic (the
    * adapter's metadata, never payload); `arrival` is the stream-side
    * arrival time the initial-position seek filters on. */
  final case class Record(shardId: String, sequenceNumber: Long, data: String,
                          arrival: Instant)

  /** First fetch cycle each shard may contribute to, under the
    * parent-before-child reshard contract: a parentless shard starts at
    * cycle 0; a child starts at the max FINISH cycle of its parents,
    * where finish(s) = start(s) + ceil(records(s)/cap) — the first cycle
    * after the parent's last chunk. A parent named only in the topology
    * is a drained, recordless shard (real Kinesis enumerates closed
    * shards via ListShards) and finishes at its own start. Cyclic
    * topologies fail fast rather than deadlocking the simulated stream.
    */
  private[pipeline] def startCycles(counts: Map[String, Int],
                                    parents: Map[String, Seq[String]],
                                    cap: Int): Map[String, Int] = {
    val known = counts.keySet ++ parents.keySet ++ parents.values.flatten
    val start = collection.mutable.Map.empty[String, Int]
    def finish(shard: String, path: List[String]): Int = {
      require(!path.contains(shard),
        s"cyclic shard topology through '$shard' (${path.reverse.mkString(" -> ")})")
      val st = start.get(shard) match {
        case Some(v) => v
        case None =>
          val v = parents.get(shard).filter(_.nonEmpty)
            .map(_.map(p => finish(p, shard :: path)).max).getOrElse(0)
          start(shard) = v
          v
      }
      val n = counts.getOrElse(shard, 0)
      st + (n + cap - 1) / cap
    }
    known.foreach(s => finish(s, Nil))
    start.toMap
  }

  /** Kinesis-style opaque sequence string: fixed-width decimal, so
    * lexicographic min/max (what the emitter computes over the string
    * column) equals numeric order. Non-negative only — a '-' sign would
    * sort BEFORE digits and silently break that contract (real Kinesis
    * sequence numbers are unsigned). */
  def seqString(n: Long): String = {
    require(n >= 0, s"sequence numbers must be non-negative, got $n")
    f"$n%020d"
  }

  /** Make fetch-cycle k strictly older than k+1 so the file stream's
    * modification-time ordering admits cycles in order. The epoch base is
    * arbitrary but fixed — determinism over realism. */
  private def stampCycleTimes(root: Path): Unit = {
    val base = 1600000000000L
    def listOf[A](s: java.util.stream.Stream[A]): Seq[A] =
      try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toSeq }
      finally s.close()
    listOf(Files.list(root))
      .filter(_.getFileName.toString.startsWith("cycle="))
      .foreach { dir =>
        val k = dir.getFileName.toString.stripPrefix("cycle=").toLong
        listOf(Files.walk(dir)).filter(Files.isRegularFile(_)).foreach { f =>
          Files.setLastModifiedTime(f, FileTime.fromMillis(base + k * 1000L))
        }
      }
  }
}
