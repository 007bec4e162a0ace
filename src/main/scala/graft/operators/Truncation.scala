package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage-truncation policy for iterative operators
  * ([[Dedup.connectedComponents]], [[Similarity.trainCentroids]]).
  *
  * Iterative DataFrame plans grow per round; without truncation the
  * optimizer re-analyzes an ever-deeper tree and recovery lineage
  * explodes. The two policies trade speed against executor-loss
  * resilience:
  *
  *  - [[Truncation.Local]] (default): eager `localCheckpoint` every
  *    round. Fastest — no distributed-FS writes — but blocks live
  *    UNREPLICATED in executor storage and the lineage is severed, so
  *    losing one executor mid-iteration fails the job (a restart, never
  *    a wrong answer: the converge-or-throw guard still holds). The
  *    right choice on a healthy cluster or in local mode.
  *  - [[Truncation.Reliable]]: every `every`-th round is an eager
  *    `df.checkpoint()` against a configured reliable directory (HDFS /
  *    object store); rounds in between materialize via
  *    `persist(MEMORY_AND_DISK)` WITH lineage intact, rooted at the
  *    last reliable checkpoint. Executor loss then costs at most
  *    `every` rounds of recompute from a durable root instead of the
  *    whole job — the warehouse shape for long iterations on
  *    preemptible hardware.
  */
sealed trait Truncation {
  /** Materialize `df` for round `round` (0 = the pre-iteration base
    * tables) and return the frame downstream rounds should build on. */
  private[operators] def truncate(df: DataFrame, round: Int): DataFrame

  /** Called ONCE by the iterative operator when its loop completes,
    * with the frame it is about to return: the policy releases every
    * intermediate it still holds and returns the frame consumers should
    * use. Without this, the last rounds' materializations would stay
    * pinned for the policy instance's lifetime — a per-run storage leak
    * in any long-lived session. Default: nothing held, pass through. */
  private[operators] def finish(result: DataFrame): DataFrame = result
}

object Truncation {

  /** Eager unreplicated local checkpoint every round (speed over
    * executor-loss resilience). */
  case object Local extends Truncation {
    private[operators] def truncate(df: DataFrame, round: Int): DataFrame =
      df.localCheckpoint(true)
  }

  /** Reliable checkpoint to `dir` every `every` rounds, lineage-keeping
    * `persist` in between. Round 0 (the base tables an iteration joins
    * against every round) always checkpoints reliably — those blocks
    * must outlive any executor. Each policy instance points the
    * SparkContext's checkpoint location at its own `dir` on first use
    * (the checkpoint dir is per-context in Spark, so the most recently
    * started policy wins — run one iterative operator per policy
    * instance).
    *
    * Storage is bounded over long iterations: persisted intermediates
    * are explicitly unpersisted once they fall TWO rounds behind (a
    * caller's convergence check touches at most the current and
    * previous round; two-rounds-stale frames are unreachable), so
    * executor disk holds O(`every`) label tables, not O(iterations).
    * Durable checkpoint FILES in `dir` are owned by Spark's
    * ContextCleaner: set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` to have
    * superseded roots deleted as they become unreachable, and point
    * `dir` at a job-scoped location that is removed after the job
    * either way (never at a shared long-lived path).
    */
  final case class Reliable(dir: String, every: Int = 5) extends Truncation {
    require(every >= 1, s"every must be >= 1, got $every")

    @volatile private var dirClaimed = false
    // persisted intermediates awaiting delayed unpersist: (round, frame)
    private var pendingUnpersist: List[(Int, DataFrame)] = Nil

    // truncate/finish are synchronized: one policy instance belongs to
    // ONE iterative operator (the round-indexed ledger assumes a single
    // loop), but if an instance IS accidentally shared across threads,
    // serialization degrades misuse to early unpersists (recompute from
    // lineage) rather than a corrupted ledger leaking blocks.
    private[operators] def truncate(df: DataFrame, round: Int): DataFrame = synchronized {
      val sc = df.sparkSession.sparkContext
      val out = if (round % every == 0) {
        if (!dirClaimed) { sc.setCheckpointDir(dir); dirClaimed = true }
        df.checkpoint(true)
      } else {
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        p.count() // eager, like the checkpoint branches — the round's
        // convergence/assignment action must read a materialized frame
        pendingUnpersist ::= (round, p)
        p
      }
      val (stale, keep) = pendingUnpersist.partition(_._1 <= round - 2)
      stale.foreach(_._2.unpersist(false))
      pendingUnpersist = keep
      out
    }

    /** Release every still-held intermediate. If the final frame is
      * itself a persisted (non-checkpoint-round) intermediate, root it
      * durably first — consumers then read the reliable copy and the
      * persisted blocks are releasable; its lineage-intact alternative
      * would silently recompute from the last checkpoint on every
      * downstream read. */
    override private[operators] def finish(result: DataFrame): DataFrame = synchronized {
      val out =
        if (pendingUnpersist.exists(_._2 eq result)) result.checkpoint(true)
        else result
      pendingUnpersist.foreach(_._2.unpersist(false))
      pendingUnpersist = Nil
      out
    }
  }
}
