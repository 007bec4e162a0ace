package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus snapshot diff — the incremental-ingest audit a training
  * pipeline runs between two crawls/dumps of the same corpus: which
  * documents appeared, vanished, or changed content? Downstream it
  * drives incremental dedup/tokenization (process `added ∪ changed`
  * only) and deletion-propagation (retract `removed` from derived
  * sets). The reference engine ships whole objects downstream and has
  * no corpus-level diff; semantics here follow rsync-style
  * content-fingerprint comparison.
  *
  * Shape at 100 TB: both sides reduce to (id, 8-byte fingerprint)
  * BEFORE the join — column pruning keeps the scans narrow and the
  * shuffle payload is ~16 bytes/row, so the full-outer sort-merge join
  * on the id is the only wide stage and it moves fingerprints, never
  * documents. With both snapshots bucketed by id on disk the shuffle
  * vanishes entirely (see [[Bucketing]]).
  */
object SnapshotDiff {

  /** Diff `oldDf` → `newDf` by `id`, comparing `payload` via
    * [[TextFns.hash60]] content fingerprints.
    *
    * @return (id, status ∈ added|removed|changed|unchanged, old_fp,
    *         new_fp) — one row per id in either snapshot; fingerprints
    *         are NULL on the side the id is absent from.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           id: Column, payload: Column): DataFrame =
    diffStored(oldDf.select(id.as("id"), TextFns.hash60(payload).as("fp")),
      newDf, id, TextFns.hash60(payload))

  /** Diff a new snapshot against a PERSISTED fingerprint table — the
    * store-driven variant behind incremental derived-data maintenance
    * ([[Multimodal.incrementalPhash]]): the previous snapshot's
    * payloads are never re-read, only its ~16-byte/row (id, fp) store.
    * `prevFps` must carry columns (id, fp); `newFp` is the fingerprint
    * expression evaluated over the new snapshot (byte-level — e.g.
    * `xxhash64(payload)` for binary media; it must match how the store
    * was built). Output schema matches [[diff]].
    */
  def diffStored(prevFps: DataFrame, newDf: DataFrame,
                 id: Column, newFp: Column): DataFrame = {
    val o = prevFps.select(col("id"), col("fp").as("old_fp"))
    val n = newDf.select(id.as("id"), newFp.as("new_fp"))
    o.join(n, Seq("id"), "full_outer")
      .select(
        col("id"),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** Only the rows that need downstream action (status ≠ unchanged). */
  def changes(oldDf: DataFrame, newDf: DataFrame,
              id: Column, payload: Column): DataFrame =
    diff(oldDf, newDf, id, payload).filter(col("status") =!= "unchanged")
}
