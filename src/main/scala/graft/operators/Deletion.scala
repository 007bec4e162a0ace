package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deletion propagation — the compliance counterpart of `Layout.upsert`:
  * given a tombstone list of ids (a GDPR erasure request, a takedown
  * batch), purge the base table AND every DERIVED artifact keyed by the
  * id, and produce an auditable accounting with an in-result proof that
  * no tombstoned row survived anywhere.
  *
  * Scale shape: deletion lists are small by nature, so every leg is a
  * BROADCAST anti/semi join — the artifacts are never shuffled, each is
  * scanned once for its audit aggregate and once for its cleaned
  * output. Duplicate tombstone ids are collapsed up front so audit
  * counts cannot double-count.
  */
object Deletion {

  private def tombIds(tombstones: DataFrame, tombId: Column): DataFrame =
    tombstones.select(tombId.as("__t")).distinct()

  /** The artifact without its tombstoned rows (broadcast anti-join). */
  def purge(df: DataFrame, id: Column, tombstones: DataFrame, tombId: Column): DataFrame =
    df.join(broadcast(tombIds(tombstones, tombId)), id === col("__t"), "left_anti")

  /** One audit row per artifact: `artifact, n_before, n_purged,
    * n_after, survivors` — `survivors` is COMPUTED by re-probing the
    * purged artifact against the tombstones (a non-zero value means
    * the propagation failed; the oracle pins it to 0).
    */
  def propagateAudit(artifacts: Seq[(String, DataFrame, Column)],
                     tombstones: DataFrame, tombId: Column): DataFrame = {
    require(artifacts.nonEmpty, "need at least one artifact to audit")
    val tombs = tombIds(tombstones, tombId)
    artifacts.map { case (name, df, id) =>
      val hit = df.join(
        broadcast(tombs.withColumn("__hit", lit(1L))), id === col("__t"), "left")
      val counted = hit.agg(
        count(lit(1)).as("n_before"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_purged"))
      val survivors = purge(df, id, tombstones, tombId)
        .join(broadcast(tombs), id === col("__t"), "left_semi")
        .agg(count(lit(1)).as("survivors"))
      counted.crossJoin(survivors)
        .select(lit(name).as("artifact"), col("n_before"), col("n_purged"),
          (col("n_before") - col("n_purged")).as("n_after"), col("survivors"))
    }.reduce(_ unionByName _)
  }
}
