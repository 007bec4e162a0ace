package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the training-data EXPORT step: a pretraining run
  * consumes documents as one concatenated token stream cut into
  * fixed-`budget` sequences, so each document occupies a global token
  * span `[start_off, end_off)` and lands in training sequences
  * `floor(start_off/budget) .. floor((end_off-1)/budget)` (concat-and-
  * chunk packing; a doc whose span crosses a cut is `split` across two
  * sequences).
  *
  * The whole computation is a global running sum over the corpus in a
  * caller-defined deterministic order — the textbook place a naive
  * `Window.orderBy(id)` silently collapses 100 TB into ONE reducer
  * (Spark plans an un-partitioned window as a single partition). This
  * implementation is the scalable two-phase prefix sum instead:
  *
  *  1. bucket rows by a coarse ORDER-ALIGNED key (caller-supplied
  *     `bucketExpr` monotone in the order key, e.g. `id / 1000`; or
  *     derived here by range-repartitioning on the key and reading
  *     `spark_partition_id()` — range partitions are order-aligned by
  *     construction);
  *  2. local cumulative sums inside each bucket in parallel
  *     (`Window.partitionBy(bucket)` — key-partitioned, never global);
  *  3. per-bucket totals (one tiny row per bucket) get their own
  *     prefix sum — a global window over BUCKET-COUNT rows, not corpus
  *     rows — and broadcast-join back as each bucket's starting offset.
  *
  * Shuffle ledger: one hash shuffle of the corpus on the bucket key
  * (plus the range-repartition pass when no `bucketExpr` is given), one
  * broadcast of the bucket-offset table. Nothing global touches more
  * rows than there are buckets.
  */
object Packing {

  /** Per-document packing offsets and sequence assignment.
    *
    * @param df         corpus
    * @param id         unique order key — packing order is `id` ascending
    * @param tok        per-document token count (any non-negative numeric)
    * @param budget     tokens per training sequence (> 0)
    * @param bucketExpr coarse bucketing expression, MONOTONE in `id`
    *                   (same `id` order across buckets ⇒ same packing as
    *                   a single global scan). None → derive buckets by
    *                   range-repartitioning on `id` into `numRanges`.
    * @param numRanges  bucket count when deriving (≈ cluster cores)
    * @return one row per doc: `pack_id, n_tok, start_off, end_off,
    *         first_seq, last_seq, split`
    */
  def packOffsets(df: DataFrame, id: Column, tok: Column, budget: Long,
                  bucketExpr: Option[Column] = None,
                  numRanges: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // bucketExpr resolves against the CALLER's frame (it usually
    // references the same column as `id`), so project it in the same
    // select as the rename.
    val bucketed = bucketExpr match {
      case Some(b) =>
        df.select(id.as("pack_id"), tok.cast("long").as("n_tok"), b.cast("long").as("bucket"))
      case None =>
        // Range partitions are disjoint and ordered, so the physical
        // partition index IS an order-aligned bucket id.
        df.select(id.as("pack_id"), tok.cast("long").as("n_tok"))
          .repartitionByRange(numRanges, col("pack_id"))
          .withColumn("bucket", spark_partition_id().cast("long"))
    }

    // Phase 2: parallel local prefix sums, one window group per bucket.
    // Materialized ONCE (lazy local checkpoint, the repo's multi-branch
    // pattern): both the offset aggregate and the final join consume it,
    // and in the derived-bucket path the bucket ids come from a sampled
    // range partitioning — two independent evaluations could, in
    // principle, draw different boundaries and mis-join the offsets.
    val localW = Window.partitionBy(col("bucket")).orderBy(col("pack_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("local_end", sum(col("n_tok")).over(localW))
      .localCheckpoint(false)

    // Phase 3: bucket offsets — a prefix sum over bucket-count rows.
    val offW = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("bucket"))
      .agg(sum(col("n_tok")).as("bucket_tok"))
      .withColumn("bucket_off", coalesce(sum(col("bucket_tok")).over(offW), lit(0L)))
      .select(col("bucket"), col("bucket_off"))

    local.join(broadcast(offsets), "bucket")
      .withColumn("end_off", col("local_end") + col("bucket_off"))
      .withColumn("start_off", col("end_off") - col("n_tok"))
      // a zero-token doc occupies no slot: anchor it at position
      // start-1 (clamped at 0), so one sitting exactly ON a cut —
      // including at the corpus end — attaches to the PRECEDING
      // sequence instead of fabricating a phantom empty one past it
      .withColumn("__anchor", when(col("n_tok") === 0,
        greatest(col("start_off") - 1, lit(0L))).otherwise(col("start_off")))
      .withColumn("first_seq", floor(col("__anchor") / budget))
      .withColumn("last_seq",
        greatest(col("first_seq"), floor((col("end_off") - 1) / budget)))
      .withColumn("split", col("last_seq") =!= col("first_seq"))
      .select("pack_id", "n_tok", "start_off", "end_off",
        "first_seq", "last_seq", "split")
  }

  /** Global 1-based row number in `order`-ascending, carried alongside
    * ALL of `df`'s columns — "zipWithIndex at scale", the primitive
    * behind deterministic corpus shuffling (order by a seeded content
    * hash, then number), stable example ids, and resumable export
    * manifests. A direct `row_number() OVER (ORDER BY …)` is a
    * single-reducer global window; this is the same two-phase prefix
    * sum as [[packOffsets]] with every row weighing 1, so the rank IS
    * the running count. `order` must be totally ordering (unique —
    * e.g. a (hash, id) struct to break hash ties).
    */
  def globalRowNumber(df: DataFrame, order: Column, posName: String = "pos",
                      bucketExpr: Option[Column] = None,
                      numRanges: Int = 32): DataFrame = {
    val reserved = df.columns.filter(_.startsWith("__gr_"))
    require(reserved.isEmpty,
      s"input frame already has reserved __gr_* working columns (${reserved.mkString(", ")}) — rename them first")
    // withColumn would silently OVERWRITE an existing column of the
    // same name (e.g. an input that already carries `pos`)
    require(!df.columns.contains(posName),
      s"input frame already has a column named '$posName' — pass a different posName")
    val tagged = bucketExpr match {
      case Some(b) =>
        df.withColumn("__gr_ord", order).withColumn("__gr_bucket", b.cast("long"))
      case None =>
        df.withColumn("__gr_ord", order)
          .repartitionByRange(numRanges, col("__gr_ord"))
          .withColumn("__gr_bucket", spark_partition_id().cast("long"))
    }
    val localW = Window.partitionBy(col("__gr_bucket")).orderBy(col("__gr_ord"))
    // materialized once: the offset aggregate and the join both consume
    // it, and the derived buckets come from a sampled range partitioning
    // (same single-evaluation reasoning as packOffsets)
    val local = tagged.withColumn("__gr_local", row_number().over(localW).cast("long"))
      .localCheckpoint(false)
    val offW = Window.orderBy(col("__gr_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__gr_bucket"))
      .agg(count(lit(1)).as("__gr_n"))
      .withColumn("__gr_off", coalesce(sum(col("__gr_n")).over(offW), lit(0L)))
      .select(col("__gr_bucket"), col("__gr_off"))
    local.join(broadcast(offsets), "__gr_bucket")
      .withColumn(posName, col("__gr_local") + col("__gr_off"))
      .drop("__gr_bucket", "__gr_ord", "__gr_local")
  }

  /** PER-STRATUM 1-based row number in `order`-ascending — the
    * stratum-keyed member of the prefix-sum family, and the scale-safe
    * replacement for `row_number() OVER (PARTITION BY stratum ORDER BY
    * …)`: the naive window serializes EVERY row of a stratum into one
    * task, so a language- or source-sized hot stratum at 100 TB becomes
    * a single-partition sort of terabytes. Here the corpus is
    * range-partitioned on the COMPOSITE (stratum, order) key — a hot
    * stratum spans as many order-aligned buckets as its mass demands —
    * each bucket numbers its (stratum-contiguous) slice in parallel,
    * and per-(bucket, stratum) counts get the offset prefix sum on a
    * table of ≤ #strata + numRanges − 1 rows (buckets are contiguous
    * ranges of the composite key, so each extra bucket adds at most one
    * straddling stratum) which broadcasts back. Identical output to the
    * naive window for a unique (stratum, `order`) key; skew-immune by
    * construction.
    *
    * `order` must be unique WITHIN a stratum (e.g. a (hash, id) struct)
    * — duplicate composite keys may straddle a range boundary and split
    * nondeterministically. NULL strata are numbered like any other
    * group (the offset join-back is null-safe).
    */
  def stratumRowNumber(df: DataFrame, stratum: Column, order: Column,
                       posName: String = "pos",
                       numRanges: Int = 32): DataFrame = {
    val reserved = df.columns.filter(_.startsWith("__sr_"))
    require(reserved.isEmpty,
      s"input frame already has reserved __sr_* working columns (${reserved.mkString(", ")}) — rename them first")
    require(!df.columns.contains(posName),
      s"input frame already has a column named '$posName' — pass a different posName")
    val tagged = df
      .withColumn("__sr_st", stratum).withColumn("__sr_ord", order)
      .repartitionByRange(numRanges, col("__sr_st"), col("__sr_ord"))
      .withColumn("__sr_bucket", spark_partition_id().cast("long"))
    val localW = Window.partitionBy(col("__sr_bucket"), col("__sr_st"))
      .orderBy(col("__sr_ord"))
    // materialized once: the offset aggregate and the join both consume
    // it (same single-evaluation reasoning as globalRowNumber)
    val local = tagged
      .withColumn("__sr_local", row_number().over(localW).cast("long"))
      .localCheckpoint(false)
    val offW = Window.partitionBy(col("__sr_st2")).orderBy(col("__sr_b2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__sr_bucket").as("__sr_b2"),
        col("__sr_st").as("__sr_st2"))
      .agg(count(lit(1)).as("__sr_n"))
      .withColumn("__sr_off", coalesce(sum(col("__sr_n")).over(offW), lit(0L)))
      .select(col("__sr_b2"), col("__sr_st2"), col("__sr_off"))
    local.join(broadcast(offsets),
        col("__sr_bucket") === col("__sr_b2")
          && col("__sr_st") <=> col("__sr_st2"))
      .withColumn(posName, col("__sr_local") + col("__sr_off"))
      .drop("__sr_st", "__sr_ord", "__sr_bucket", "__sr_local",
        "__sr_b2", "__sr_st2", "__sr_off")
  }

  /** Generic scalable running total: every row gets the inclusive sum of
    * `value` over all rows at-or-before it in `order`-ascending, carried
    * alongside ALL of `df`'s columns — the third member of the prefix-sum
    * family ([[packOffsets]] sums token counts into spans,
    * [[globalRowNumber]] is this with every row weighing 1). Same
    * two-phase shape: order-aligned buckets → parallel per-bucket window
    * sums → a bucket-count-sized offset table broadcast back. Never a
    * single-reducer global window.
    *
    * `order` must be totally ordering (unique) for a deterministic
    * result; `value` is cast to long. A caller-supplied `bucketExpr`
    * must evaluate NON-NULL on every row (like [[packOffsets]]'s and
    * [[globalRowNumber]]'s): a null bucket cannot be placed in the
    * bucket order, and the equi-join back would drop the row.
    */
  def runningTotal(df: DataFrame, order: Column, value: Column,
                   totalName: String = "running_total",
                   bucketExpr: Option[Column] = None,
                   numRanges: Int = 32): DataFrame = {
    val reserved = df.columns.filter(_.startsWith("__rt_"))
    require(reserved.isEmpty,
      s"input frame already has reserved __rt_* working columns (${reserved.mkString(", ")}) — rename them first")
    require(!df.columns.contains(totalName),
      s"input frame already has a column named '$totalName' — pass a different totalName")
    val tagged = bucketExpr match {
      case Some(b) =>
        df.withColumn("__rt_ord", order).withColumn("__rt_val", value.cast("long"))
          .withColumn("__rt_bucket", b.cast("long"))
      case None =>
        df.withColumn("__rt_ord", order).withColumn("__rt_val", value.cast("long"))
          .repartitionByRange(numRanges, col("__rt_ord"))
          .withColumn("__rt_bucket", spark_partition_id().cast("long"))
    }
    val localW = Window.partitionBy(col("__rt_bucket")).orderBy(col("__rt_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // materialized once: the offset aggregate and the join both consume
    // it, and the derived buckets come from a sampled range partitioning
    // (same single-evaluation reasoning as packOffsets)
    val local = tagged.withColumn("__rt_local", sum(col("__rt_val")).over(localW))
      .localCheckpoint(false)
    val offW = Window.orderBy(col("__rt_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__rt_bucket"))
      .agg(sum(col("__rt_val")).as("__rt_n"))
      .withColumn("__rt_off", coalesce(sum(col("__rt_n")).over(offW), lit(0L)))
      .select(col("__rt_bucket"), col("__rt_off"))
    local.join(broadcast(offsets), "__rt_bucket")
      .withColumn(totalName, col("__rt_local") + col("__rt_off"))
      .drop("__rt_bucket", "__rt_ord", "__rt_val", "__rt_local")
  }

  /** The naive single-reducer formulation (global `Window.orderBy`) —
    * kept PRIVATE as the spec's cross-check oracle for [[packOffsets]];
    * never the production path. */
  private[operators] def packOffsetsGlobal(df: DataFrame, id: Column, tok: Column,
                                           budget: Long): DataFrame = {
    val w = Window.orderBy(col("pack_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(id.as("pack_id"), tok.cast("long").as("n_tok"))
      .withColumn("end_off", sum(col("n_tok")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tok"))
      .withColumn("__anchor", when(col("n_tok") === 0,
        greatest(col("start_off") - 1, lit(0L))).otherwise(col("start_off")))
      .withColumn("first_seq", floor(col("__anchor") / budget))
      .withColumn("last_seq",
        greatest(col("first_seq"), floor((col("end_off") - 1) / budget)))
      .withColumn("split", col("last_seq") =!= col("first_seq"))
      .select("pack_id", "n_tok", "start_off", "end_off",
        "first_seq", "last_seq", "split")
  }

  /** Per-sequence packing manifest: for each training sequence, the docs
    * that contribute to it (in order), how many are boundary-split, and
    * its filled token count — the writer-side view a packer materializes
    * before emitting fixed-length examples. One explode (docs appear in
    * at most `1 + n_tok/budget` sequences) + one agg on `seq`.
    */
  def packManifest(offsets: DataFrame, budget: Long): DataFrame = {
    val withSeqs = offsets.withColumn("seq",
      explode(sequence(col("first_seq"), col("last_seq"))))
    withSeqs
      .withColumn("tok_in_seq",
        least(col("end_off"), (col("seq") + 1) * budget) -
          greatest(col("start_off"), col("seq") * budget))
      .groupBy(col("seq"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("split"), 1L).otherwise(0L)).as("n_split_docs"),
        sum(col("tok_in_seq")).as("n_tok"),
        min(col("pack_id")).as("first_doc"),
        max(col("pack_id")).as("last_doc"))
  }
}
