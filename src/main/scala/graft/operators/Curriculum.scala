package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curriculum construction — ordering a scored corpus for training
  * (Bengio et al. 2009's curriculum learning, as applied to LLM data:
  * schedule by difficulty/quality tiers rather than feeding the raw
  * shuffle). The standard shape: rank by score, cut into k equal
  * tiers, then INTERLEAVE the tiers round-robin so every training
  * window sees the full difficulty spectrum while the within-tier
  * order still follows the score — "stratified curriculum", the
  * practical compromise between strict easy-to-hard (catastrophic
  * distribution shift at tier boundaries) and no curriculum at all.
  *
  * Everything is integer arithmetic on ranks: tier = ⌊x·k/N⌋ and
  * pos-in-tier = x − ⌈tier·N/k⌉ (x = 0-based score rank), so the
  * assignment replays exactly in any engine and is total for any N,
  * not just multiples of k.
  *
  * Shape at 100 TB: BOTH global orderings run through
  * [[Packing.globalRowNumber]]'s two-phase prefix sum (range buckets +
  * per-bucket window + tiny offset broadcast) — the corpus never
  * crosses a single-reducer global window. The corpus count N enters
  * as a 1-row broadcast. Writing the result range-clustered on
  * `curriculum_pos` ([[Layout.writeClustered]]) materializes the
  * schedule for sequential training reads — same discipline as
  * [[Sampling.deterministicShuffle]].
  */
object Curriculum {

  /** Assign every row a tier (0 = best score) and its interleaved
    * curriculum position.
    *
    * @param score higher = earlier tier (order ties broken by `id`)
    * @return (id, score, tier, curriculum_pos) — curriculum_pos is a
    *         1-based total order: round-robin across tiers, cycling
    *         best-remaining from each tier in tier order.
    */
  def tieredInterleave(df: DataFrame, id: Column, score: Column,
                       tiers: Int, numRanges: Int = 32): DataFrame = {
    require(tiers >= 1, s"tiers must be >= 1, got $tiers")
    val scored = df.select(id.as("id"), score.as("score"))
    val n = scored.agg(count(lit(1)).as("__cu_n"))
    val ranked = Packing.globalRowNumber(
        scored.withColumn("__cu_neg", -col("score")),
        struct(col("__cu_neg"), col("id")), posName = "__cu_rk",
        numRanges = numRanges)
      .crossJoin(broadcast(n))
      .withColumn("__cu_x", col("__cu_rk") - 1L)
      .withColumn("tier", expr(s"(__cu_x * $tiers) div __cu_n"))
      .withColumn("__cu_pos",
        expr(s"__cu_x - (tier * __cu_n + $tiers - 1) div $tiers"))
    Packing.globalRowNumber(
        ranked.select(col("id"), col("score"), col("tier"), col("__cu_pos")),
        struct(col("__cu_pos"), col("tier")), posName = "curriculum_pos",
        numRanges = numRanges)
      .select(col("id"), col("score"), col("tier"), col("curriculum_pos"))
  }
}
