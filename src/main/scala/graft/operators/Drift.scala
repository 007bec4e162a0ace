package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Distribution-drift audit: per-group KL divergence of the unigram
  * distribution from the whole-corpus distribution — the "is this
  * source / crawl / shard statistically unlike the rest?" check run
  * before mixing a new slice into training data (high KL → vocabulary
  * shift, templating, or junk).
  *
  * KL(p_g ‖ p_C) = Σ_t p_g(t)·log2(p_g(t)/p_C(t)) is computed entirely
  * in the integer fixed-point log2 idiom (the q115/q129 `widf`
  * discipline, 10-bit mantissa): with c_gt the group term count, N_g
  * the group total, c_t the corpus term count, N the corpus total,
  *
  *   kl_fp(g) = ( Σ_t c_gt·(L(c_gt) + L(N) − L(N_g) − L(c_t)) ) div N_g
  *
  * where `L(x) = e·1024 + (x·1024 div 2^e) − 1024`, `e = ilog2(x)` —
  * ≈1024·KL, deterministic across engines and partitionings (each log
  * factor is taken separately so no product ever overflows: L's
  * argument stays a raw count ≤ N, good to ~8·10^15 tokens).
  *
  * Shape at 100 TB: one (group, term) count shuffle; the corpus term
  * table is vocabulary-sized and BROADCASTS back, as do the per-group
  * totals (one row per group — a drift report's group count is small
  * by construction) and the single-row corpus total; one final
  * map-side-combined per-group sum. Nothing is all-pairs.
  */
object Drift {

  /** Fixed-point log2 with 10-bit linear-interpolated mantissa over a
    * positive integer column (shiftright = floor-div by 2^e, exact for
    * the positive counts this takes). */
  private def lfp(x: Column): Column = {
    val e = (length(bin(x)) - 1).cast("int")
    e.cast("long") * 1024 + call_function("shiftright", x * 1024, e) - 1024
  }

  /** Per-group token total and fixed-point KL from the corpus.
    * @return (group, n_tokens, kl_fp) — kl_fp ≈ 1024·KL(group‖corpus).
    */
  def unigramKl(df: DataFrame, group: Column, text: Column): DataFrame = {
    val gt = df
      .select(group.as("grp"), explode(TextFns.tokens(text)).as("term"))
      .groupBy(col("grp"), col("term"))
      .agg(count(lit(1)).as("cgt"))
      // feeds the corpus rollups AND the scoring join — one scan
      .localCheckpoint(false)
    val ct = gt.groupBy(col("term")).agg(sum(col("cgt")).as("ct"))
    val ng = gt.groupBy(col("grp")).agg(sum(col("cgt")).as("ng"))
    val n = ct.agg(sum(col("ct")).as("n"))

    gt.join(broadcast(ct), "term")
      .join(broadcast(ng), "grp")
      .crossJoin(broadcast(n))
      .withColumn("term_fp",
        col("cgt") * (lfp(col("cgt")) + lfp(col("n")) - lfp(col("ng")) - lfp(col("ct"))))
      .groupBy(col("grp"))
      .agg(max(col("ng")).as("n_tokens"), sum(col("term_fp")).as("sum_fp"))
      .select(col("grp"), col("n_tokens"),
        // explicit floor division (the q130 discipline): the mantissa
        // approximation can push a near-zero sum negative, where
        // Spark's `div` truncates but floor is the portable semantic
        ((col("sum_fp") - ((col("sum_fp") % col("n_tokens")) + col("n_tokens")) % col("n_tokens"))
          / col("n_tokens")).cast("long").as("kl_fp"))
  }
}
