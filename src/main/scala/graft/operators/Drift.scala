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

  private val vocabMetricSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Label of the coarsened tail cell. Contains a space, which a
    * `split(text, " ")` token can never contain BY CONSTRUCTION — so it
    * cannot collide with any genuine corpus token. (The previous
    * sentinel "\u0001other" relied on 0x01 not appearing in documents;
    * binary junk in an adversarial corpus could forge it. ADVICE r9.) */
  val TailCell = " tail"

  /** Per-group token total and fixed-point KL from the corpus.
    *
    * `maxVocab` bounds the broadcast corpus-term table BY CONSTRUCTION
    * (the contaminationPairs cap discipline, VERDICT r8 #7): when the
    * distinct-term count exceeds it, the tail below the top `maxVocab`
    * terms (by corpus count desc, term — a deterministic cut) is
    * COARSENED into one `TailCell` pseudo-term before any
    * distribution is formed, so both p_g and p_C are measured on the
    * same (maxVocab+1)-cell partition of the vocabulary and kl_fp is
    * the exact KL of the coarsened distributions (a data-processing
    * lower bound of the unbounded KL). Below the cap the answer is
    * IDENTICAL — no term moves, nothing renormalizes (spec-pinned);
    * the cut is observable via the `drift_vocab_<n>` observe metrics.
    *
    * @return (group, n_tokens, kl_fp) — kl_fp ≈ 1024·KL(group‖corpus).
    */
  def unigramKl(df: DataFrame, group: Column, text: Column,
                maxVocab: Int = Int.MaxValue): DataFrame = {
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    val gtRaw = df
      .select(group.as("grp"), explode(TextFns.tokens(text)).as("term"))
      .groupBy(col("grp"), col("term"))
      .agg(count(lit(1)).as("cgt"))
      // feeds the corpus rollups AND the scoring join — one scan
      .localCheckpoint(false)
    val gt =
      if (maxVocab == Int.MaxValue) gtRaw
      else {
        // top-maxVocab terms by (corpus count desc, term): a distributed
        // TakeOrdered — result bounded by the cap, never by the corpus
        val kept = gtRaw.groupBy(col("term")).agg(sum(col("cgt")).as("__ct"))
          .observe(s"drift_vocab_${vocabMetricSeq.incrementAndGet()}",
            count(lit(1)).as("n_terms"))
          .orderBy(col("__ct").desc, col("term"))
          .limit(maxVocab)
          .select(col("term"), lit(1).as("__keep"))
        gtRaw.join(broadcast(kept), Seq("term"), "left")
          .withColumn("term",
            when(col("__keep").isNotNull, col("term")).otherwise(lit(TailCell)))
          .groupBy(col("grp"), col("term"))
          .agg(sum(col("cgt")).as("cgt"))
      }
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
        // approximation can push a near-zero sum negative, where plain
        // truncation differs from floor — subtract the positive
        // remainder first, then divide with INTEGER `div` (exact past
        // 2^53, where `/`-then-cast is double division; ADVICE r8)
        call_function("div",
          col("sum_fp") -
            ((col("sum_fp") % col("n_tokens")) + col("n_tokens")) % col("n_tokens"),
          col("n_tokens")).as("kl_fp"))
  }
}
