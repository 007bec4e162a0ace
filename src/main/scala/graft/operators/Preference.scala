package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alignment (RLHF preference-pair) data hygiene — the audits a
  * pipeline runs over a `(pair_id, source, chosen, rejected)` table
  * before preference training. Pretraining-corpus hygiene (the q21+
  * dedup/contamination families) treats documents independently; a
  * preference table adds PAIR STRUCTURE, and its failure modes are
  * structural:
  *
  *  - a REJECTED response near-identical to a CHOSEN one elsewhere
  *    teaches the model to both prefer and disprefer the same text
  *    (cross-role label conflict — [[crossRoleLeakage]]);
  *  - a pair whose either side overlaps the EVAL set leaks the
  *    benchmark into the reward signal ([[pairContamination]] — the
  *    pair-level roll-up of [[Dedup.contaminationPairs]]);
  *  - a source whose preference labels correlate with a spurious
  *    feature (the classic verbosity bias: "chosen is just the longer
  *    answer") poisons the reward model ([[lengthSkewAudit]]).
  *
  * All three reuse the shingle/posting machinery of [[Dedup]] — a
  * bipartite inverted-index join, never all-pairs — so the 100 TB
  * shapes are exactly the proven q22/q63 shapes. No new join
  * geometry is introduced here; the module is role/pair bookkeeping
  * around them plus one exact-ppm audit.
  *
  * Reference: kinesis-s3 has no preference-data operator; semantics
  * follow the published RLHF data-hygiene practice (e.g. InstructGPT
  * appendix; verbosity-bias audits in public reward-model literature).
  */
object Preference {

  /** Cross-role near-dup leakage: every (chosen leg, rejected leg)
    * pair of DIFFERENT preference pairs sharing at least `minShared`
    * distinct w-shingles — i.e. a rejected response that near-matches
    * a chosen response elsewhere in the table. A direct
    * [[Dedup.contaminationPairs]] bipartite join with the chosen legs
    * as "train" and the rejected legs as "test"; the same-pair
    * diagonal (chosen vs its own rejected — expected to overlap) is
    * excluded.
    *
    * @return (chosen_pair, rejected_pair, n_shared)
    */
  def crossRoleLeakage(pairs: DataFrame, pairId: Column, chosenText: Column,
                       rejectedText: Column, w: Int = 3,
                       minShared: Int = 3): DataFrame =
    Dedup.contaminationPairs(
        pairs.select(pairId.as("pid"), chosenText.as("t")), col("pid"), col("t"),
        pairs.select(pairId.as("pid"), rejectedText.as("t")), col("pid"), col("t"),
        w, minShared)
      .filter(col("train_id") =!= col("test_id"))
      .select(col("train_id").as("chosen_pair"),
        col("test_id").as("rejected_pair"), col("n_shared"))

  /** PAIR-level eval-set contamination: a preference pair is
    * contaminated when EITHER leg shares at least `minShared` distinct
    * w-shingles with any eval document. Both legs enter ONE
    * [[Dedup.contaminationPairs]] probe (leg id = 2·pair_id + role, so
    * one inverted-index join serves both roles), then leg hits roll up
    * to the pair frame. Pair ids must be non-negative (the leg
    * encoding uses truncating division on decode).
    *
    * @return (pair_id, n_eval_docs, n_legs_hit, max_shared) for every
    *         contaminated pair — n_eval_docs counts distinct eval
    *         documents hit by either leg, n_legs_hit ∈ {1, 2}
    */
  def pairContamination(pairs: DataFrame, pairId: Column, chosenText: Column,
                        rejectedText: Column, evalDocs: DataFrame,
                        evalId: Column, evalText: Column, w: Int = 3,
                        minShared: Int = 3): DataFrame = {
    val legs = pairs.select((pairId * 2).as("leg_id"), chosenText.as("t"))
      .unionByName(pairs.select((pairId * 2 + 1).as("leg_id"),
        rejectedText.as("t")))
    Dedup.contaminationPairs(legs, col("leg_id"), col("t"),
        evalDocs, evalId, evalText, w, minShared)
      .groupBy(expr("train_id div 2").as("pair_id"))
      .agg(countDistinct(col("test_id")).as("n_eval_docs"),
        countDistinct(col("train_id") % 2).as("n_legs_hit"),
        max(col("n_shared")).as("max_shared"))
  }

  /** Per-source VERBOSITY-BIAS audit: the fraction of pairs (exact
    * ppm, truncating integer division — no float on the release path)
    * where the preferred response is strictly longer than the
    * rejected one, against the global rate. A source whose labels are
    * dominated by length is flagged by its signed deviation; the
    * audit output is a per-source report row, tiny at any corpus
    * scale (one hash aggregate + a broadcast 1-row global).
    *
    * @param chosenLen   preferred-response length (chars or tokens —
    *                    caller's metric, compared as int64)
    * @return (source, n_pairs, longer_ppm, global_ppm, skew_ppm) with
    *         skew_ppm = longer_ppm − global_ppm (signed)
    */
  def lengthSkewAudit(pairs: DataFrame, source: Column, chosenLen: Column,
                      rejectedLen: Column): DataFrame = {
    val per = pairs
      .select(source.as("source"),
        (chosenLen.cast("long") > rejectedLen.cast("long"))
          .cast("long").as("longer"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("longer")).as("n_longer"))
    val glob = per.agg(sum(col("n_pairs")).as("g_n"),
      sum(col("n_longer")).as("g_longer"))
    per.crossJoin(broadcast(glob)) // 1-row global — broadcast, never a shuffle
      .select(col("source"), col("n_pairs"),
        expr("(1000000 * n_longer) div n_pairs").as("longer_ppm"),
        expr("(1000000 * g_longer) div g_n").as("global_ppm"),
        (expr("(1000000 * n_longer) div n_pairs") -
          expr("(1000000 * g_longer) div g_n")).as("skew_ppm"))
  }
}
