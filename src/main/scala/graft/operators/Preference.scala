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

  /** Default stop-shingle document-frequency cap for the preference
    * audits. Unlike eval decontamination (tiny test side), BOTH sides
    * of [[crossRoleLeakage]] span the whole preference table, so the
    * inverted-index join volume is Σ df_chosen(s)·df_rejected(s) —
    * an uncapped ubiquitous shingle contributes quadratic candidate
    * rows and near-zero identification evidence. Identification
    * evidence concentrates in RARE shingles (the published
    * decontamination discipline): text repeated across ≳30 responses
    * is template boilerplate whose label conflicts are exact-dup
    * clustering's job (the q21/q53 family), not a quadratic pair
    * listing's. Dropped shingles are observable via
    * `contamination_df_<n>` (count + dropped).
    */
  val DefaultMaxDf: Int = 30

  /** Cross-role near-dup leakage: every (chosen leg, rejected leg)
    * pair of DIFFERENT preference pairs sharing at least `minShared`
    * distinct w-shingles — i.e. a rejected response that near-matches
    * a chosen response elsewhere in the table. A direct
    * [[Dedup.contaminationPairs]] bipartite join with the chosen legs
    * as "train" and the rejected legs as "test"; the same-pair
    * diagonal (chosen vs its own rejected — expected to overlap) is
    * excluded. Chosen-side shingles in more than `maxDf` responses
    * are dropped BY DEFAULT ([[DefaultMaxDf]]) — the candidate-volume
    * bound every broadcast/bucketed family here carries; pass
    * `maxDf = Int.MaxValue` for the exact unbounded audit.
    *
    * @return (chosen_pair, rejected_pair, n_shared)
    */
  def crossRoleLeakage(pairs: DataFrame, pairId: Column, chosenText: Column,
                       rejectedText: Column, w: Int = 3,
                       minShared: Int = 3,
                       maxDf: Int = DefaultMaxDf): DataFrame =
    Dedup.contaminationPairs(
        pairs.select(pairId.as("pid"), chosenText.as("t")), col("pid"), col("t"),
        pairs.select(pairId.as("pid"), rejectedText.as("t")), col("pid"), col("t"),
        w, minShared, maxDf)
      .filter(col("train_id") =!= col("test_id"))
      .select(col("train_id").as("chosen_pair"),
        col("test_id").as("rejected_pair"), col("n_shared"))

  /** PAIR-level eval-set contamination: a preference pair is
    * contaminated when EITHER leg shares at least `minShared` distinct
    * w-shingles with any eval document. Both legs enter ONE
    * [[Dedup.contaminationPairs]] probe (leg id = 2·pair_id + role, so
    * one inverted-index join serves both roles), then leg hits roll up
    * to the pair frame. Pair ids are cast to long BEFORE the ×2 leg
    * encoding (an int id ≥ 2³⁰ must not overflow) and NULL/NEGATIVE
    * pair ids are EXCLUDED EXPLICITLY — a negative id would silently
    * mis-decode through the truncating `div 2` / `% 2` roll-up, so the
    * exclusion is part of the operator contract, same discipline as
    * [[Privacy.rrRelease]]'s null exclusion. Leg-side shingles in more
    * than `maxDf` legs are dropped by default ([[DefaultMaxDf]]).
    *
    * @return (pair_id, n_eval_docs, n_legs_hit, max_shared) for every
    *         contaminated pair — n_eval_docs counts distinct eval
    *         documents hit by either leg, n_legs_hit ∈ {1, 2}
    */
  def pairContamination(pairs: DataFrame, pairId: Column, chosenText: Column,
                        rejectedText: Column, evalDocs: DataFrame,
                        evalId: Column, evalText: Column, w: Int = 3,
                        minShared: Int = 3,
                        maxDf: Int = DefaultMaxDf): DataFrame = {
    val pid = pairId.cast("long")
    val valid = pairs.filter(pid.isNotNull && pid >= 0)
    val legs = valid.select((pid * 2).as("leg_id"), chosenText.as("t"))
      .unionByName(valid.select((pid * 2 + 1).as("leg_id"),
        rejectedText.as("t")))
    Dedup.contaminationPairs(legs, col("leg_id"), col("t"),
        evalDocs, evalId, evalText, w, minShared, maxDf)
      .groupBy(expr("train_id div 2").as("pair_id"))
      .agg(countDistinct(col("test_id")).as("n_eval_docs"),
        countDistinct(col("train_id") % 2).as("n_legs_hit"),
        max(col("n_shared")).as("max_shared"))
  }

  /** Inter-annotator AGREEMENT — exact-rational Cohen's κ per group,
    * the label-quality gate a preference pipeline runs before trusting
    * a source's labels: κ = (p_o − p_e)/(1 − p_e) with p_o the observed
    * agreement rate and p_e the chance-agreement rate from the two
    * annotators' label marginals. ALL INTEGER CROSS-MULTIPLIES (the
    * q303 num/den discipline — a float κ's low bits depend on the
    * aggregation order): with n pairs, a agreements, and per-label
    * marginals m1ₖ/m2ₖ,
    *
    *   kappa_num = n·a − Σₖ m1ₖ·m2ₖ,  kappa_den = n² − Σₖ m1ₖ·m2ₖ
    *
    * released as the exact rational; callers divide off the release
    * path. kappa_den = 0 iff both annotators are constant with the
    * same label (p_e = 1) — the 0/0 indeterminate is released verbatim
    * as (0, 0), the [[Retrieval.rankChurn]] degenerate-release
    * convention. κ < 0 (systematic disagreement) falls out naturally.
    *
    * NON-NULL CONTRACT: rows with a null label on either side are
    * EXCLUDED EXPLICITLY (they are unratable, not disagreements).
    *
    * OVERFLOW CONTRACT: n² (and pe_cross ≤ n²) must stay exact int64,
    * so a group with more than ⌊√Long.MaxValue⌋ ≈ 3.03·10⁹ rated pairs
    * FAILS LOUDLY (in-plan `raise_error`, the [[Layout.upsert]] guard
    * idiom) instead of wrapping into a garbage rational — at that size
    * the audit should sample or shard the group upstream anyway.
    *
    * Shape at 100 TB: two label-marginal hash aggregates + one
    * agreement aggregate + a label-key equi-join of two
    * |labels|-bounded frames per group. Nothing collects.
    *
    * @return (grp, n_pairs, n_agree, pe_cross, kappa_num, kappa_den)
    *         with pe_cross = Σₖ m1ₖ·m2ₖ
    */
  def annotatorAgreement(pairs: DataFrame, group: Column, rater1: Column,
                         rater2: Column): DataFrame =
    annotatorAgreementCapped(pairs, group, rater1, rater2, 3037000499L)

  /** [[annotatorAgreement]] with the overflow cap injectable — the cap
    * is ⌊√Long.MaxValue⌋ in production; the spec lowers it to drive
    * the guard without 3·10⁹ rows. */
  private[operators] def annotatorAgreementCapped(
      pairs: DataFrame, group: Column, rater1: Column,
      rater2: Column, maxPairs: Long): DataFrame = {
    val rated = pairs
      .filter(rater1.isNotNull && rater2.isNotNull)
      .select(group.as("grp"), rater1.cast("string").as("r1"),
        rater2.cast("string").as("r2"))
      .localCheckpoint(false) // three aggregate consumers of one slice
    val agree = rated.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("r1") === col("r2")).cast("long")).as("n_agree"))
    val m1 = rated.groupBy(col("grp"), col("r1").as("lbl"))
      .agg(count(lit(1)).as("m1"))
    val m2 = rated.groupBy(col("grp"), col("r2").as("lbl"))
      .agg(count(lit(1)).as("m2"))
    // explicit broadcasts: every post-aggregate frame here is
    // |groups|·|labels|-bounded (report-sized at any corpus scale), but
    // the checkpointed slice hides stats from the planner — without the
    // hint these fall to SortMergeJoin with two pointless exchanges
    val pe = m1.join(broadcast(m2), Seq("grp", "lbl")) // absent label ⇒ 0 product
      .groupBy(col("grp"))
      .agg(sum(col("m1") * col("m2")).as("pe_cross"))
    // left + coalesce: a group whose raters share NO label has an empty
    // cross join — pe_cross 0, not a dropped group
    agree.join(broadcast(pe), Seq("grp"), "left")
      .withColumn("pe_cross", coalesce(col("pe_cross"), lit(0L)))
      .withColumn("n_pairs",
        when(col("n_pairs") > maxPairs, raise_error(concat(
          lit("annotatorAgreement: group "), col("grp").cast("string"),
          lit(s" exceeds $maxPairs rated pairs — the exact int64 kappa" +
            " accounting would overflow; sample or shard the group upstream"))))
          .otherwise(col("n_pairs")))
      .select(col("grp"), col("n_pairs"), col("n_agree"), col("pe_cross"),
        (col("n_pairs") * col("n_agree") - col("pe_cross")).as("kappa_num"),
        (col("n_pairs") * col("n_pairs") - col("pe_cross")).as("kappa_den"))
  }

  /** Per-source VERBOSITY-BIAS audit: the fraction of pairs (exact
    * ppm, truncating integer division — no float on the release path)
    * where the preferred response is strictly longer than the
    * rejected one, against the global rate. A source whose labels are
    * dominated by length is flagged by its signed deviation; the
    * audit output is a per-source report row, tiny at any corpus
    * scale (one hash aggregate + a broadcast 1-row global).
    *
    * NON-NULL CONTRACT: pairs with a NULL length on EITHER side are
    * EXCLUDED EXPLICITLY (from n_pairs and the global both) — counting
    * them while the null comparison makes them never "longer" would
    * silently deflate longer_ppm; same rationale as
    * [[Privacy.rrRelease]]/[[Privacy.dgeoSumRelease]].
    *
    * @param chosenLen   preferred-response length (chars or tokens —
    *                    caller's metric, compared as int64)
    * @return (source, n_pairs, longer_ppm, global_ppm, skew_ppm) with
    *         skew_ppm = longer_ppm − global_ppm (signed)
    */
  def lengthSkewAudit(pairs: DataFrame, source: Column, chosenLen: Column,
                      rejectedLen: Column): DataFrame = {
    val per = pairs
      .filter(chosenLen.isNotNull && rejectedLen.isNotNull)
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
