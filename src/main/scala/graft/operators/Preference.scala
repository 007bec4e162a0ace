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

  /** RECOMMENDED stop-shingle document-frequency cap for the
    * preference audits at corpus scale — NOT the default. Unlike eval
    * decontamination (tiny test side), BOTH sides of
    * [[crossRoleLeakage]] span the whole preference table, so the
    * inverted-index join volume is Σ df_chosen(s)·df_rejected(s) —
    * an uncapped ubiquitous shingle contributes quadratic candidate
    * rows and near-zero identification evidence. Identification
    * evidence concentrates in RARE shingles (the published
    * decontamination discipline): text repeated across ≳30 responses
    * is template boilerplate whose label conflicts are exact-dup
    * clustering's job (the q21/q53 family), not a quadratic pair
    * listing's.
    *
    * The audits DEFAULT TO EXACT (`maxDf = Int.MaxValue`): an audit
    * operator must not silently lose recall — a text duplicated as
    * chosen across 31+ pairs would otherwise become invisible to the
    * default cross-role audit. Scale callers opt into this cap
    * explicitly (the pinned q305/q306 shapes do — it cuts the sf1
    * candidate join 43.6 M → 6.8 M rows); dropped shingles are then
    * observable via `contamination_df_<n>` (count + dropped).
    */
  val ScaleMaxDf: Int = 30

  /** Cross-role near-dup leakage: every (chosen leg, rejected leg)
    * pair of DIFFERENT preference pairs sharing at least `minShared`
    * distinct w-shingles — i.e. a rejected response that near-matches
    * a chosen response elsewhere in the table. A direct
    * [[Dedup.contaminationPairs]] bipartite join with the chosen legs
    * as "train" and the rejected legs as "test"; the same-pair
    * diagonal (chosen vs its own rejected — expected to overlap) is
    * excluded. EXACT by default; pass `maxDf = `[[ScaleMaxDf]] (the
    * pinned corpus-scale shape) to drop chosen-side shingles in more
    * than `maxDf` responses — the candidate-volume bound every
    * broadcast/bucketed family here carries, traded against audit
    * recall as documented on [[ScaleMaxDf]].
    *
    * @return (chosen_pair, rejected_pair, n_shared)
    */
  def crossRoleLeakage(pairs: DataFrame, pairId: Column, chosenText: Column,
                       rejectedText: Column, w: Int = 3,
                       minShared: Int = 3,
                       maxDf: Int = Int.MaxValue): DataFrame =
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
    * [[Privacy.rrRelease]]'s null exclusion. EXACT by default; scale
    * callers pass `maxDf = `[[ScaleMaxDf]] to drop leg-side shingles
    * in more than `maxDf` legs (recall trade documented there).
    *
    * @return (pair_id, n_eval_docs, n_legs_hit, max_shared) for every
    *         contaminated pair — n_eval_docs counts distinct eval
    *         documents hit by either leg, n_legs_hit ∈ {1, 2}
    */
  def pairContamination(pairs: DataFrame, pairId: Column, chosenText: Column,
                        rejectedText: Column, evalDocs: DataFrame,
                        evalId: Column, evalText: Column, w: Int = 3,
                        minShared: Int = 3,
                        maxDf: Int = Int.MaxValue): DataFrame = {
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
    * BOUNDED-LABEL-ALPHABET CONTRACT (`broadcastMarginals`): the
    * marginal frames are |groups|·|labels| rows, and the default
    * explicit broadcast hint assumes a CATEGORICAL label alphabet
    * (the κ use case — agreement over free-text or continuous scores
    * is not κ's statistic). Raters cast to string, so a caller whose
    * rater columns are high-cardinality (free-text rationales,
    * unbinned numeric scores) must pass
    * `broadcastMarginals = false` — the joins then fall to the
    * planner's choice (SortMergeJoin at that cardinality), trading
    * two exchanges for not materializing an unbounded frame on the
    * driver.
    *
    * @return (grp, n_pairs, n_agree, pe_cross, kappa_num, kappa_den)
    *         with pe_cross = Σₖ m1ₖ·m2ₖ
    */
  def annotatorAgreement(pairs: DataFrame, group: Column, rater1: Column,
                         rater2: Column,
                         broadcastMarginals: Boolean = true): DataFrame =
    annotatorAgreementCapped(pairs, group, rater1, rater2, 3037000499L,
      broadcastMarginals)

  /** [[annotatorAgreement]] with the overflow cap injectable — the cap
    * is ⌊√Long.MaxValue⌋ in production; the spec lowers it to drive
    * the guard without 3·10⁹ rows. */
  private[operators] def annotatorAgreementCapped(
      pairs: DataFrame, group: Column, rater1: Column,
      rater2: Column, maxPairs: Long,
      broadcastMarginals: Boolean = true): DataFrame = {
    def hinted(df: DataFrame) = if (broadcastMarginals) broadcast(df) else df
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
    // explicit broadcasts (guarded by broadcastMarginals): under the
    // bounded-label contract every post-aggregate frame here is
    // |groups|·|labels|-bounded (report-sized at any corpus scale), but
    // the checkpointed slice hides stats from the planner — without the
    // hint these fall to SortMergeJoin with two pointless exchanges
    val pe = m1.join(hinted(m2), Seq("grp", "lbl")) // absent label ⇒ 0 product
      .groupBy(col("grp"))
      .agg(sum(col("m1") * col("m2")).as("pe_cross"))
    // left + coalesce: a group whose raters share NO label has an empty
    // cross join — pe_cross 0, not a dropped group
    agree.join(hinted(pe), Seq("grp"), "left")
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

  /** MULTI-RATER agreement — exact-rational FLEISS' κ per group, the
    * generalization [[annotatorAgreement]]'s pairwise Cohen's κ cannot
    * see: real annotation pools put r ≥ 3 raters on each item, and the
    * statistic chance-corrects against the POOLED label marginals.
    * With N items each rated exactly r times, n_ik ratings of label k
    * on item i, S = Σᵢₖ n_ik², m_k = Σᵢ n_ik, T = N·r:
    *
    *   P̄  = (S − T) / (T·(r−1))        observed agreement
    *   P̄ₑ = Σₖ m_k² / T²               chance agreement
    *   κ  = (P̄ − P̄ₑ) / (1 − P̄ₑ)
    *      = [ (S − T)·T − (r−1)·Σm_k² ] / [ (r−1)·(T² − Σm_k²) ]
    *
    * released as the exact int64 rational (num, den) — the q310/q303
    * discipline: no float on the release path, callers divide off it.
    * Degenerates release naturally: every rating one label ⇒ (0, 0)
    * (P̄ₑ = 1, the Cohen convention); r = 1 ⇒ (0, 0) (chance agreement
    * is undefined without a second rating). κ < 0 (worse than chance)
    * falls out of the signed numerator.
    *
    * EQUAL-RATINGS CONTRACT: Fleiss' κ is DEFINED for a constant
    * rating count per item; a group whose items carry unequal counts
    * FAILS LOUDLY in-plan (`raise_error`) instead of silently
    * computing a statistic whose formula no longer holds — handle
    * missing ratings upstream (subsample to the common r, or use a
    * missing-tolerant coefficient like Krippendorff's α, which is a
    * different estimand, not a parameter of this one). NULL labels
    * are excluded BEFORE the count (unratable, not disagreement), so
    * a null shows up as exactly such an unequal count. NULL GROUPS
    * are excluded explicitly too (an unattributable rating belongs to
    * no pool — the [[Privacy.rrRelease]] null-exclusion discipline;
    * without the filter the inner marginal join would silently drop
    * the null pool's rows instead, the one thing an audit must never
    * do silently).
    *
    * OVERFLOW CONTRACT: the release needs T²·max(r−1, S/T… ) exact —
    * guarded in-plan by two overflow-free integer tests
    * (T ≤ maxRatings, then r ≤ (Long.Max div T) div T ⟺ r·T² within
    * int64); a group beyond them fails loudly like [[annotatorAgreement]].
    *
    * Shape at 100 TB: one (grp,item,label) hash aggregate over the
    * ratings, folded twice (per-item, per-label) into two
    * |groups|-bounded frames joined broadcast — the label-cardinality
    * caveat of [[annotatorAgreement]] does NOT apply here because the
    * broadcast frames are already summed over labels. Nothing
    * collects.
    *
    * @return (grp, n_items, n_raters, n_ratings, s_sq, sum_m_sq,
    *         kappa_num, kappa_den)
    */
  def fleissKappa(ratings: DataFrame, group: Column, item: Column,
                  label: Column): DataFrame =
    fleissKappaCapped(ratings, group, item, label, 3037000499L)

  /** [[fleissKappa]] with the first-stage overflow cap injectable —
    * ⌊√Long.MaxValue⌋ in production; the spec lowers it to drive the
    * guard without 3·10⁹ rows. */
  private[operators] def fleissKappaCapped(
      ratings: DataFrame, group: Column, item: Column, label: Column,
      maxRatings: Long): DataFrame = {
    val nik = ratings
      .filter(label.isNotNull && group.isNotNull)
      .select(group.as("grp"), item.as("itm"),
        label.cast("string").as("lbl"))
      .groupBy(col("grp"), col("itm"), col("lbl"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // two aggregate consumers of one slice
    val perItem = nik.groupBy(col("grp"), col("itm"))
      .agg(sum(col("n")).as("ri"), sum(col("n") * col("n")).as("si"))
    val grpItems = perItem.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_items"), sum(col("si")).as("s_sq"),
        min(col("ri")).as("r_min"), max(col("ri")).as("r_max"),
        sum(col("ri")).as("n_ratings"))
    val grpLabels = nik.groupBy(col("grp"), col("lbl"))
      .agg(sum(col("n")).as("m"))
      .groupBy(col("grp"))
      .agg(sum(col("m") * col("m")).as("sum_m_sq"))
    // both frames are |groups| rows post-fold — broadcast is safe at
    // ANY label cardinality (unlike the Cohen marginals), but the
    // checkpointed slice hides stats, so hint explicitly
    grpItems.join(broadcast(grpLabels), Seq("grp"))
      .withColumn("n_raters",
        when(col("r_min") =!= col("r_max"), raise_error(concat(
          lit("fleissKappa: group "), col("grp").cast("string"),
          lit(" has unequal per-item rating counts ("),
          col("r_min").cast("string"), lit(".."),
          col("r_max").cast("string"),
          lit(") — Fleiss' kappa needs a constant r; subsample to the" +
            " common count or use a missing-tolerant coefficient"))))
          .otherwise(col("r_min")))
      .withColumn("n_ratings",
        when(col("n_ratings") > maxRatings, raise_error(concat(
          lit("fleissKappa: group "), col("grp").cast("string"),
          lit(s" exceeds $maxRatings ratings — the exact int64" +
            " accounting would overflow; sample or shard upstream"))))
          .otherwise(col("n_ratings")))
      // overflow-free second stage: r·T² must stay int64, tested as
      // r > (Long.Max div T) div T (division can never overflow)
      .withColumn("n_raters",
        when(col("n_raters") >
            expr(s"(${Long.MaxValue}L div n_ratings) div n_ratings"),
          raise_error(concat(
            lit("fleissKappa: group "), col("grp").cast("string"),
            lit(" needs r * n_ratings^2 beyond int64 — the exact" +
              " accounting would overflow; sample or shard upstream"))))
          .otherwise(col("n_raters")))
      .select(col("grp"), col("n_items"), col("n_raters"),
        col("n_ratings"), col("s_sq"), col("sum_m_sq"),
        ((col("s_sq") - col("n_ratings")) * col("n_ratings")
          - (col("n_raters") - 1) * col("sum_m_sq")).as("kappa_num"),
        ((col("n_raters") - 1)
          * (col("n_ratings") * col("n_ratings") - col("sum_m_sq")))
          .as("kappa_den"))
  }

  /** MISSING-TOLERANT multi-rater agreement — exact-rational
    * KRIPPENDORFF'S α (nominal metric) per group: the coefficient
    * [[fleissKappa]]'s unequal-count guard points the caller at. Real
    * annotation pools are ragged — raters skip items, items get 2
    * ratings here and 5 there — and α is DEFINED over exactly that
    * shape: each unit u with m_u ≥ 2 ratings contributes its ordered
    * rating pairs weighted 1/(m_u−1) to the coincidence matrix;
    * single-rating units are unpairable and drop (the standard
    * convention). With n_uc ratings of label c on unit u,
    * m_u = Σ_c n_uc, and (over pairable units only) marginals
    * n_c = Σ_u n_uc, n = Σ_c n_c:
    *
    *   D_o = Σ_u (m_u² − Σ_c n_uc²) / (m_u − 1)   observed disagreement
    *   α   = 1 − (n−1)·D_o / (n² − Σ_c n_c²)
    *
    * (the coincidence-matrix nominal form, Krippendorff 2011; the
    * per-unit numerator m_u² − Σn_uc² counts the disagreeing ordered
    * pairs since m_u(m_u−1) − Σn_uc(n_uc−1) = m_u² − Σn_uc².)
    *
    * EXACT INT64 RATIONAL, no float on the release path: D_o is a sum
    * of fractions whose denominators are the DISTINCT values of
    * (m_u−1) — a set bounded by the pool's max rater count, not the
    * corpus. Per group the per-denominator numerators are summed
    * (`Σ_{u: m_u−1=d} num_u`), the bounded (d, S_d) list is collected
    * sorted, and one `aggregate` HOF folds it into the exact pair
    * (P, N) with P = Π d and N = Σ_d S_d·(P/d) via the
    * division-free recurrence P' = P·d, N' = N·d + S_d·P — so
    * D_o = N/P exactly and
    *
    *   α = [ P·(n² − Σn_c²) − (n−1)·N ] / [ P·(n² − Σn_c²) ]
    *
    * is released as the raw int64 rational (alpha_num, alpha_den),
    * undivided and unreduced — both engines derive the identical
    * integers (P and N are order-free: a product over a set and a
    * symmetric sum). Degenerates release naturally: all ratings one
    * label ⇒ D_o = 0 AND n² = Σn_c² ⇒ (0, 0); a group with no
    * pairable unit has no row (nothing is estimable); α < 0 (worse
    * than chance) falls out of the signed numerator.
    *
    * NULL labels/groups are excluded explicitly before any count
    * (unratable / unattributable — the [[fleissKappa]] discipline);
    * unlike Fleiss a null simply shrinks m_u, it cannot corrupt the
    * estimand.
    *
    * OVERFLOW CONTRACT: every multiply on the fold and release path
    * is guarded by an overflow-free `div` test and fails loudly
    * (raise_error) — P explodes only if the pool mixes MANY distinct
    * rater counts (P ≤ lcm ≤ (r_max−1)! in the worst case; realistic
    * pools have r_max ≤ ~15 ⇒ P < 10⁶), and n ≤ ⌊√Long.Max⌋ keeps n²
    * exact (the [[fleissKappa]] cap, injectable for the spec).
    *
    * Shape at 100 TB: one (grp,item,label) hash aggregate, one
    * (grp,item)-partitioned window to attach m_u (≤ r rows per
    * partition — no skew exposure), then three |groups|- or
    * |groups|·|dens|-bounded folds; the collected list is bounded by
    * the distinct rater counts (≤ r_max values). Nothing collects to
    * the driver.
    *
    * @return (grp, n_items, n_ratings, n_labels, do_num, do_den,
    *         alpha_num, alpha_den) — n_items/n_ratings count pairable
    *         units only; do_num/do_den release D_o itself for audit
    */
  def krippendorffAlpha(ratings: DataFrame, group: Column, item: Column,
                        label: Column): DataFrame =
    krippendorffAlphaCapped(ratings, group, item, label, 3037000499L)

  /** [[krippendorffAlpha]] with the n ≤ ⌊√Long.MaxValue⌋ cap
    * injectable — the spec lowers it to drive the guard. */
  private[operators] def krippendorffAlphaCapped(
      ratings: DataFrame, group: Column, item: Column, label: Column,
      maxRatings: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lmax = Long.MaxValue
    val nik = ratings
      .filter(label.isNotNull && group.isNotNull)
      .select(group.as("grp"), item.as("itm"),
        label.cast("string").as("lbl"))
      .groupBy(col("grp"), col("itm"), col("lbl"))
      .agg(count(lit(1)).as("n"))
    // attach m_u and keep pairable units (m >= 2) — the window
    // partition is (grp, itm): at most r rows, skew-free by contract
    val pairable = nik
      .withColumn("m", sum(col("n")).over(
        Window.partitionBy(col("grp"), col("itm"))))
      .filter(col("m") >= 2L)
      .localCheckpoint(false) // two aggregate consumers of one slice
    // per-unit disagreement fraction num/den = (m² − Σn²)/(m−1),
    // folded per distinct denominator into a bounded (den, snum) list
    val dens = pairable.groupBy(col("grp"), col("itm"))
      .agg(first(col("m")).as("m"), sum(col("n") * col("n")).as("s"))
      .select(col("grp"), (col("m") * col("m") - col("s")).as("num"),
        (col("m") - 1L).as("den"))
      .groupBy(col("grp"), col("den"))
      .agg(sum(col("num")).as("snum"), count(lit(1)).as("n_units"))
      .groupBy(col("grp"))
      .agg(sum(col("n_units")).as("n_items"),
        sort_array(collect_list(struct(col("den"), col("snum"))))
          .as("ds"))
    // pooled label marginals over the SAME pairable slice
    val marg = pairable.groupBy(col("grp"), col("lbl"))
      .agg(sum(col("n")).as("nc"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_labels"), sum(col("nc")).as("n_ratings"),
        sum(col("nc") * col("nc")).as("sum_nc_sq"))
    def guarded(prod: Column, a: Column, b: Column, what: String): Column =
      when(a > lit(lmax) / greatest(b, lit(1L)), raise_error(concat(
        lit(s"krippendorffAlpha: group "), col("grp").cast("string"),
        lit(s" overflows int64 on $what — sample or shard upstream"))))
        .otherwise(prod)
    // division-free exact fold: acc = (p, nn) with p = Π den and
    // nn/p = Σ snum/den; both frames are |groups| rows post-fold so
    // the join is broadcast-safe, but the checkpointed slice hides
    // stats — hint explicitly (the q310/q313 lesson)
    dens.join(broadcast(marg), Seq("grp"))
      .withColumn("n_ratings",
        when(col("n_ratings") > maxRatings, raise_error(concat(
          lit("krippendorffAlpha: group "), col("grp").cast("string"),
          lit(s" exceeds $maxRatings ratings — n² would overflow" +
            " int64; sample or shard upstream"))))
          .otherwise(col("n_ratings")))
      .withColumn("fold", aggregate(col("ds"),
        struct(lit(1L).as("p"), lit(0L).as("nn")),
        (acc, x) => {
          val p = acc.getField("p"); val nn = acc.getField("nn")
          val d = x.getField("den"); val s = x.getField("snum")
          struct(
            guarded(p * d, p, d, "Π(m−1)").as("p"),
            (guarded(nn * d, nn, d, "D_o fold (N·d)")
              + guarded(s * p, s, p, "D_o fold (S·P)")).as("nn"))
        }))
      .withColumn("se",
        col("n_ratings") * col("n_ratings") - col("sum_nc_sq"))
      .select(col("grp"), col("n_items"), col("n_ratings"),
        col("n_labels"),
        col("fold.nn").as("do_num"), col("fold.p").as("do_den"),
        (guarded(col("fold.p") * col("se"), col("fold.p"), col("se"),
          "P·(n²−Σn_c²)")
          - guarded((col("n_ratings") - 1L) * col("fold.nn"),
            col("n_ratings") - 1L, col("fold.nn"), "(n−1)·N"))
          .as("alpha_num"),
        (col("fold.p") * col("se")).as("alpha_den"))
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
