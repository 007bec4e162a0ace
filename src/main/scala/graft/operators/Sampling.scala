package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deterministic sampling — the subsampling/data-mixing discipline of a
  * training pipeline, where "random" must mean REPRODUCIBLE:
  * `df.sample` draws from per-partition RNG streams, so its selection
  * changes with partitioning, retries, and cluster size, which makes
  * runs non-replayable and lineage unauditable. These operators decide
  * membership by a seeded content hash instead — the same row is in or
  * out on every run, every cluster, and every engine ([[TextFns.hash60]]
  * is reproducible bit-for-bit in DuckDB, so selections are
  * oracle-checkable end-to-end).
  *
  * All three are narrow or single-shuffle:
  *  - [[deterministicSample]]: a per-row filter — zero shuffle, fully
  *    pushdown-friendly;
  *  - [[stratifiedSample]]: the per-row filter with a per-stratum rate
  *    (the data-mixing primitive: weight sources/languages/quality
  *    tiers into a target mixture) — zero shuffle;
  *  - [[reservoirPerKey]]: exactly n per stratum by hash order — one
  *    shuffle on the stratum (the window), the deterministic version of
  *    per-group reservoir sampling.
  */
object Sampling {

  /** hash60's range is [0, 2^60). */
  private[graft] val MaxHash: Long = 1L << 60

  /** The membership threshold for `fraction` — computed once driver-side
    * so query and oracle compare against the identical literal. */
  private[graft] def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    if (fraction >= 1.0) MaxHash else (fraction * MaxHash).toLong
  }

  /** Keep rows with `hash60(seed:key) < fraction·2^60` — a deterministic
    * Bernoulli sample keyed on content, stable under repartitioning,
    * retries, and re-runs. `key` must identify the row (duplicates
    * travel together — often exactly what dedup-aware sampling wants).
    */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double,
                          seed: Int = 0): DataFrame =
    df.filter(TextFns.seededHash(seed, key) < threshold(fraction))

  /** Per-stratum deterministic sampling — the data-mixing primitive:
    * each stratum value keeps its own fraction (absent strata keep
    * `defaultFraction`). The rate table enters the plan as a literal
    * CASE chain, so the filter stays a zero-shuffle narrow map that
    * Catalyst can push around.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       seed: Int = 0): DataFrame = {
    val thr = fractions.foldLeft(lit(threshold(defaultFraction))) {
      case (acc, (value, frac)) => when(stratum === value, lit(threshold(frac))).otherwise(acc)
    }
    df.filter(TextFns.seededHash(seed, key) < thr)
  }

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * chosen by seeded-hash order with the key as tiebreak — the
    * deterministic equivalent of per-group reservoir sampling. One
    * shuffle on the stratum, and — unlike a data-dependent rank cut —
    * the CONSTANT `rank ≤ n` filter lets Catalyst plan a PARTIAL
    * WindowGroupLimit below the exchange (pinned by SamplingSpec):
    * every map task keeps at most `n` rows per stratum before the
    * shuffle, so a hot stratum's reduce-side sort sees ≤ n·mapTasks
    * rows, never the stratum's full mass. Quota-shaped cuts that CAN'T
    * use this optimization go through [[Packing.stratumRowNumber]]'s
    * two-phase prefix sum instead (see [[temperatureSample]],
    * [[stratifiedKFold]]).
    *
    * `key` must be UNIQUE within a stratum for the full-row guarantee:
    * physical duplicates of a (stratum, key) pair have no further order,
    * so which duplicate's non-key columns are returned at the rank
    * boundary is partitioning-dependent (the selected KEYS are always
    * deterministic).
    */
  def reservoirPerKey(df: DataFrame, stratum: Column, key: Column, n: Int,
                      seed: Int = 0): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(!df.columns.contains("__rk"),
      "input frame already has a __rk column (reserved working name) — " +
        "it would be silently clobbered and dropped; rename it first")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratum)
      .orderBy(TextFns.seededHash(seed, key).asc, key.asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Self-calibrating balanced mixture — data mixing to a TARGET: keep
    * ~`targetPerStratum` rows from every stratum, deriving each
    * stratum's keep rate `min(1, target/n)` from the data itself (one
    * tiny counts aggregate broadcast back), instead of requiring the
    * caller to know per-stratum rates up front like
    * [[stratifiedSample]]. Strata smaller than the target keep
    * everything.
    *
    * Membership stays deterministic AND engine-exact: the naive form
    * `hash < (target/n)·2^60` computes a double threshold whose
    * rounding DuckDB and Spark disagree on; this keeps the comparison
    * in exact integer arithmetic instead —
    * `hash·n < target·2^60` (38-digit decimals here, HUGEINT in the
    * oracle) — so the selection replays bit-for-bit in both engines.
    *
    * Shuffle ledger: one map-side-combined counts aggregate (stratum
    * cardinality rows), one broadcast join back, then a narrow filter.
    *
    * Rows with a NULL stratum are dropped (the equi-join back never
    * matches null) — coalesce the stratum to a sentinel first if null
    * should be its own mixture bucket. Applies to
    * [[balancedSampleTargets]] too.
    */
  def balancedSample(df: DataFrame, stratum: Column, key: Column,
                     targetPerStratum: Long, seed: Int = 0): DataFrame =
    balancedSampleTargets(df, stratum, key, Map.empty,
      defaultTarget = targetPerStratum, seed = seed)

  /** [[balancedSample]] with PER-STRATUM targets — the mixture-recipe
    * form ("12k web docs, 6k code docs, everything from the rare
    * sources"): each stratum keeps `min(1, target(stratum)/n)` of its
    * rows, targets supplied as a map (absent strata get
    * `defaultTarget`), rates still derived in-plan from the stratum
    * cardinalities and membership still decided by the exact rational
    * rule, so the selection replays bit-for-bit in DuckDB. Same
    * shuffle ledger as [[balancedSample]] (which IS this with an empty
    * map — one shared implementation of the membership rule).
    */
  def balancedSampleTargets(df: DataFrame, stratum: Column, key: Column,
                            targets: Map[String, Long], defaultTarget: Long = 0L,
                            seed: Int = 0): DataFrame = {
    require((targets.values.toSeq :+ defaultTarget).forall(_ >= 0),
      "targets must be >= 0")
    val reserved = df.columns.filter(_.startsWith("__bs_"))
    require(reserved.isEmpty,
      s"input frame already has reserved __bs_* working columns (${reserved.mkString(", ")}) — rename them first")
    val dec = "decimal(38,0)"
    val counts = df.groupBy(stratum.as("__bs_stratum"))
      .agg(count(lit(1)).cast(dec).as("__bs_n"))
    def rhs(target: Long): Column =
      lit(new java.math.BigDecimal(target)
        .multiply(new java.math.BigDecimal(MaxHash))).cast(dec)
    val targetCol = targets.foldLeft(rhs(defaultTarget)) {
      case (acc, (value, t)) => when(col("__bs_stratum") === value, rhs(t)).otherwise(acc)
    }
    df.join(broadcast(counts), stratum === col("__bs_stratum"))
      .filter(TextFns.seededHash(seed, key).cast(dec) * col("__bs_n") < targetCol)
      .drop("__bs_stratum", "__bs_n")
  }

  /** Temperature-scaled mixture sampling — the multilingual/multi-source
    * rebalancing rule from published LLM recipes (mBERT/XLM-R's
    * exponentiated-count sampling, p_s ∝ n_s^α): draw a fixed `budget`
    * of rows with per-stratum quotas proportional to `n_s^α` at
    * α = 0.5 (temperature τ = 1/α = 2 — the standard "flatten the head,
    * boost the tail" point), instead of proportional to raw counts.
    *
    * Engine-exact arithmetic: `n^0.5` is `floor(sqrt(n·10^6))` — IEEE
    * sqrt is correctly rounded, so the int64 quota
    * `t_s = (budget · s_s) div Σ s_s` (capped at n_s) replays
    * bit-for-bit in DuckDB. Selection within a stratum is seeded-hash
    * rank (first `t_s` rows in hash60 order, key tiebreak) — the
    * deterministic-sampling discipline of this module.
    *
    * Shuffle ledger: one tiny counts aggregate (broadcast back as the
    * quota table), one rank window partitioned by the stratum. The
    * window sorts each stratum — at very hot strata swap the rank rule
    * for [[balancedSampleTargets]]'s thresholded form with the derived
    * quotas (rate = t_s/n_s) to stay fully narrow.
    */
  def temperatureSample(df: DataFrame, stratum: Column, key: Column,
                        budget: Long, seed: Int = 0): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val reserved = df.columns.filter(_.startsWith("__ts_"))
    require(reserved.isEmpty,
      s"input frame already has reserved __ts_* working columns (${reserved.mkString(", ")}) — rename them first")
    val scaled = df.groupBy(stratum.as("__ts_stratum"))
      .agg(count(lit(1)).as("__ts_n"))
      .withColumn("__ts_s",
        floor(sqrt((col("__ts_n") * 1000000L).cast("double"))).cast("long"))
    val total = scaled.agg(sum(col("__ts_s")).as("__ts_tot"))
    val quotas = scaled.crossJoin(broadcast(total))
      .withColumn("__ts_t",
        least(expr(s"($budget * __ts_s) div __ts_tot"), col("__ts_n")))
      .select(col("__ts_stratum"), col("__ts_t"))
    // Per-stratum rank via the stratum-keyed two-phase prefix sum: the
    // quota is data-dependent (no constant rank cut for the optimizer's
    // WindowGroupLimit to push down), so a PARTITION BY stratum window
    // would pay a full single-task sort per hot stratum before its
    // filter. stratumRowNumber splits a hot stratum across range buckets
    // instead.
    Packing.stratumRowNumber(df, stratum,
        struct(TextFns.seededHash(seed, key), key), posName = "__ts_rk")
      .join(broadcast(quotas), stratum === col("__ts_stratum"))
      .filter(col("__ts_rk") <= col("__ts_t"))
      .drop("__ts_stratum", "__ts_t", "__ts_rk")
  }

  /** Token-budget corpus selection: keep the maximal prefix of `order`-
    * ascending rows whose running `tok` total fits `budget` — "take the
    * best documents until the token budget is spent", the curation cut
    * that turns a scored corpus into a right-sized training set (order
    * by quality descending and the prefix IS the best-first selection).
    * A row straddling the boundary is dropped: only whole documents
    * that fit are kept. Carries all input columns plus the running
    * total as `cum_tok`.
    *
    * The running total is [[Packing.runningTotal]]'s two-phase prefix
    * sum — never a single-reducer global window — and the budget test
    * is a narrow filter on top, so the whole selection is one range
    * shuffle + one broadcast regardless of corpus size. `order` must
    * be totally ordering (unique), and `tok` NON-NEGATIVE — a negative
    * count would make the running total non-monotone and the kept set
    * non-contiguous (garbage in, garbage out; not validated in-plan).
    */
  def selectByTokenBudget(df: DataFrame, order: Column, tok: Column,
                          budget: Long, numRanges: Int = 32): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    Packing.runningTotal(df, order, tok, totalName = "cum_tok", numRanges = numRanges)
      .filter(col("cum_tok") <= budget)
  }

  /** Deterministic global corpus shuffle: every row gets `shuffle_pos`,
    * its 1-based position in seeded-content-hash order — the replayable
    * "random" training order (same position on every run, cluster, and
    * engine; DuckDB re-derives it bit-for-bit). Hash ties break on the
    * key, so the order is total even under (astronomically unlikely)
    * hash collisions. Rank assignment is
    * [[Packing.globalRowNumber]]'s two-phase prefix sum — never a
    * single-reducer global window. Writing the result range-clustered
    * on `shuffle_pos` (see [[Layout.writeClustered]]) materializes the
    * shuffled corpus for sequential training reads.
    */
  def deterministicShuffle(df: DataFrame, key: Column, seed: Int = 0,
                           numRanges: Int = 32): DataFrame = {
    require(!df.columns.contains("__sh_h"),
      "input frame already has a __sh_h column (reserved working name) — rename it first")
    Packing.globalRowNumber(
        df.withColumn("__sh_h", TextFns.seededHash(seed, key)),
        struct(col("__sh_h"), key), posName = "shuffle_pos",
        numRanges = numRanges)
      .drop("__sh_h")
  }

  /** Leakage-safe GROUPED split: assign every row to a named split by
    * hashing its GROUP key (user, site, domain …), never the row key —
    * all rows of a group land in the same split BY CONSTRUCTION, so no
    * entity leaks across train/validation/test. `splits` is an ordered
    * (name, weight) list; group g goes to the split whose cumulative
    * weight range contains `hash60(g) mod Σweights`. A zero-shuffle
    * narrow map (the CASE chain is a per-row codegen expression), and
    * deterministic across runs, partitionings, and engines
    * ([[TextFns.hash60]] replays bit-for-bit in SQL) — the split of a
    * group never changes when the corpus around it grows, which is what
    * makes incremental corpus refreshes split-stable.
    */
  def groupedSplit(df: DataFrame, group: Column,
                   splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splits must be non-empty positive weights, got $splits")
    val total = splits.map(_._2.toLong).sum
    val bucket = TextFns.hash60(group) % lit(total)
    val cum = splits.scanLeft(0L)(_ + _._2).tail
    val label = splits.tail.zip(cum.tail).foldLeft(
      when(bucket < lit(cum.head), lit(splits.head._1))) {
      case (c, ((name, _), hi)) => c.when(bucket < lit(hi), lit(name))
    }
    df.withColumn("split", label)
  }

  /** Epoch-capped proportional data mixture by exact water-filling: a
    * token `budget` is split across strata ∝ `weight`, but no stratum
    * may be allocated more than `maxEpochsMilli/1000 ×` its available
    * tokens (the LLM-pipeline "never repeat a source more than N
    * epochs" rule — upsampling a tiny high-weight source past a few
    * epochs only memorizes it). Strata whose fair share exceeds their
    * cap are clamped to it and the surplus re-flows to the rest —
    * iterated to the fixed point in CLOSED FORM: sorted by cap/weight
    * ascending, the clamped set is provably a prefix, so one window
    * pass of prefix sums decides `capped` per stratum
    * (cap·sufW ≤ remaining·w, all int64 cross-multiplies — exact up to
    * ~10^14 tokens/stratum at weight sums ≤ 10^4). Uncapped strata get
    * floor(remaining·w/W) plus largest-remainder distribution of the
    * leftover, so Σ alloc = min(budget, Σ cap) EXACTLY. Everything is a
    * stratum-level aggregate (one shuffle on `stratum`, then window
    * passes over |strata| rows — a bounded source vocabulary, not the
    * corpus), and integer-deterministic across engines.
    *
    * Output: (stratum, avail_tok, weight, capped, alloc_tok,
    * epochs_milli = ⌊alloc·1000/avail⌋).
    */
  def epochCappedMixture(df: DataFrame, stratum: Column, tok: Column,
                         weight: Column, budget: Long,
                         maxEpochsMilli: Long): DataFrame = {
    require(budget >= 0 && maxEpochsMilli >= 0,
      s"budget and maxEpochsMilli must be >= 0, got $budget, $maxEpochsMilli")
    import org.apache.spark.sql.expressions.Window
    val fdiv = (a: Column, b: Column) => call_function("div", a, b)
    val strata = df.groupBy(stratum.as("stratum"))
      .agg(sum(tok).as("avail_tok"), max(weight).as("weight"))
      .withColumn("cap", fdiv(col("avail_tok") * lit(maxEpochsMilli), lit(1000L)))
    // Ratio-ascending order; the double division is an ORDER key only
    // (ties broken on stratum), so IEEE round-to-nearest matches SQL.
    val byRatio = Window.orderBy(
      (col("cap").cast("double") / col("weight")).as("ratio"), col("stratum"))
    val marked = strata
      .withColumn("pref_cap",
        coalesce(sum(col("cap")).over(byRatio.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("suf_w",
        sum(col("weight")).over(byRatio.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("capped",
        col("cap") * col("suf_w") <= (lit(budget) - col("pref_cap")) * col("weight"))
    // Remaining budget and uncapped weight are stratum-vocabulary-sized
    // scalars; the cross join broadcasts one row.
    val totals = marked.agg(
      sum(when(col("capped"), col("cap")).otherwise(lit(0L))).as("capped_tok"),
      sum(when(col("capped"), lit(0L)).otherwise(col("weight"))).as("unc_w"))
    val shared = marked.crossJoin(broadcast(totals))
      .withColumn("remaining", greatest(lit(budget) - col("capped_tok"), lit(0L)))
      .withColumn("base", when(col("capped"), col("cap"))
        .otherwise(fdiv(col("remaining") * col("weight"), col("unc_w"))))
      .withColumn("frac", when(col("capped"), lit(-1L))
        .otherwise((col("remaining") * col("weight")) % col("unc_w")))
    val byFrac = Window.orderBy(col("frac").desc, col("stratum"))
    shared
      .withColumn("extra_rank", row_number().over(byFrac))
      .withColumn("n_extra",
        col("remaining") - sum(when(col("capped"), lit(0L)).otherwise(col("base")))
          .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("alloc_tok",
        col("base") + when(!col("capped") && col("extra_rank") <= col("n_extra"), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("epochs_milli", fdiv(col("alloc_tok") * lit(1000L), col("avail_tok")))
      .select(col("stratum"), col("avail_tok"), col("weight"), col("capped"),
        col("alloc_tok"), col("epochs_milli"))
  }

  /** Near-dup-cluster-safe split — [[groupedSplit]] keyed on the dedup
    * COMPONENT of each row instead of a metadata entity: rows connected
    * by a `pairs` edge (near-duplicates, shared spans, translations …)
    * land in the same split BY CONSTRUCTION, closing the eval leak a
    * user/site-level split cannot see (a near-copy of a training doc
    * sitting in the test set scores as memorization). Components come
    * from [[Dedup.connectedComponents]]' min-label propagation over the
    * pair graph; rows in no pair label themselves (their own id IS the
    * component — the left join + coalesce keeps them split-stable under
    * corpus growth just like any other group). One component shuffle on
    * top of the pair plan; the split itself stays the zero-shuffle
    * hash-range CASE chain.
    */
  def componentSafeSplit(df: DataFrame, id: Column, pairs: DataFrame,
                         splits: Seq[(String, Int)], maxIter: Int = 20): DataFrame = {
    val comp = Dedup.connectedComponents(pairs, maxIter)
    val labeled = df.withColumn("__csp_id", id)
      .join(comp.select(col("doc_id").as("__csp_id"), col("component")), Seq("__csp_id"), "left")
      .withColumn("component", coalesce(col("component"), col("__csp_id")))
      .drop("__csp_id")
    groupedSplit(labeled, col("component"), splits)
  }

  /** Stratified k-fold assignment with EXACT balance: within each
    * stratum, rows are ordered by (hash60(id), id) — a deterministic
    * shuffle — and dealt round-robin, fold = (rank−1) mod k, so fold
    * sizes within a stratum differ by AT MOST ONE (the property
    * hash-mod-k sampling only gives in expectation; k-fold CV wants it
    * exactly, or small strata end up with empty folds). Deterministic,
    * partitioning-invariant, and every row lands in exactly one fold.
    *
    * Scale shape: the per-stratum rank is [[Packing.stratumRowNumber]]'s
    * stratum-keyed two-phase prefix sum — NEVER a
    * `PARTITION BY stratum` window, which would serialize a hot
    * language/source-sized stratum into one terabyte sort task. A
    * skewed stratum spans as many order-aligned range buckets as its
    * mass demands; the only global step is a broadcast of the
    * (#strata + buckets)-sized offset table.
    *
    * @return input plus `fold` (0..k−1)
    */
  def stratifiedKFold(df: DataFrame, stratum: Column, id: Column,
                      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(!df.columns.contains("__kf_pos"),
      "input frame already has a __kf_pos column (reserved working name) — rename it first")
    Packing.stratumRowNumber(df, stratum,
        struct(TextFns.hash60(id), id), posName = "__kf_pos")
      .withColumn("fold", ((col("__kf_pos") - 1) % k).cast("int"))
      .drop("__kf_pos")
  }
}
