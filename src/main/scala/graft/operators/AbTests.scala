package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Two-sample test statistics for experiment readouts, computed
  * engine-exactly (public formulas: Welch, Biometrika 1947;
  * Mann & Whitney, Ann. Math. Stat. 1947) — the inference legs next
  * to [[Cuped]]'s adjusted means and [[Bootstrap]]'s intervals.
  *
  * Determinism discipline (q168's): unit values are integer cents;
  * every moment and rank sum is EXACT (decimal-exact sums cast back,
  * tie handling in ×2 integer "double-ranks" so average ranks never
  * leave ℤ); doubles appear only in the final fixed-shape t/df/z
  * expressions, which replay bit-for-bit in SQL.
  */
object AbTests {

  private def dsum(c: Column) = sum(c.cast(DecimalType(38, 0))).cast("long")

  /** Welch's unequal-variance t: per group, arms keyed by `arm` (two
    * expected). Moments n, Σy, Σy² are exact; s² = (nΣy² − (Σy)²) /
    * (n(n−1)) with the integer numerator built in decimal(38) (the
    * cross products overflow int64 at warehouse unit counts).
    *
    * @return (group, n0, n1, mean0_r, mean1_r, t_r, df_r)
    */
  def welch(df: DataFrame, unit: Column, group: Column, arm: Column,
            value: Column): DataFrame = {
    val units = df.groupBy(group.as("group"), unit.as("unit"))
      .agg(first(arm).as("arm"), dsum(value).as("uy"))
    // uy² multiplies IN decimal(38) — squaring in int64 first wraps for
    // |uy| > ~3.0e9, exactly the unit totals the decimal guard targets.
    val arms = units.groupBy(col("group"), col("arm"))
      .agg(count(lit(1)).as("n"), dsum(col("uy")).as("s1"),
        sum(col("uy").cast(DecimalType(38, 0)) *
          col("uy").cast(DecimalType(38, 0))).as("s2"))
      .withColumn("mean", col("s1").cast("double") / col("n").cast("double"))
      .withColumn("varr",
        (col("n").cast(DecimalType(38, 0)) * col("s2") -
          (col("s1").cast(DecimalType(38, 0)) * col("s1").cast(DecimalType(38, 0))))
          .cast("double") /
          (col("n") * (col("n") - 1)).cast("double"))
    val a0 = arms.filter(col("arm") === 0)
      .select(col("group"), col("n").as("n0"), col("mean").as("m0"), col("varr").as("v0"))
    val a1 = arms.filter(col("arm") === 1)
      .select(col("group"), col("n").as("n1"), col("mean").as("m1"), col("varr").as("v1"))
    val se0 = col("v0") / col("n0").cast("double")
    val se1 = col("v1") / col("n1").cast("double")
    a0.join(a1, "group")
      .withColumn("t", (col("m0") - col("m1")) / sqrt(se0 + se1))
      .withColumn("df",
        (se0 + se1) * (se0 + se1) /
          (se0 * se0 / (col("n0") - 1).cast("double") +
            se1 * se1 / (col("n1") - 1).cast("double")))
      .select(col("group"), col("n0"), col("n1"),
        round(col("m0"), 6).as("mean0_r"), round(col("m1"), 6).as("mean1_r"),
        round(col("t"), 6).as("t_r"), round(col("df"), 6).as("df_r"))
  }

  /** Exact tie-corrected Mann–Whitney U: within each group, units are
    * ranked by value with AVERAGE ranks on ties, carried as ×2 integer
    * double-ranks (avg rank of a tie run = (first + last)/2, so twice
    * it is min_rank + max_rank — never fractional). U₁ follows from
    * the arm-0 rank sum; U₁ + U₂ ≡ n₀n₁ is a structural identity the
    * output exposes for free.
    *
    * Scale shape: one per-group rank window (units, not events), one
    * (group, value) tie aggregation, arm sums.
    *
    * @return (group, n0, n1, u0_x2, u1_x2) — ×2 integer U statistics
    */
  def mannWhitneyU(df: DataFrame, unit: Column, group: Column, arm: Column,
                   value: Column): DataFrame = {
    val units = df.groupBy(group.as("group"), unit.as("unit"))
      .agg(first(arm).as("arm"), dsum(value).as("uy"))
      .localCheckpoint(false) // ranked once, tie-aggregated once
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("uy"), col("unit"))
    val ranked = units.withColumn("rnk", row_number().over(w).cast("long"))
      .localCheckpoint(false)
    val ties = ranked.groupBy(col("group"), col("uy"))
      .agg(min(col("rnk")).as("lo"), max(col("rnk")).as("hi"))
    val r2 = ranked.join(ties, Seq("group", "uy"))
      .withColumn("rank2", col("lo") + col("hi")) // 2 × average rank
    val arms = r2.groupBy(col("group"), col("arm"))
      .agg(count(lit(1)).as("n"), dsum(col("rank2")).as("rsum2"))
    val a0 = arms.filter(col("arm") === 0)
      .select(col("group"), col("n").as("n0"), col("rsum2").as("r0"))
    val a1 = arms.filter(col("arm") === 1)
      .select(col("group"), col("n").as("n1"), col("rsum2").as("r1"))
    a0.join(a1, "group")
      .select(col("group"), col("n0"), col("n1"),
        (col("r0") - col("n0") * (col("n0") + 1)).as("u0_x2"),
        (col("r1") - col("n1") * (col("n1") + 1)).as("u1_x2"))
  }

  /** Wald SPRT sequential monitor (Wald, Ann. Math. Stat. 1945) — the
    * always-monitoring leg next to the fixed-horizon tests above: a
    * Bernoulli log-likelihood ratio accumulates per trial and the test
    * DECIDES the first day it leaves the (−bound, +bound) band —
    * "peek every day" is the designed usage, not a p-hacking bug. The
    * classic deployment is sample-ratio-mismatch detection: H0 = the
    * assignment is balanced (p₀), H1 = it is skewed (p₁).
    *
    * Fixed-point discipline: the test is DEFINED in micro-log2 units —
    * per-trial increments `llrSuccU`/`llrFailU` and the decision
    * `boundU` are integer ⌊10⁶·log2(·)⌋ constants supplied by the
    * caller — so the whole monitor is int64 arithmetic that replays
    * bit-for-bit on any engine (thresholds sit within 1e-6 log2-units
    * of Wald's exact ones; the guarantees are those of the perturbed
    * test, which is still a valid SPRT).
    *
    * Scale shape: ONE hash aggregate reduces the event stream to the
    * (experiment × day) frame; cumulative sums, crossing detection,
    * and the sticky decision are windows on that tiny frame (q289's
    * global-windows-on-the-group-frame discipline). Nothing collects.
    *
    * @param success per-trial Bernoulli outcome (boolean)
    * @return (exp_id, day, n, s, llr_u, state) — n/s cumulative trials/
    *         successes at end of day, state ∈ h1|h0|continue sticky
    *         from the first crossing day
    */
  def sprtMonitor(df: DataFrame, exp: Column, day: Column, success: Column,
                  llrSuccU: Long, llrFailU: Long, boundU: Long): DataFrame = {
    // valid Bernoulli SPRT constants for p1 > p0 always have a positive
    // success increment and a negative failure increment; same-sign
    // increments make one hypothesis unreachable (llr_u monotone), which
    // is a parameterization error, not a monitor
    require(boundU > 0 && llrSuccU > 0 && llrFailU < 0,
      s"need boundU > 0, llrSuccU > 0 and llrFailU < 0, got $llrSuccU/$llrFailU/$boundU")
    val w = org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(exp.as("exp_id"), day.as("day"))
      .agg(count(lit(1)).as("n_d"), sum(success.cast("long")).as("s_d"))
    val cumW = w.partitionBy(col("exp_id")).orderBy(col("day"))
      .rowsBetween(Long.MinValue, 0)
    val expW = w.partitionBy(col("exp_id"))
    daily
      .withColumn("n", sum(col("n_d")).over(cumW))
      .withColumn("s", sum(col("s_d")).over(cumW))
      .withColumn("llr_u",
        col("s") * llrSuccU + (col("n") - col("s")) * llrFailU)
      .withColumn("h1_day", min(when(col("llr_u") >= boundU, col("day"))).over(expW))
      .withColumn("h0_day", min(when(col("llr_u") <= -boundU, col("day"))).over(expW))
      .withColumn("state",
        when(col("h1_day").isNotNull &&
          (col("h0_day").isNull || col("h1_day") <= col("h0_day")) &&
          col("day") >= col("h1_day"), "h1")
        .when(col("h0_day").isNotNull &&
          (col("h1_day").isNull || col("h0_day") < col("h1_day")) &&
          col("day") >= col("h0_day"), "h0")
        .otherwise("continue"))
      .select(col("exp_id"), col("day"), col("n"), col("s"),
        col("llr_u"), col("state"))
  }
}
