package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic Poisson bootstrap (the streaming/distributed
  * bootstrap: Chamandy, Muralidharan, Najmi & Naidu, "Estimating
  * Uncertainty for Massive Data Streams", Google 2012 — public
  * method): classic resampling needs a length-n multinomial draw —
  * impossible to coordinate across a cluster — but each unit's count
  * in a resample is asymptotically Poisson(1) INDEPENDENTLY, so every
  * (unit, replica) pair can draw its own weight from a hash of the
  * pair and no two workers ever need to agree on anything.
  *
  * Determinism: the Poisson(1) draw is inverse-CDF on
  * `hash60(replica ':' unit) mod 10⁶` against FIXED integer
  * thresholds (cumulative Poisson(1) probabilities ×10⁶, truncated at
  * k = 5 — P(K > 5) ≈ 6·10⁻⁴ absorbed into the top bucket), so any
  * engine replays every weight exactly; replica statistics are ratios
  * of exact integer sums.
  *
  * Scale shape: one narrow explode (units × B rows — B is ~100, not
  * data-sized), one (replica, group) aggregation; the quantile step
  * runs over B rows per group. No global sort, no coordination.
  */
object Bootstrap {

  /** Cumulative Poisson(1) ×10⁶ thresholds for k = 0..4; ≥ last → 5. */
  private val Cdf = Seq(367879L, 735759L, 919699L, 981012L, 996340L)

  /** Per-(unit, replica) weight column, given the replica column. */
  private def weight(unit: Column, rep: Column): Column = {
    val u = graft.functions.TextFns.hash60(
      concat(rep.cast("string"), lit(":"), unit.cast("string"))) % lit(1000000L)
    Cdf.zipWithIndex.foldRight(lit(5L): Column) { case ((thr, k), rest) =>
      when(u < thr, k.toLong).otherwise(rest)
    }
  }

  /** Bootstrap percentile CI of the per-`group` mean of `value`
    * (unit-level): B replicas, CI from the order statistics at
    * `loIdx`/`hiIdx` (1-based ranks of the sorted replica means —
    * callers pick e.g. 3 and 98 of B=100 for a ~95% interval).
    *
    * @return (group, n_units, mean_r, lo_r, hi_r) — ×10⁻⁶-rounded;
    *         lo_r/hi_r are NULL when the group is so small that the
    *         requested order statistic fell to zero-weight replicas
    */
  def meanCi(df: DataFrame, unit: Column, group: Column, value: Column,
             b: Int, loIdx: Int, hiIdx: Int): DataFrame = {
    require(b >= 2 && loIdx >= 1 && hiIdx <= b && loIdx < hiIdx,
      s"need 1 <= loIdx < hiIdx <= b, got b=$b, lo=$loIdx, hi=$hiIdx")
    def dsum(c: Column) = sum(c.cast(DecimalType(38, 0))).cast("long")
    val units = df.groupBy(group.as("group"), unit.as("unit"))
      .agg(dsum(value).as("uv"))
      .localCheckpoint(false) // feeds the point estimate AND the replicas
    val point = units.groupBy(col("group"))
      .agg(count(lit(1)).as("n_units"), dsum(col("uv")).as("sv"))
    val reps = units
      .select(col("group"), col("unit"), col("uv"),
        explode(sequence(lit(1), lit(b))).as("rep"))
      .withColumn("w", weight(col("unit"), col("rep")))
      .groupBy(col("group"), col("rep"))
      .agg(dsum(col("w") * col("uv")).as("swv"), dsum(col("w")).as("sw"))
      .filter(col("sw") > 0) // an all-zero-weight replica has no mean
      .withColumn("m", col("swv").cast("double") / col("sw").cast("double"))
    val ranked = reps.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("group")).orderBy(col("m"), col("rep"))))
    val lo = ranked.filter(col("rnk") === loIdx).select(col("group"), col("m").as("lo"))
    val hi = ranked.filter(col("rnk") === hiIdx).select(col("group"), col("m").as("hi"))
    // LEFT joins: a tiny group can lose >b−hiIdx replicas to the
    // all-zero-weight filter, leaving no hiIdx-th order statistic. Such
    // a group must surface with NULL CI bounds (visibly degraded), not
    // silently vanish from the readout.
    point.join(lo, Seq("group"), "left").join(hi, Seq("group"), "left")
      .select(col("group"), col("n_units"),
        round(col("sv").cast("double") / col("n_units").cast("double"), 6).as("mean_r"),
        round(col("lo"), 6).as("lo_r"), round(col("hi"), 6).as("hi_r"))
  }
}
