package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** CUPED variance-reduced experiment readout (Controlled-experiment
  * Using Pre-Experiment Data: Deng, Xu, Kohavi & Walker, WSDM 2013 —
  * public method): adjust each unit's outcome by its own pre-period
  * covariate, Y′ = Y − θ·(X − X̄) with θ = cov(X, Y)/var(X), which
  * removes the between-user variance the experiment didn't cause —
  * the standard way to make an A/B readout sensitive without more
  * traffic. Arm means of Y′ shift by −θ·(X̄ₐᵣₘ − X̄), so only
  * per-arm SUMS are needed, never per-unit adjusted rows.
  *
  * Engine-exact determinism (the q168 discipline): unit-level X/Y are
  * integer cents; every moment (Σx, Σy, Σxy, Σx²) is a decimal-exact
  * sum cast back to int64; θ and the adjusted means become doubles
  * only in the final fixed-shape ratio expressions, which replay
  * bit-for-bit in SQL.
  *
  * Scale shape: one unit-level aggregation (the only corpus shuffle),
  * one arm-level aggregation over units, one grand aggregate
  * broadcast as a single row. θ is pooled across arms (the standard
  * estimator — under randomization X ⊥ arm, so pooling is unbiased
  * and halves the estimator noise).
  *
  * @return one row per arm: (arm, n_units, sum_x, sum_y, mean_y_r,
  *         adj_mean_y_r, theta_r) — `_r` columns rounded to 6.
  */
object Cuped {

  def adjustedMeans(df: DataFrame, unit: Column, arm: Column,
                    x: Column, y: Column): DataFrame = {
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    def dsum(c: Column) = sum(dec(c)).cast("long")
    val units = df.groupBy(unit.as("unit"))
      .agg(first(arm).as("arm"), dsum(x).as("ux"), dsum(y).as("uy"))
      .localCheckpoint(false) // feeds the grand moments AND the arm sums
    // Cross products multiply IN decimal(38): ux·uy in int64 wraps at
    // |u| ≳ 3e9 cents, exactly the warehouse volumes the decimal
    // contract exists for. Σ-moments stay decimal (never cast to long —
    // they are intermediates, not outputs).
    val grand = units.agg(
      count(lit(1)).as("n_all"), dsum(col("ux")).as("sx_all"),
      dsum(col("uy")).as("sy_all"),
      sum(dec(col("ux")) * dec(col("uy"))).as("sxy_all"),
      sum(dec(col("ux")) * dec(col("ux"))).as("sxx_all"))
    val arms = units.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_units"), dsum(col("ux")).as("sum_x"),
        dsum(col("uy")).as("sum_y"))
    // θ numerator/denominator built entirely in decimal(38) — the
    // n·Σxy − Σx·Σy products overflow int64 at corpus totals; only the
    // final ratio drops to double.
    val theta = (dec(col("n_all")) * col("sxy_all") -
        dec(col("sx_all")) * dec(col("sy_all"))).cast("double") /
      (dec(col("n_all")) * col("sxx_all") -
        dec(col("sx_all")) * dec(col("sx_all"))).cast("double")
    arms.crossJoin(broadcast(grand))
      .withColumn("theta", theta)
      .withColumn("mean_y", col("sum_y").cast("double") / col("n_units").cast("double"))
      .withColumn("adj_mean_y",
        col("mean_y") - col("theta") *
          (col("sum_x").cast("double") / col("n_units").cast("double") -
            col("sx_all").cast("double") / col("n_all").cast("double")))
      .select(col("arm"), col("n_units"), col("sum_x"), col("sum_y"),
        round(col("mean_y"), 6).as("mean_y_r"),
        round(col("adj_mean_y"), 6).as("adj_mean_y_r"),
        round(col("theta"), 6).as("theta_r"))
  }
}
