package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier calibration audit — reliability bins + expected
  * calibration error (Naeini et al. AAAI 2015's ECE; public method):
  * does "the model said 0.8" actually mean "right 80% of the time"?
  * AUC (q251) and threshold sweeps (q252) grade RANKING; calibration
  * grades the probabilities themselves — the property that decides
  * whether scores can gate pipelines ("drop below 0.3") without a
  * human re-threshold per model version.
  *
  * Determinism discipline: confidences arrive as INTEGER milli-units;
  * each equal-width bin's (n, Σconf_milli, n_pos) are exact longs, and
  * the per-bin mean-confidence / accuracy / |gap| plus the
  * n-weighted ECE are fixed-shape double ratios of those exact
  * integers — engine-replayable bit-for-bit, no float accumulation.
  *
  * Scale shape: ONE hash aggregate to the bin level (`bins` rows, a
  * constant), then window arithmetic over that constant-size frame —
  * the corpus is touched once, nothing is ever per-row beyond the
  * projection.
  *
  * @param confMilli integer confidence in [0, 1000)
  * @param label     1/0 outcome column
  * @return one row per non-empty bin: (bin, n, n_pos, sum_conf_milli,
  *         conf_r, acc_r, gap_r, ece_r) — `_r` rounded to 6; ece_r is
  *         the same corpus-level value on every row
  */
object Calibration {

  def eceBins(df: DataFrame, confMilli: Column, label: Column,
              bins: Int = 10): DataFrame = {
    require(bins >= 2 && 1000 % bins == 0,
      s"bins must divide the milli scale, got $bins")
    val width = 1000L / bins
    val binned = df
      .select(call_function("div", confMilli.cast("long"), lit(width)).as("bin"),
        confMilli.cast("long").as("cm"), label.cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("cm")).as("sum_conf_milli"))
      .withColumn("conf", col("sum_conf_milli").cast("double") /
        (col("n").cast("double") * 1000.0))
      .withColumn("acc", col("n_pos").cast("double") / col("n").cast("double"))
      .withColumn("gap", abs(col("acc") - col("conf")))
      .localCheckpoint(false) // bins-sized; feeds the rows AND the ECE total
    val totals = binned.agg(
      sum(col("n").cast("double") * col("gap")).as("sg"),
      sum(col("n")).cast("double").as("sn"))
    binned.crossJoin(broadcast(totals))
      .select(col("bin"), col("n"), col("n_pos"), col("sum_conf_milli"),
        round(col("conf"), 6).as("conf_r"), round(col("acc"), 6).as("acc_r"),
        round(col("gap"), 6).as("gap_r"),
        round(col("sg") / col("sn"), 6).as("ece_r"))
  }
}
