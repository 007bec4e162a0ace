package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Differentially-private release mechanisms — the fourth leg of the
  * release-privacy family (after the q227 k-anonymity, q286
  * l-diversity, and q294 t-closeness AUDITS, which measure leak risk
  * but release exact counts anyway). Here the released statistic
  * itself is privatized.
  *
  * Mechanism: Warner's randomized response (1965), the canonical LOCAL
  * DP mechanism — each record's sensitive bit is reported truthfully
  * with probability p = 1 − flipNum/flipDen and flipped otherwise,
  * giving ε = ln(p/(1−p)) = ln((flipDen−flipNum)/flipNum) local
  * differential privacy per record. The aggregate is then debiased
  * EXACTLY in integer arithmetic: E[R] = (1−p)·N + (2p−1)·T, so
  * T̂ = (R − (1−p)N)/(2p−1) = (flipDen·R − flipNum·N)/(flipDen−2·flipNum)
  * — released as an exact integer numerator/denominator pair, never a
  * float division (house fixed-point discipline: the release replays
  * bit-for-bit on any engine).
  *
  * The coin is a DETERMINISTIC seeded hash of the record id
  * ([[TextFns.hash60]], uniform on [0, 2^60)) — flip iff
  * `hash60("rr:"||id) % flipDen < flipNum`. A keyed-hash coin is what a
  * production privacy pipeline uses anyway (re-runs must release the
  * SAME noise — fresh noise per run is a sequential-composition leak),
  * and it makes the whole mechanism oracle-replayable.
  *
  * Shape at 100 TB: one projection (the per-record coin is a hash, no
  * shuffle) + one hash aggregate to the group frame. Nothing collects.
  * Reference: kinesis-s3 has no privacy operator; semantics follow
  * Warner 1965 / Dwork-Roth ch. 12 as published.
  */
object Privacy {

  /** Per-group randomized-response release of `Σ truth`.
    *
    * @param truth   sensitive per-record bit (boolean column)
    * @param id      stable record id seeding the per-record coin
    * @param flipNum flip probability numerator (flip iff
    *                hash % flipDen < flipNum); requires
    *                0 < flipNum and 2·flipNum < flipDen (p > 1/2,
    *                finite ε)
    * @return (grp, n, n_reported, t_hat_num, t_hat_den, eps_ppm):
    *         T̂ = t_hat_num / t_hat_den exactly; eps_ppm =
    *         round(10⁶·ln((flipDen−flipNum)/flipNum))
    */
  def rrRelease(df: DataFrame, group: Column, truth: Column, id: Column,
                flipNum: Long = 1, flipDen: Long = 4): DataFrame = {
    require(flipNum > 0 && 2 * flipNum < flipDen,
      s"need 0 < flipNum and 2*flipNum < flipDen, got $flipNum/$flipDen")
    val epsPpm = math.round(
      math.log((flipDen - flipNum).toDouble / flipNum) * 1000000d)
    val flip = TextFns.hash60(concat(lit("rr:"), id.cast("string"))) % flipDen < flipNum
    df.select(group.as("grp"), (truth =!= flip).cast("long").as("r"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("n_reported"))
      .select(col("grp"), col("n"), col("n_reported"),
        (lit(flipDen) * col("n_reported") - lit(flipNum) * col("n")).as("t_hat_num"),
        lit(flipDen - 2 * flipNum).as("t_hat_den"),
        lit(epsPpm).as("eps_ppm"))
  }
}
