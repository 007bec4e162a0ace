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
  * House discipline holds throughout: NO transcendental functions —
  * ε is never materialized as a float. Each mechanism releases the
  * exact integer parameters its ε derives from (a rational whose log
  * the CALLER may take, off the release path), so every released
  * number replays bit-for-bit on any engine.
  *
  * Coins are DETERMINISTIC seeded hashes ([[TextFns.hash60]], uniform
  * on [0, 2^60)). A keyed-hash coin is what a production privacy
  * pipeline uses anyway (re-runs must release the SAME noise — fresh
  * noise per run is a sequential-composition leak), and it makes the
  * whole mechanism oracle-replayable.
  *
  * Reference: kinesis-s3 has no privacy operator; semantics follow
  * Warner 1965 / Dwork-Roth ch. 12 / Ghosh-Roughgarden-Sundararajan
  * (geometric mechanism, SIAM J. Comput. 2012) as published.
  */
object Privacy {

  /** Per-group randomized-response release of `Σ truth` — Warner's
    * randomized response (1965), the canonical LOCAL DP mechanism:
    * each record's sensitive bit is reported truthfully with
    * probability p = 1 − flipNum/flipDen and flipped otherwise, giving
    * ε = ln(p/(1−p)) = ln((flipDen−flipNum)/flipNum) local
    * differential privacy per record. The aggregate is then debiased
    * EXACTLY in integer arithmetic: E[R] = (1−p)·N + (2p−1)·T, so
    * T̂ = (R − (1−p)N)/(2p−1) = (flipDen·R − flipNum·N)/(flipDen−2·flipNum)
    * — released as an exact integer numerator/denominator pair, never
    * a float division. The per-record coin is
    * `hash60("rr:"||id) % flipDen < flipNum`.
    *
    * NON-NULL CONTRACT: `truth` and `id` must be non-null — a null in
    * either makes the report bit undefined. Rows violating the
    * contract are EXCLUDED EXPLICITLY (both from `n` and from the
    * report sum, so the debiasing frame stays consistent) rather than
    * silently skewing `n_reported`; a caller that needs hard failure
    * on dirty input should validate upstream.
    *
    * Shape at 100 TB: one projection (the per-record coin is a hash,
    * no shuffle) + one hash aggregate to the group frame. Nothing
    * collects.
    *
    * @param truth   sensitive per-record bit (boolean column, non-null)
    * @param id      stable record id seeding the per-record coin
    *                (non-null)
    * @param flipNum flip probability numerator (flip iff
    *                hash % flipDen < flipNum); requires
    *                0 < flipNum and 2·flipNum < flipDen (p > 1/2,
    *                finite ε)
    * @return (grp, n, n_reported, t_hat_num, t_hat_den, eps_num,
    *         eps_den): T̂ = t_hat_num / t_hat_den exactly; the
    *         per-record ε is ln(eps_num/eps_den) with
    *         eps_num = flipDen − flipNum and eps_den = flipNum,
    *         released as the exact rational (no float log on the
    *         release path)
    */
  def rrRelease(df: DataFrame, group: Column, truth: Column, id: Column,
                flipNum: Long = 1, flipDen: Long = 4): DataFrame = {
    require(flipNum > 0 && 2 * flipNum < flipDen,
      s"need 0 < flipNum and 2*flipNum < flipDen, got $flipNum/$flipDen")
    val flip = TextFns.hash60(concat(lit("rr:"), id.cast("string"))) % flipDen < flipNum
    df.filter(truth.isNotNull && id.isNotNull)
      .select(group.as("grp"), (truth =!= flip).cast("long").as("r"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("n_reported"))
      .select(col("grp"), col("n"), col("n_reported"),
        (lit(flipDen) * col("n_reported") - lit(flipNum) * col("n")).as("t_hat_num"),
        lit(flipDen - 2 * flipNum).as("t_hat_den"),
        lit(flipDen - flipNum).as("eps_num"),
        lit(flipNum).as("eps_den"))
  }

  /** Inverse-CDF thresholds of the two-sided geometric (discrete
    * Laplace) distribution on the 2^60 coin lattice — P(Z = z) =
    * (1−α)/(1+α)·α^|z| with α = alphaNum/alphaDen, quantized to the
    * lattice: entry i (for z = −B+i, i = 0..2B−1) is
    * ⌊2^60·P(Z ≤ −B+i)⌋, computed in EXACT BigInt arithmetic (closed
    * forms: CDF(z<0) = α^{−z}/(1+α), CDF(z≥0) = 1 − α^{z+1}/(1+α)) —
    * plan-time integer constants, no libm anywhere, so any engine
    * replays the draw bit-for-bit. A draw u ∈ [0, 2^60) maps to
    * z = −B + |{i : t_i ≤ u}| (monotone thresholds ⇒ the count IS the
    * inverse CDF). B is the smallest bound with α^B·2^60 < 1, so mass
    * beyond ±B is below lattice resolution and the quantized
    * distribution saturates rather than truncating real mass.
    */
  private[graft] def dgeoThresholds(alphaNum: Long, alphaDen: Long): (Int, Array[Long]) = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"need 0 < alphaNum < alphaDen, got $alphaNum/$alphaDen")
    val lattice = BigInt(1) << 60
    val (n, d) = (BigInt(alphaNum), BigInt(alphaDen))
    // smallest B with alpha^B * 2^60 < 1  <=>  n^B * 2^60 < d^B
    var b = 1
    while (n.pow(b) * lattice >= d.pow(b)) {
      b += 1
      require(b <= 4096, s"alpha=$alphaNum/$alphaDen too close to 1 " +
        "(noise bound exceeds 4096); use a coarser alpha")
    }
    val thresholds = (0 until 2 * b).map { i =>
      val z = i - b
      val (num, den) =
        if (z < 0) (n.pow(-z) * d, d.pow(-z) * (d + n))
        else {
          val m = z + 1
          (d.pow(m) * (d + n) - n.pow(m) * d, d.pow(m) * (d + n))
        }
      ((lattice * num) / den).toLong // < 2^60, fits a long
    }.toArray
    (b, thresholds)
  }

  /** Per-group ε-DP release of a clamped SUM via the two-sided
    * geometric (discrete Laplace) mechanism — the central-DP
    * counterpart of [[rrRelease]] for magnitude statistics
    * (token-mass, revenue): each contribution is clamped to
    * [0, clampHi] (bounding the sum's sensitivity at clampHi), summed
    * exactly, and ONE integer noise draw per RELEASED STATISTIC is
    * added: Z ~ two-sided geometric with ratio α = alphaNum/alphaDen.
    * The geometric mechanism at ratio α is ln(1/α)-DP per unit of
    * sensitivity (Ghosh et al. 2012). TWO statistics are released per
    * group — the clamped sum (sensitivity clampHi, seed `dgeo:grp`)
    * and the record count (sensitivity 1, seed `dgeo_n:grp`, its own
    * independent draw): under the ADD/REMOVE adjacency the clamping
    * implies, an exact count would have unbounded privacy loss, so
    * the count is noised too. By sequential composition the group's
    * total guarantee is ε = (clampHi + 1)·ln(alphaDen/alphaNum). As
    * with every release here the accounting is EXACT INTEGERS: the
    * rational (eps_num = alphaDen, eps_den = alphaNum) and clamp_hi
    * are released; callers derive ε = (clamp_hi + 1)·ln(eps_num/
    * eps_den) off the release path.
    *
    * Each draw is a seeded lattice coin (`u = hash60(seed||grp)`)
    * inverted through the exact quantized CDF
    * ([[dgeoThresholds]]): z = −B + |{t_i ≤ u}|, evaluated in-plan as
    * a `size(filter(...))` over the plan-time threshold array — all
    * integer compares, no transcendentals, engine-replayable. One
    * noise draw per released statistic, seeded by the statistic's
    * distinct prefix + the group key, is the standard central-model
    * accounting; re-runs release the same noise by construction.
    *
    * NON-NULL CONTRACT: rows with a null `value` or null `group` are
    * EXCLUDED EXPLICITLY (from `n` and the sum both) — same rationale
    * as [[rrRelease]].
    *
    * Shape at 100 TB: one projection + one hash aggregate + an O(B)
    * array scan per GROUP (not per record). Nothing collects.
    *
    * @param value    per-record non-negative contribution (clamped to
    *                 [0, clampHi]; negatives clamp to 0)
    * @param clampHi  contribution bound = sensitivity of the sum
    * @param alphaNum noise ratio numerator — α = alphaNum/alphaDen,
    *                 smaller α ⇒ tighter noise, bigger ε
    * @return (grp, released_n, released_sum, clamp_hi, eps_num,
    *         eps_den): released_n = n + Z_n and released_sum =
    *         Σ clamp(value) + Z exactly; the true count, true clamped
    *         sum and the draws are never released separately
    */
  def dgeoSumRelease(df: DataFrame, group: Column, value: Column,
                     clampHi: Long, alphaNum: Long = 1,
                     alphaDen: Long = 2): DataFrame = {
    require(clampHi > 0, s"clampHi must be > 0, got $clampHi")
    val (b, thresholds) = dgeoThresholds(alphaNum, alphaDen)
    val thrArr = array(thresholds.map(lit(_)): _*)
    val clamped = greatest(lit(0L), least(value.cast("long"), lit(clampHi)))
    def draw(prefix: String) = {
      val u = TextFns.hash60(concat(lit(prefix), col("grp").cast("string")))
      (size(filter(thrArr, t => t <= u)) - lit(b)).cast("long")
    }
    df.filter(value.isNotNull && group.isNotNull)
      .select(group.as("grp"), clamped.as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("clamped_sum"))
      .select(col("grp"),
        (col("n") + draw("dgeo_n:")).as("released_n"),
        (col("clamped_sum") + draw("dgeo:")).as("released_sum"),
        lit(clampHi).as("clamp_hi"),
        lit(alphaDen).as("eps_num"),
        lit(alphaNum).as("eps_den"))
  }
}
