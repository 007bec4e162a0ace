package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join helpers for 100 TB-scale plans.
  *
  * AQE's skew-join split handles moderate skew automatically; when one
  * key is pathologically hot (a null-ish default id, a bot user), the
  * classic fix is salting: fan the hot side's rows across `salts`
  * synthetic sub-keys and replicate the other side once per salt, so the
  * hot key's rows land on `salts` reducers instead of one.
  */
object Joins {

  /** Inner equi-join with a salted left side: `left` may be skewed on
    * `key`; `right` is replicated `salts`× (so it should be the smaller
    * side — typically a dimension that is too big to broadcast but small
    * enough to replicate).
    *
    * The left salt is a deterministic hash of the whole row, so the plan
    * is stable across retries; any salt assignment yields the same join
    * result. Result columns = left columns ++ right columns (join key
    * deduplicated), exactly like `left.join(right, key)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLeft.join(explodedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Range (interval) join: rows of `points` whose `pointCol` lies in
    * `[loCol, hiCol]` of `intervals` — WITHOUT the cartesian product a
    * plain `BETWEEN` join plans. Both sides bucketize onto fixed-width
    * bins (intervals explode across every bin they overlap), the join is
    * an equi-join on the bin, and the exact `BETWEEN` filter prunes
    * bin-edge false positives. Shuffles only on the bin key; bin width
    * trades replication (wide intervals → many bins) against bucket
    * size.
    */
  def rangeJoin(points: DataFrame, pointCol: Column,
                intervals: DataFrame, loCol: Column, hiCol: Column,
                binSize: Double): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    val pb = points.withColumn("__bin", floor(pointCol / binSize).cast("long"))
    val ib = intervals.withColumn("__bin",
      explode(sequence(floor(loCol / binSize).cast("long"), floor(hiCol / binSize).cast("long"))))
    pb.join(ib, Seq("__bin"))
      .filter(pointCol >= loCol && pointCol <= hiCol)
      .drop("__bin")
  }

  /** Interval OVERLAP join: pairs where `[aLo,aHi] ∩ [bLo,bHi] ≠ ∅`
    * (closed ends) — the interval×interval sibling of [[rangeJoin]]'s
    * point-in-interval. Both sides explode across the fixed-width bins
    * they span and equi-join on the bin; a pair sharing SEVERAL bins
    * would duplicate, so instead of a `distinct` each pair is
    * attributed to ONE canonical bin — the bin holding the overlap's
    * start `max(aLo, bLo)`, which by construction is a shared bin.
    * Shuffle only on the bin key; no distinct, no cartesian. Bin width
    * trades interval replication against bucket size, exactly as in
    * [[rangeJoin]].
    *
    * Bounds are NUMERIC columns (callers join timestamps via
    * `unix_micros`); result columns = a's ++ b's, like a plain join.
    */
  def intervalJoin(a: DataFrame, aLo: Column, aHi: Column,
                   b: DataFrame, bLo: Column, bHi: Column,
                   binSize: Double): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    val ab = a.withColumn("__bin",
      explode(sequence(floor(aLo / binSize).cast("long"), floor(aHi / binSize).cast("long"))))
    val bb = b.withColumn("__bin",
      explode(sequence(floor(bLo / binSize).cast("long"), floor(bHi / binSize).cast("long"))))
    ab.join(bb, Seq("__bin"))
      .filter(aLo <= bHi && bLo <= aHi)
      .filter(col("__bin") === floor(greatest(aLo, bLo) / binSize).cast("long"))
      .drop("__bin")
  }

  /** As-of (point-in-time) join: for every left row, the single latest
    * right row with `rightTs <= leftTs` within the same `key` — the
    * time-series lookup DuckDB spells `ASOF JOIN`. One shuffle on the
    * key via the union + running-`last` window formulation (no
    * per-left-row probe, no range self-join):
    * union both sides tagged, sort within key by (ts, side) so a right
    * row at the same instant precedes the left row, carry the last seen
    * right payload forward, keep left rows.
    *
    * `rightPayload` columns are emitted nullable (no earlier right row →
    * null), like an ASOF LEFT JOIN.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col).toIndexedSeq: _*).schema.fields.toIndexedSeq)))
    val r = right
      .select((key +: rightTs +: rightPayload).distinct.map(col).toIndexedSeq: _*)
      .filter(col(rightTs).isNotNull) // ASOF never matches a NULL-ts right row
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(rightPayload.map(col).toIndexedSeq: _*))
    val lAligned = l.select(col(key), col("__ts"), col("__side"), col("__payload"),
      struct(leftCols.map(col).toIndexedSeq: _*).as("__left"))
    val rAligned = r.select(col(key), col("__ts"), col("__side"), col("__payload"),
      lit(null).cast(lAligned.schema("__left").dataType).as("__left"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val joined = lAligned.unionByName(rAligned)
      .withColumn("__match", last(when(col("__side") === 0, col("__payload")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outLeft = leftCols.map(c => col(s"__left.$c").as(c))
    val outRight = rightPayload.map(c => col(s"__match.$c").as(s"asof_$c"))
    joined.select((outLeft ++ outRight).toIndexedSeq: _*)
  }

  /** Incremental JOIN view maintenance (the delta algebra of classic
    * counting IVM, insert deltas: Blakeley et al., SIGMOD 1986 — public
    * method), the join-view complement of the aggregate IVM family
    * (q224/q236): with V = A ⋈ B materialized, applying insert deltas
    * needs only
    *   ΔV = (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    * — the four legs PARTITION the new join exactly (each output row
    * joins an old/new A row with an old/new B row, and each of the
    * four combinations appears in exactly one leg), so
    * V_prev ∪ ΔV ≡ (A_old ∪ ΔA) ⋈ (B_old ∪ ΔB) with no dedup pass.
    *
    * Scale shape: the stored view is UNIONED, never re-joined — at
    * warehouse scale ΔV is an append to the view table; each delta leg
    * BROADCASTS the delta side (deltas are small by contract, and the
    * hint keeps a 100 TB base table from shuffling to meet a
    * megabyte-scale delta). Maintenance cost ∝ |Δ| · match rate,
    * independent of |V|.
    */
  def incrementalJoinView(prevView: DataFrame, aOld: DataFrame, aDelta: DataFrame,
                          bOld: DataFrame, bDelta: DataFrame,
                          key: String): DataFrame =
    prevView
      .unionByName(broadcast(aDelta).join(bOld, key))
      .unionByName(aOld.join(broadcast(bDelta), key))
      .unionByName(broadcast(aDelta).join(bDelta, key))
}
