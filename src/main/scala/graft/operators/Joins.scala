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
}
