package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Rendezvous (highest-random-weight) shard routing — Thaler &
  * Ravishankar, IEEE/ACM ToN 1998 (public method): a key routes to
  * `argmax_shard hash(shard, key)`. Unlike `key mod N` (where changing
  * N remaps nearly EVERY key), adding a shard moves exactly the keys
  * whose new-shard hash wins — an expected 1/(N+1) of them, and every
  * move lands ON the new shard. That minimal-disruption law is what
  * makes shard topology changes survivable for a 100 TB keyed store
  * (cache locality, bucketed layouts, consumer assignment).
  *
  * Engine-exact: weights are [[TextFns.hash60]]("shard:key"), the
  * argmax is an `array_max` over (hash, shard) structs — total order
  * with shard-name tie-break, zero shuffle, pure per-row codegen; the
  * shard list is plan literals.
  */
object Rendezvous {

  def assign(key: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      s"shards must be non-empty and distinct, got $shards")
    array_max(array(shards.map { sh =>
      struct(TextFns.hash60(concat(lit(s"$sh:"), key.cast("string"))).as("h"),
        lit(sh).as("s"))
    }: _*)).getField("s")
  }
}
