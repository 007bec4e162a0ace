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

  /** Consistent-hash RING routing with virtual nodes (Karger et al.,
    * STOC 1997 — public method): each node owns `vnodes` ring points at
    * hash60("node#v"); a key at hash60(key) routes to its CLOCKWISE
    * SUCCESSOR — the smallest ring point above the key's hash, wrapping
    * to the global minimum. The ring's disruption law differs from
    * [[assign]]'s HRW: adding a node moves exactly the keys in the arcs
    * its vnodes claim (still ~1/(N+1) in expectation, still landing
    * ONLY on the new node), but the ring also gives RANGE ownership —
    * each node owns contiguous hash arcs, the property partitioned
    * stores use for range scans and replication chains, and `vnodes`
    * trades arc-size variance against routing-table size (HRW has no
    * such knob; at N·V beyond ~10³ points per-row codegen argmin favors
    * HRW).
    *
    * Engine-exact, zero shuffle: the successor pick is an `array_min`
    * over (wrapped, point-hash, node) structs — `wrapped` = point ≤ key
    * sorts unwrapped points first, so the min IS the clockwise
    * successor (or the wraparound minimum when every point is below the
    * key); ring points are plan literals, constant-folded.
    */
  def ringAssign(key: Column, nodes: Seq[String], vnodes: Int): Column = {
    require(nodes.nonEmpty && nodes.distinct.size == nodes.size,
      s"nodes must be non-empty and distinct, got $nodes")
    require(vnodes >= 1, s"vnodes must be >= 1, got $vnodes")
    val h = TextFns.hash60(key.cast("string"))
    val points = for { n <- nodes; v <- 0 until vnodes } yield {
      val ph = TextFns.hash60(lit(s"$n#$v"))
      struct((ph <= h).cast("int").as("wrapped"), ph.as("ph"), lit(n).as("node"))
    }
    array_min(array(points: _*)).getField("node")
  }
}
