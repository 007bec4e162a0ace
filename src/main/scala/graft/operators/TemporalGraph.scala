package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-respecting graph reachability (temporal-graph earliest
  * arrival: Wu et al., "Path Problems in Temporal Graphs", VLDB 2014 —
  * public method): an edge (u, v, t) is traversable only at time
  * t ≥ the arrival time at u, so information/contagion/causality flows
  * FORWARD in time — static reachability over the same edges
  * overstates what can actually propagate.
  *
  * Round structure is label-correcting with DOMINANCE pruning: an
  * earlier arrival at a node dominates any later one (every edge
  * usable at t ≥ a₂ is usable at a₁ < a₂), so the per-node state is
  * ONE long (the best arrival), each round expands only nodes whose
  * best improved (the Bellman-Ford discipline of the weighted-paths
  * operator), and the result after H rounds equals the full
  * enumeration of ≤H-hop time-respecting paths — which is exactly
  * what the oracle's level-by-level replay enumerates.
  *
  * Scale shape: per round one frontier⋈edges shuffle + one min
  * aggregate keyed on the destination; state is one row per REACHED
  * node, never per path. Rounds are hop-bounded by the caller
  * (temporal paths are short in practice — each hop must move
  * forward in time).
  *
  * @param edges   (src, dst, t)
  * @param sources (node) — start set, arrival 0
  * @return (node, arrival) for every node reachable within maxHops
  */
object TemporalGraph {

  def earliestArrival(edges: DataFrame, sources: DataFrame,
                      maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(col("src"), col("dst"), col("t")).localCheckpoint(false)
    var best = sources.select(col("node"), lit(0L).as("arrival")).localCheckpoint(false)
    var frontier = best
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val reached = frontier.join(e, col("node") === col("src"))
        .filter(col("t") >= col("arrival"))
        .groupBy(col("dst").as("node2"))
        .agg(min(col("t")).as("cand"))
      val improved = reached
        .join(best, col("node2") === col("node"), "left")
        .filter(col("arrival").isNull || col("cand") < col("arrival"))
        .select(col("node2").as("node"), col("cand").as("arrival"))
        .localCheckpoint(false)
      best = best.join(improved.select(col("node").as("n2")),
          col("node") === col("n2"), "left_anti")
        .unionByName(improved)
        .localCheckpoint(false)
      frontier = improved
    }
    best
  }
}
