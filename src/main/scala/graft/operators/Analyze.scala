package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling — the equi-depth histogram + per-
  * bucket stats a cost-based layer (join reorder, partition sizing,
  * skew detection) feeds on. Equi-depth (equal ROW count per bucket)
  * beats equi-width for selectivity estimates on skewed columns: every
  * bucket carries the same evidence weight.
  *
  * Bucket assignment is pure rank arithmetic (the q124 tier rule):
  * `bucket = (pos₀ · k) div n` over the GLOBAL rank from
  * [[Packing.globalRowNumber]]'s two-phase prefix sum — the column
  * never crosses a single-reducer window, and the rank order
  * `(value, tie)` is total, so the histogram is deterministic under
  * any partitioning and engine. A run of duplicate values may split
  * across a bucket boundary (rank-based equi-depth, the standard
  * trade); bucket sizes are exact: n div k or n div k + 1.
  */
object Analyze {

  /** ANALYZE TABLE-style per-column statistics in ONE scan — the
    * row-count / null-fraction / NDV table a cost-based optimizer
    * estimates selectivity and join order from, plus the HLL++
    * estimate with a within-5% certificate (the q61 contract: at
    * 100 TB the exact NDV leg drops and the sketch IS the statistic;
    * here both run so the estimate is pinned against truth). All
    * columns' aggregates evaluate in a single `agg` (one pass, one
    * partial-aggregation tree), then an explode over per-column structs
    * unpivots the single row — no per-column scans, no driver loop.
    *
    * Caller-supplied names never reach a SQL string: internal aliases
    * are INDEX-based and the reported `col_name` is a `lit` value, so a
    * name containing quotes/spaces/dots/backticks is just data
    * (ADVICE r9 — the previous `stack()` string interpolated them).
    *
    * @return one row per column: `col_name, n, n_null, ndv, hll_ok`.
    */
  def tableStats(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "tableStats needs at least one column")
    // The exact NDVs and the HLL estimates must NOT share one Aggregate:
    // multiple countDistincts rewrite to an Expand with one group per
    // (value, gid), and every regular aggregate in the same Aggregate
    // then allocates its buffer PER GROUP — for approx_count_distinct at
    // rsd 0.02 that is a ~3 KB sketch per distinct value per column
    // (gigabytes at 100 K rows, unbounded at scale). Two aggregates over
    // the same scan keep the sketch count at |cols|: the exact leg's
    // expand carries only long counters, the HLL leg is a plain
    // single-group partial aggregation. The single-row results
    // broadcast-join back together (plan-asserted BroadcastNestedLoopJoin
    // on literally one row each).
    val exactAggs = cols.zipWithIndex.flatMap { case ((_, c), i) =>
      Seq(count(c).as(s"__cnt_$i"), countDistinct(c).as(s"__ndv_$i"))
    }
    val sketchAggs = cols.zipWithIndex.map { case ((_, c), i) =>
      approx_count_distinct(c, 0.02).as(s"__andv_$i")
    }
    val row = df.agg(count(lit(1)).as("__n"), exactAggs: _*)
      .crossJoin(broadcast(df.agg(sketchAggs.head, sketchAggs.tail: _*)))
    val cells = cols.zipWithIndex.map { case ((nm, _), i) =>
      struct(lit(nm).as("col_name"), col(s"__cnt_$i").as("__cnt"),
        col(s"__ndv_$i").as("ndv"), col(s"__andv_$i").as("__andv"))
    }
    row.select(col("__n"), explode(array(cells: _*)).as("c"))
      .select(col("c.col_name").as("col_name"), col("c.__cnt").as("__cnt"),
        col("c.ndv").as("ndv"), col("c.__andv").as("__andv"), col("__n"))
      .select(col("col_name"), col("__n").as("n"),
        (col("__n") - col("__cnt")).as("n_null"), col("ndv"),
        (abs(col("__andv") - col("ndv")) <= col("ndv") * 0.05).as("hll_ok"))
  }

  /** @param value the column to profile
    * @param tie   a unique tiebreak making the rank order total
    * @param k     bucket count
    * @return k rows: `bucket (0..k−1), lo, hi, n_rows, ndv` — exact
    *         per-bucket min/max/count/distinct-count. */
  def equiDepthHistogram(df: DataFrame, value: Column, tie: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.select(value.as("v"), tie.as("t"))
    val ranked = Packing.globalRowNumber(base, struct(col("v"), col("t")), "pos")
    ranked
      .crossJoin(broadcast(base.agg(count(lit(1)).as("n"))))
      .withColumn("bucket", expr(s"((pos - 1) * $k) div n"))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n_rows"), countDistinct(col("v")).as("ndv"))
  }
}
