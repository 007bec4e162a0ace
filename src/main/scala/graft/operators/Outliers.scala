package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space outlier scoring against per-class centroids — the
  * label-noise / off-distribution audit step (the shape behind CLIP
  * score filtering and "active cleaning" passes): embed every example,
  * average per class, and flag the members farthest from their own
  * class centroid as candidate mislabels / junk.
  *
  * Everything is INTEGER fixed-point so the ranking is engine- and
  * partitioning-exact: vectors land on a `floor(x·S + 0.5)` grid
  * (the q121 quantizer discipline), centroids are FLOOR-divided
  * (explicit `(s − posmod(s,n)) div n` — Spark's `div` truncates
  * toward zero while DuckDB's `//` floors, so neither builtin is
  * portable on negative sums), and the score is the exact int64
  * squared L2 distance on the grid.
  *
  * Shape at 100 TB: one narrow per-dim explode feeding a map-side
  * combined `(label, dim)` aggregate → (classes × dims) rows →
  * centroid table BROADCASTS back onto the corpus; distance is a
  * per-row zip_with fold; the only wide stage is the per-class top-m
  * window, and it moves (label, id, dist) triplets. Linear scan,
  * no all-pairs anywhere.
  */
object Outliers {

  /** Exact floor division that both engines replay bit-for-bit:
    * subtract the positive remainder, then divide with INTEGER `div` —
    * after the subtraction the quotient is exact, so truncate-vs-floor
    * no longer matters, and unlike `/` (double division) int64 `div`
    * cannot lose precision past 2^53 (ADVICE r8). */
  private def floorDiv(s: Column, n: Column): Column =
    call_function("div", s - ((s % n) + n) % n, n)

  /** Quantize to the integer grid: `floor(x·scale + 0.5)` per dim. */
  private def gridCodes(vec: Column, scale: Int): Column =
    transform(vec, x => floor(x.cast("double") * scale + 0.5d).cast("long"))

  /** Per-class integer centroids at the same grid scale.
    * @return (label, centroid: array<long>) — classes × dims small. */
  def classCentroids(df: DataFrame, label: Column, vec: Column,
                     scale: Int = 1024): DataFrame =
    df.select(label.as("label"), posexplode(gridCodes(vec, scale)).as(Seq("pos", "q")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"), floorDiv(col("s"), col("n")).as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("st"))
      .select(col("label"), transform(col("st"), s => s.getField("c")).as("centroid"))

  /** Top-m farthest members per class by exact grid distance-squared.
    * @return (label, vec_id, dist2, rank) — rank 1..m per label in
    *         (dist2 desc, vec_id asc) order. */
  def centroidOutliers(df: DataFrame, id: Column, label: Column, vec: Column,
                       m: Int, scale: Int = 1024): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val cents = classCentroids(df, label, vec, scale)
    df.select(id.as("vec_id"), label.as("label"), gridCodes(vec, scale).as("q"))
      .join(broadcast(cents), "label")
      .withColumn("dist2",
        aggregate(zip_with(col("q"), col("centroid"), (a, b) => (a - b) * (a - b)),
          lit(0L), (s, e) => s + e))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("dist2").desc, col("vec_id"))))
      .filter(col("rank") <= m)
      .select(col("label"), col("vec_id"), col("dist2"), col("rank"))
  }
}
