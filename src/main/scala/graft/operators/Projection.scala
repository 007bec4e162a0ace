package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Seeded ±1 random projection (the database-friendly
  * Johnson–Lindenstrauss transform of Achlioptas, JCSS 2003 — public
  * method): dimensionality reduction BEFORE similarity search, the
  * standard move when 100 TB of high-dim embeddings make even IVF
  * bucket scans memory-bound. Projecting to `outDim` keeps pairwise
  * geometry within JL distortion while cutting vector bytes ~4×/dim
  * (and the integer output composes with the int8/PQ quantizers).
  *
  * Engine-exact determinism: inputs land in ×10³ fixed point first,
  * the projection matrix entry sign(j,i) is derived from the public
  * [[TextFns.hash60]] formula on "j:i" (no RNG state — any engine
  * re-derives the same matrix), and each output coordinate is an exact
  * integer Σ ±eᵢ — order-free, so partitioning and engine cannot
  * change a single bit. Magnitudes stay far inside int64: |proj| ≤
  * inDim·10³·max|e|.
  *
  * Scale shape: a pure per-row codegen projection (zip_with +
  * aggregate over the embedding array) — zero shuffle, zero driver
  * involvement; the sign matrix is outDim·inDim PLAN LITERALS, not a
  * broadcast table.
  */
object Projection {

  /** Sign of matrix entry (j, i) — public formula, replayable in SQL as
    * `hash60(j || ':' || i) % 2`. */
  def signOf(j: Int, i: Int): Long =
    if (TextFns.hash60Value(s"$j:$i") % 2 == 0) 1L else -1L

  /** @return (id, proj array<long> of length outDim, norm2 = Σ projⱼ²) */
  def signProject(df: DataFrame, id: Column, emb: Column,
                  inDim: Int, outDim: Int): DataFrame = {
    require(inDim >= 1 && outDim >= 1, s"dims must be >= 1, got $inDim, $outDim")
    val efp = transform(emb.cast("array<double>"),
      x => round(x * lit(1000d), 0).cast("long"))
    val projCols = (0 until outDim).map { j =>
      val signs = array((0 until inDim).map(i => lit(signOf(j, i))): _*)
      aggregate(zip_with(col("__efp"), signs, (x, s) => x * s),
        lit(0L), (acc, v) => acc + v)
    }
    df.select(id.as("vec_id"), efp.as("__efp"))
      .select(col("vec_id"), array(projCols: _*).as("proj"))
      .withColumn("norm2",
        aggregate(col("proj"), lit(0L), (acc, v) => acc + v * v))
  }
}
