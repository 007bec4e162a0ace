package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 scalar quantization (SQ8) of embedding columns — the standard
  * 4× memory/bandwidth compression every large-scale vector pipeline
  * applies before ANN serving (FAISS `SQ8`, as published in Johnson et
  * al. 2017, "Billion-scale similarity search with GPUs"): per
  * dimension, affine-map [min, max] onto the int8 grid and score with
  * integer dot products. Complements [[Pq]] (coarser, codebook-based)
  * and [[Similarity]] (exact float): SQ8 is the drop-in where recall
  * must stay near-exact but floats don't fit.
  *
  * Everything downstream of the corpus min/max pass is INTEGER
  * arithmetic — scores are exact int64, so rankings (and their ties,
  * broken by id) are deterministic and oracle-checkable, the repo's
  * q115 discipline. The quantizer itself is the only float step and
  * uses just IEEE +,−,×,÷ and floor — bit-identical in any engine.
  *
  * Shape at 100 TB: the stats pass is a map-side-combined aggregate
  * down to one row per DIMENSION (64 rows here — broadcast back; never
  * a driver collect). Quantization is a narrow per-row map. Search
  * broadcasts the (small) quantized query set against the corpus —
  * same brute shape as [[Similarity.bruteTopK]] but moving int8 codes,
  * 4× less shuffle/scan than the float path; compose with IVF-style
  * bucketing for the sub-linear variant.
  */
object Quantization {

  /** Corpus per-dimension [min, max] as a single broadcastable row:
    * (mns, mxs) double arrays indexed by dimension. */
  def dimStats(df: DataFrame, vec: Column): DataFrame =
    df.select(posexplode(vec).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"), col("mx"))))
        .as("st"))
      .select(
        transform(col("st"), s => s.getField("mn")).as("mns"),
        transform(col("st"), s => s.getField("mx")).as("mxs"))

  /** Quantize `vec` to int8 codes (as int64 for arithmetic headroom):
    * `code_i = floor((x_i − mn_i)/(mx_i − mn_i)·255 + 0.5) − 128`,
    * constant dimensions → 0. Pass the SAME `stats` row for corpus and
    * queries — asymmetric stats would shift the grid. */
  def quantize(df: DataFrame, id: Column, vec: Column,
               stats: DataFrame): DataFrame =
    df.select(id.as("vec_id"), vec.as("__v"))
      .crossJoin(broadcast(stats))
      .select(col("vec_id"),
        transform(sequence(lit(1), size(col("__v"))), i => {
          val x = element_at(col("__v"), i).cast("double")
          val mn = element_at(col("mns"), i)
          val mx = element_at(col("mxs"), i)
          when(mx === mn, lit(0L))
            .otherwise(floor((x - mn) / (mx - mn) * 255d + 0.5d).cast("long") - 128L)
        }).as("codes"))

  /** Top-k neighbors per query by exact integer code dot product.
    * Inputs are [[quantize]] outputs; queries must be small (they
    * broadcast). Self-matches (same vec_id) are excluded.
    * @return (query_id, rnk, neighbor_id, score) — rnk 1..k in
    *         (score desc, neighbor_id asc) order. */
  def topKInt(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("codes").as("qc"))
    corpus.select(col("vec_id").as("neighbor_id"), col("codes").as("cc"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        aggregate(zip_with(col("qc"), col("cc"), (a, b) => a * b),
          lit(0L), (s, e) => s + e))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
  }

  /** Two-stage retrieval — the production recall/latency trade: a
    * COARSE integer dot over only the first `coarseDims` code
    * dimensions ranks `kCoarse` candidates per query (a fraction of
    * the arithmetic, and a prefix-sliced vector a columnar reader can
    * scan without the tail), then the exact full-width dot re-ranks
    * the survivors to top-k. Recall is governed by `kCoarse` and how
    * much signal the leading dimensions carry (PCA-rotated embeddings
    * front-load it); `kCoarse → corpus` recovers [[topKInt]] exactly.
    *
    * Both stages are integer with ties broken by id at BOTH cuts —
    * fully deterministic. Scale shape: the coarse cut's window runs on
    * a NARROW (query, neighbor, coarse) projection (code arrays never
    * enter the shuffle); the survivor set (queries × kCoarse rows)
    * re-joins the corpus for exact scoring — small side, AQE
    * broadcasts it. Compose the coarse stage with the IVF route when
    * the corpus scan itself must be sub-linear.
    */
  def topKTwoStage(corpus: DataFrame, queries: DataFrame, k: Int,
                   kCoarse: Int, coarseDims: Int): DataFrame = {
    require(k >= 1 && kCoarse >= k, s"need kCoarse >= k >= 1, got k=$k kCoarse=$kCoarse")
    require(coarseDims >= 1, s"coarseDims must be >= 1, got $coarseDims")
    val q = queries.select(col("vec_id").as("query_id"), col("codes").as("qc"))
    val corp = corpus.select(col("vec_id").as("neighbor_id"), col("codes").as("cc"))
    val survivors = corp
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("coarse",
        aggregate(
          zip_with(slice(col("qc"), 1, coarseDims), slice(col("cc"), 1, coarseDims),
            (a, b) => a * b),
          lit(0L), (s, e) => s + e))
      .select(col("query_id"), col("neighbor_id"), col("coarse"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("coarse").desc, col("neighbor_id"))))
      .filter(col("crnk") <= kCoarse)
      .select(col("query_id"), col("neighbor_id"))
    survivors
      .join(corp, "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("score",
        aggregate(zip_with(col("qc"), col("cc"), (a, b) => a * b),
          lit(0L), (s, e) => s + e))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("score"))
  }
}
