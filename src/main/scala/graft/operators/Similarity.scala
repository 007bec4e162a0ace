package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale shapes:
  *  - brute force: broadcast the (small) query set against the corpus —
  *    no shuffle on the corpus side at all, embarrassingly parallel,
  *    then a per-query top-k window (k rows per query survive the
  *    partial sort). The right baseline up to ~10^4 queries.
  *  - IVF: partition the corpus by nearest centroid once (one narrow
  *    pass + broadcast of centroids), search only the probe's bucket —
  *    the classic inverted-file ANN layout; corpus bucketing would be a
  *    materialized table at 100 TB, recomputed here for self-containment.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", VectorFns.cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs: all (a<b) pairs with
    * cosine ≥ threshold. Small corpora broadcast one side (no shuffle);
    * at cluster scale the candidate generation swaps to LSH/IVF
    * bucketing (see [[ivfTopK]]) with this as the in-bucket verifier.
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    // repartition: a single-file corpus would run the O(n²) compare on
    // one task; the nested-loop pair scan parallelizes per left row
    val a = corpus.repartition(col("vec_id"))
      .select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", VectorFns.cosine(col("ea"), col("eb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos_sim"), 6).as("sim_r"))
  }

  /** Nearest-centroid assignment (ties → lowest centroid id). */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    val scored = vectors.select(col("vec_id"), col("embedding"))
      .join(broadcast(c))
      .withColumn("csim", VectorFns.cosine(col("embedding"), col("centroid")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("centroid_id").asc)
    scored.withColumn("crnk", row_number().over(w))
      .filter(col("crnk") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
  }

  /** IVF-style ANN (nprobe=1): search only the query's centroid bucket.
    * Approximate by construction; deterministic for fixed centroids.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame, k: Int): DataFrame = {
    val assigned = assign(corpus, centroids)
    val q = assign(queries, centroids)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("centroid_id").as("qc"))
    val c = assigned.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"),
      col("centroid_id").as("cc"))
    val scored = c.join(broadcast(q), col("qc") === col("cc") && col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", VectorFns.cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("sim"))
  }
}
