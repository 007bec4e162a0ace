package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the compressed-vector ANN path that
  * makes 100 TB-scale similarity search affordable where even IVF over
  * full-precision vectors is not: each vector splits into `m`
  * subvectors, each subvector is quantized to one of `ksub` trained
  * codewords, and the stored representation drops from `d` floats to
  * `m` small codes (e.g. 768 floats → 8 bytes at m=8, ksub=256).
  * Search uses asymmetric distance computation (ADC): per query, one
  * small lookup table of query-chunk ↔ codeword distances, then every
  * candidate's approximate distance is `m` table lookups — no float
  * vector is ever read at scan time. (Jégou/Douze/Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — public
  * algorithm.)
  *
  * Scale shapes, all pure DataFrame ops:
  *  - training: per-chunk Lloyd's over ALL chunks at once — the chunk
  *    id simply joins the groupBy key, so m codebooks train in the
  *    same number of shuffles as one k-means ([[Similarity
  *    .trainCentroids]]'s shape), with the same [[Truncation]] seam;
  *  - encoding: broadcast codebooks, two-level partial aggregation
  *    (argmin per (vec, chunk), collect per vec) — one shuffle on
  *    vec_id;
  *  - ADC search: the per-query LUT is a broadcast of kilobytes; the
  *    codes table streams through map-side `aggregate` lookups and a
  *    per-query top-k window. The corpus side never shuffles.
  *
  * Vector dimension must be divisible by `m` (chunks are
  * `slice`-based).
  */
object Pq {

  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** (vec_id, chunk, sub) — vector split into m equal slices. */
  private[operators] def chunks(vectors: DataFrame, m: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    vectors
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"), explode(expr(
        s"""transform(sequence(0, $m - 1),
           |  i -> struct(i AS chunk,
           |              slice(emb, i * (size(emb) div $m) + 1, size(emb) div $m) AS sub))"""
          .stripMargin)).as("c"))
      .select(col("vec_id"), col("c.chunk").as("chunk"), col("c.sub").as("sub"))
  }

  /** Train the m per-chunk codebooks with Lloyd's iterations (L2, the
    * classic PQ objective). Deterministic: init = the `ksub` lowest-id
    * vectors' chunks (code = rank of the id); a codeword that loses all
    * members keeps its position, so every (chunk, code) slot stays
    * populated. Output: (chunk, code, centroid).
    */
  def trainCodebooks(corpus: DataFrame, m: Int, ksub: Int, iters: Int,
                     truncation: Truncation = Truncation.Local): DataFrame = {
    require(ksub >= 1, s"ksub must be >= 1, got $ksub")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val base = truncation.truncate(chunks(corpus, m), 0)
    val initIds = corpus.select(col("vec_id")).orderBy(col("vec_id")).limit(ksub)
      .withColumn("code", row_number().over(Window.orderBy(col("vec_id"))) - 1)
    var cb = truncation.truncate(
      base.join(broadcast(initIds), "vec_id")
        .select(col("chunk"), col("code"), col("sub").as("centroid")),
      0)
    for (i <- 1 to iters) {
      val assigned = base.join(broadcast(cb), "chunk")
        .withColumn("d", l2sq(col("sub"), col("centroid")))
        .groupBy(col("vec_id"), col("chunk"))
        .agg(min_by(struct(col("code"), col("sub")),
          struct(col("d"), col("code"))).as("a"))
        .select(col("chunk"), col("a.code").as("code"), col("a.sub").as("sub"))
      val means = assigned
        .select(col("chunk"), col("code"), posexplode(col("sub")))
        .groupBy(col("chunk"), col("code"), col("pos"))
        .agg(avg(col("col")).as("mv"))
        .groupBy(col("chunk"), col("code"))
        .agg(sort_array(collect_list(struct(col("pos"), col("mv")))).as("pm"))
        .select(col("chunk"), col("code"), col("pm.mv").as("centroid"))
      cb = truncation.truncate(
        means.unionByName(cb.join(means, Seq("chunk", "code"), "left_anti")),
        i)
    }
    cb
  }

  /** Quantize every corpus vector to its m nearest codewords. Output:
    * (vec_id, codes) with `codes(i)` = chunk i's codeword id — the
    * compressed table a deployment PERSISTS in place of the float
    * vectors. */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int): DataFrame =
    chunks(corpus, m).join(broadcast(codebooks), "chunk")
      .withColumn("d", l2sq(col("sub"), col("centroid")))
      .groupBy(col("vec_id"), col("chunk"))
      .agg(min(struct(col("d"), col("code"))).as("best"))
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("chunk"), col("best.code").as("code")))).as("cc"))
      .select(col("vec_id"), col("cc.code").as("codes"))

  /** Per-query flat ADC lookup table: exact query-to-codeword distances
    * ordered (chunk, code), so entry `chunk·ksub + code` is a flat-array
    * lookup. Kilobytes per query — always broadcastable. */
  private def queryLut(queries: DataFrame, codebooks: DataFrame, m: Int): DataFrame =
    chunks(queries, m).join(broadcast(codebooks), "chunk")
      .withColumn("d", l2sq(col("sub"), col("centroid")))
      .groupBy(col("vec_id").as("query_id"))
      .agg(sort_array(collect_list(struct(col("chunk"), col("code"), col("d")))).as("l"))
      .select(col("query_id"), col("l.d").as("lut"))

  private def adcDistance(m: Int, ksub: Int): Column = expr(
    s"aggregate(transform(sequence(0, $m - 1), i -> lut[i * $ksub + codes[i]]), 0D, (acc, x) -> acc + x)")

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("adist").asc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        round(col("adist"), 6).as("adist"))
  }

  /** Asymmetric-distance top-k over the WHOLE codes table: approximate
    * query-to-vector distance = sum of m LUT lookups over the
    * candidate's codes. Ties break on neighbor id. Output: (query_id,
    * rnk, neighbor_id, adist).
    */
  def adcTopK(codes: DataFrame, queries: DataFrame, codebooks: DataFrame,
              m: Int, ksub: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val scored = codes
      .join(broadcast(queryLut(queries, codebooks, m)), col("vec_id") =!= col("query_id"))
      .withColumn("adist", adcDistance(m, ksub))
    topK(scored, k)
  }

  /** IVF-PQ — the production composition: a coarse quantizer
    * ([[Similarity.assign]], nearest of `centroids`) routes every
    * vector to ONE bucket at encode time; at search time the query
    * probes its `nprobe` nearest buckets and ADC runs only inside them.
    * The scan shrinks from |corpus| to the probed buckets' share while
    * each candidate still costs m lookups — IVF prunes, PQ compresses.
    * Recall rises with `nprobe` and reaches [[adcTopK]] at `nprobe =
    * numCentroids`. At 100 TB both inputs are persisted tables: (vec,
    * bucket, codes) and the two codebooks.
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
                 codebooks: DataFrame, m: Int, ksub: Int, k: Int,
                 nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val bucketed = encode(corpus, codebooks, m)
      .join(Similarity.assign(corpus, centroids).select(col("vec_id"), col("centroid_id")),
        "vec_id")
    val probes = Similarity.assignTopN(queries, centroids, nprobe)
      .select(col("vec_id").as("query_id"), col("centroid_id"))
    val lut = queryLut(queries, codebooks, m).join(probes, "query_id")
    val scored = bucketed
      .join(broadcast(lut),
        bucketed("centroid_id") === lut("centroid_id") && col("vec_id") =!= col("query_id"))
      .withColumn("adist", adcDistance(m, ksub))
    topK(scored, k)
  }
}
