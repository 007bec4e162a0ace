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

  /** (vec_id, chunk, sub) — vector split into m equal slices. The
    * divisibility requirement is ENFORCED, in-plan (`raise_error` on the
    * first offending row, no extra driver probe job per call): silent
    * truncation of trailing dims would quietly change every distance. */
  private[operators] def chunks(vectors: DataFrame, m: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    vectors
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"), explode(expr(
        s"""CASE WHEN size(emb) % $m != 0 THEN
           |  raise_error(concat('vector dimension ', CAST(size(emb) AS STRING),
           |    ' is not divisible by m=$m subvectors - trailing dimensions',
           |    ' would be silently dropped from every distance'))
           |ELSE transform(sequence(0, $m - 1),
           |  i -> struct(i AS chunk,
           |              slice(emb, i * (size(emb) div $m) + 1, size(emb) div $m) AS sub))
           |END""".stripMargin)).as("c"))
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
    truncation.finish(cb)
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

  /** The codebook's codewords-per-chunk, derived from the data rather
    * than trusted from a caller parameter: a wrong ksub would misindex
    * the flat LUT silently (or throw an opaque ANSI array-index error).
    * The codebook frame is tiny and post-training already materialized,
    * so the scalar action is cheap. */
  private def ksubOf(codebooks: DataFrame): Int = {
    val r = codebooks.agg(max(col("code"))).head()
    require(!r.isNullAt(0), "codebooks frame is empty — train codebooks first " +
      "(or check the index path)")
    r.getInt(0) + 1
  }

  /** Per-query flat ADC lookup table: exact query-to-codeword distances
    * ordered (chunk, code), so entry `chunk·ksub + code` is a flat-array
    * lookup (training keeps every (chunk, code) slot populated, so the
    * layout is dense). Kilobytes per query — always broadcastable. */
  private def queryLut(queries: DataFrame, codebooks: DataFrame, m: Int): DataFrame =
    chunks(queries, m).join(broadcast(codebooks), "chunk")
      .withColumn("d", l2sq(col("sub"), col("centroid")))
      .groupBy(col("vec_id").as("query_id"))
      .agg(sort_array(collect_list(struct(col("chunk"), col("code"), col("d")))).as("l"))
      .select(col("query_id"), col("l.d").as("lut"))

  private def adcDistance(m: Int, ksub: Int): Column = expr(
    s"aggregate(transform(sequence(0, $m - 1), i -> lut[i * $ksub + codes[i]]), 0D, (acc, x) -> acc + x)")

  /** L2 nearest-centroid bucket per vector (ties → lowest id) — the
    * coarse quantizer. Deliberately L2, matching the ADC metric: a
    * cosine router ([[Similarity.assign]]) would probe the wrong
    * buckets for non-normalized corpora. */
  private def assignL2(vectors: DataFrame, centroids: DataFrame, n: Int): DataFrame = {
    val c = centroids.select(col("vec_id").as("centroid_id"),
      col("embedding").cast("array<double>").as("centroid"))
    vectors
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .join(broadcast(c))
      .withColumn("cd", l2sq(col("emb"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(slice(sort_array(collect_list(
        struct(col("cd"), col("centroid_id")))), 1, n).as("near"))
      .select(col("vec_id"), explode(col("near.centroid_id")).as("centroid_id"))
  }

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
              m: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ksub = ksubOf(codebooks)
    val scored = codes
      .join(broadcast(queryLut(queries, codebooks, m)), col("vec_id") =!= col("query_id"))
      .withColumn("adist", adcDistance(m, ksub))
    topK(scored, k)
  }

  /** One-time IVF-PQ index build — THE table a deployment persists in
    * place of the float vectors: every vector's bucket (L2
    * nearest-centroid coarse quantizer, matching the ADC metric) plus
    * its m PQ codes. Output: (vec_id, codes, centroid_id).
    */
  def bucketedEncode(corpus: DataFrame, centroids: DataFrame, codebooks: DataFrame,
                     m: Int): DataFrame =
    encode(corpus, codebooks, m)
      .join(assignL2(corpus, centroids, 1), "vec_id")

  /** IVF-PQ search — the production composition over a PRE-BUILT
    * [[bucketedEncode]] index (searching must not re-encode the corpus:
    * the whole point is that only codes and codebooks are read). The
    * query probes its `nprobe` L2-nearest buckets and ADC runs only
    * inside them: the scan shrinks from |corpus| to the probed buckets'
    * share while each candidate still costs m lookups — IVF prunes, PQ
    * compresses. Recall rises with `nprobe` and reaches [[adcTopK]] at
    * `nprobe = numCentroids`.
    */
  def ivfAdcTopK(index: DataFrame, queries: DataFrame, centroids: DataFrame,
                 codebooks: DataFrame, m: Int, k: Int,
                 nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val ksub = ksubOf(codebooks)
    val probes = assignL2(queries, centroids, nprobe)
      .select(col("vec_id").as("query_id"), col("centroid_id"))
    val lut = queryLut(queries, codebooks, m).join(probes, "query_id")
    val scored = index
      .join(broadcast(lut),
        index("centroid_id") === lut("centroid_id") && col("vec_id") =!= col("query_id"))
      .withColumn("adist", adcDistance(m, ksub))
    topK(scored, k)
  }
}
