package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deduplication operators over a document corpus, designed
  * shuffle-shaped for 100 TB:
  *
  *  - exact dedup: one hash-shuffle on the content hash (map-side
  *    partial agg applies; the hash is 128-bit md5 so no false merges);
  *  - near-dup: inverted-index self-join on shingles — the classic
  *    all-pairs-similarity shape (one shuffle on the shingle, one on the
  *    pair), never a cartesian product;
  *  - MinHash + banded LSH: fixed-size signatures via 2×16 min-aggregates
  *    (single shuffle, no per-seed row explosion), band-bucket join for
  *    candidates, exact-Jaccard verification only within candidates.
  */
object Dedup {

  /** Exact duplicate groups: canonical (min) doc id + group size per
    * distinct content hash. `dropDuplicates(hash)` semantics, but
    * returning the groups so callers can keep/purge.
    */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(md5(text).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct (doc_id, shingle) pairs — the inverted-index postings. */
  private def postings(docs: DataFrame, id: Column, text: Column, w: Int): DataFrame =
    docs.select(id.as("doc_id"), explode(TextFns.shingles(text, w)).as("shingle"))

  /** Exact Jaccard similarity over w-shingle sets for all pairs meeting
    * `threshold`, via inverted index + count-intersections:
    * J(a,b) = |A∩B| / (|A|+|B|-|A∩B|).
    *
    * Scale: the join shuffles on the shingle; hot shingles (stopword
    * n-grams) are the skew risk — AQE skew-join handles moderate skew,
    * and a df/idf-style frequency cutoff (drop shingles appearing in
    * >X% of docs) is the production mitigation, orthogonal to the
    * semantics pinned here.
    */
  def nearDupPairs(docs: DataFrame, id: Column, text: Column,
                   threshold: Double, w: Int = 3): DataFrame = {
    val post = postings(docs, id, text, w)
    val sizes = post.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))

    val a = post.as("a")
    val b = post.as("b")
    val inter = a.join(b,
      col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))

    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "nb"), "doc_b")
      .withColumn("jacc", col("n_common") / (col("na") + col("nb") - col("n_common")))
      .filter(col("jacc") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jacc"))
  }

  /** MinHash signatures: for each doc, sig_i = min over shingles of
    * h_i(shingle), i < numPerms. Computed as numPerms min-aggregates over
    * the postings — ONE shuffle, no seed-explosion (a custom
    * TypedImperativeAggregate could fuse the explode too; the agg shape
    * is already partial+final).
    */
  def minhashSignatures(docs: DataFrame, id: Column, text: Column,
                        numPerms: Int, w: Int = 3): DataFrame = {
    val post = postings(docs, id, text, w)
    val aggs = (0 until numPerms).map(i =>
      min(TextFns.seededHash(i, col("shingle"))).as(s"sig$i"))
    post.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Banded-LSH candidate pairs from MinHash signatures: bands of
    * `rowsPerBand` signature slots; docs sharing any band key are
    * candidates. Join is on (band index, band key) — never all-pairs.
    */
  def lshCandidates(signatures: DataFrame, numPerms: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numPerms / rowsPerBand
    val bands = array((0 until numBands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws("_", (0 until rowsPerBand).map(r => col(s"sig${bnd * rowsPerBand + r}")): _*).as("key"))
    }: _*)
    val exploded = signatures
      .select(col("doc_id"), explode(bands).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
    val l = exploded.as("l")
    val r = exploded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key")
      && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup: candidates from banded LSH, then exact
    * Jaccard verification restricted to candidates (the false-positive
    * filter; false negatives are the price of LSH and deterministic for
    * a fixed hash family).
    */
  def minhashNearDups(docs: DataFrame, id: Column, text: Column,
                      threshold: Double, numPerms: Int = 16, rowsPerBand: Int = 4,
                      w: Int = 3): DataFrame = {
    val sigs = minhashSignatures(docs, id, text, numPerms, w)
    val candidates = lshCandidates(sigs, numPerms, rowsPerBand)
    val exact = nearDupPairs(docs, id, text, threshold, w)
    candidates.join(exact, Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("jacc"))
  }

  /** 32-bit SimHash over distinct tokens with the shared 60-bit hash's
    * low 32 bits: bit b of the fingerprint is set iff more than half the
    * tokens have bit b set. Computed as 32 conditional-sum aggregates —
    * one hash-agg pass, no bit explosion.
    */
  def simhash(docs: DataFrame, id: Column, text: Column, bits: Int = 32): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(TextFns.distinctTokens(text)).as("tok"))
      .withColumn("h", TextFns.hash60(col("tok")))
    val bitSums = (0 until bits).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(1)).as(s"b$b"))
    val counted = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), bitSums: _*)
    val fp = (0 until bits).map(b =>
      when(col(s"b$b") * 2 > col("n_toks"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    counted.select(col("doc_id"), fp.as("simhash"))
  }
}
