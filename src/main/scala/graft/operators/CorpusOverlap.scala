package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-shard overlap matrix — the dataset-level similarity audit a
  * training pipeline runs across its SOURCES (crawl dumps, vendor
  * drops, language slices): pairwise Jaccard of shingle vocabularies,
  * estimated from per-shard MinHash signatures (Broder 1997) that are
  * tiny, mergeable, and computable in one pass. It answers "which of
  * these N corpora are near-copies?" BEFORE any doc-level dedup runs —
  * at 100 TB you drop whole redundant dumps first.
  *
  * Two outputs per shard pair: `sig_matches` (agreeing MinHash
  * coordinates out of `numPerms` — the sketch estimate, matches/perms
  * ≈ Jaccard) and the exact `jacc` for calibration. At the gate scale
  * both are cheap; at 100 TB the signature path stays one
  * map-side-combined aggregate to P rows (P = shard count) while the
  * exact path's shingle-vocabulary equi-join is the part you drop.
  *
  * The per-shard signature is the coordinate-wise MIN over all member
  * shingle hashes — exactly the MinHash of the shard's shingle SET
  * (set union ≡ elementwise min, the mergeable-sketch property), using
  * the repo's [[TextFns.minhashPerm]] family so the oracle replays it
  * bit-for-bit. Reference: kinesis-s3 has no corpus analytics; MinHash
  * semantics as published.
  */
object CorpusOverlap {

  /** Pairwise overlap for all shard pairs (part_a < part_b).
    * @return (src_a, src_b, sig_matches, jacc) ordered columns;
    *         `sig_matches` ∈ [0, numPerms], `jacc` the exact Jaccard
    *         of the two distinct-3-shingle sets (0.0 when disjoint). */
  def overlapMatrix(df: DataFrame, part: Column, text: Column,
                    numPerms: Int = 16): DataFrame = {
    require(numPerms >= 1, s"numPerms must be >= 1, got $numPerms")
    val sh = df
      .select(part.as("src"), TextFns.tokens(text).as("toks"))
      .select(col("src"), explode(TextFns.shinglesOf(col("toks"), 3)).as("shingle"))
      .distinct()

    val hashed = sh.select(col("src"), TextFns.hash60(col("shingle")).as("h"))
    val sigAggs = (0 until numPerms)
      .map(i => min(TextFns.minhashPerm(i, col("h"))).as(s"s$i"))
    val sig = hashed.groupBy(col("src")).agg(sigAggs.head, sigAggs.tail: _*)

    val sizes = sh.groupBy(col("src")).agg(count(lit(1)).as("n"))

    val inter = sh.select(col("src").as("ia"), col("shingle"))
      .join(sh.select(col("src").as("ib"), col("shingle")), "shingle")
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("c"))

    val sigA = sig.select(col("src").as("src_a") +:
      (0 until numPerms).map(i => col(s"s$i").as(s"a$i")): _*)
    val sigB = sig.select(col("src").as("src_b") +:
      (0 until numPerms).map(i => col(s"s$i").as(s"b$i")): _*)
    val matches = (0 until numPerms)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)

    sizes.select(col("src").as("src_a"), col("n").as("na"))
      .crossJoin(broadcast(sizes.select(col("src").as("src_b"), col("n").as("nb"))))
      .filter(col("src_a") < col("src_b"))
      .join(broadcast(inter),
        col("src_a") === col("ia") && col("src_b") === col("ib"), "left")
      .join(broadcast(sigA), "src_a")
      .join(broadcast(sigB), "src_b")
      .select(col("src_a"), col("src_b"),
        matches.as("sig_matches"),
        (coalesce(col("c"), lit(0L)) /
          (col("na") + col("nb") - coalesce(col("c"), lit(0L)))).as("jacc"))
  }
}
