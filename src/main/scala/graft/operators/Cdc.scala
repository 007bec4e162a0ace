package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Content-defined chunking — the FastCDC/rsync idea at token
  * granularity: chunk boundaries are placed where a rolling window
  * hash satisfies `hash % modulus == 0`, so they are decided by
  * CONTENT, not position. Insert or delete text anywhere and the
  * boundaries re-synchronize a window later — shared passages produce
  * byte-identical chunks across documents at DIFFERENT offsets, which
  * is exactly what positional schemes can't see without pair-wise
  * diagonal work ([[Dedup.sharedSpans]]) and what makes CDC the
  * standard discovery pass for partial-duplicate/delta storage.
  *
  * Mechanics (all per-row array expressions — codegen'd, zero shuffle
  * until a caller aggregates fingerprints):
  *  - a boundary closes at token `j` (for `j` in `w..n-1`) when
  *    `hash60` of the w-gram ENDING at `j` ≡ 0 (mod `modulus`); the
  *    doc end is always a boundary, so chunking is total;
  *  - chunks are the token runs between consecutive boundaries;
  *    expected chunk length ≈ `modulus` grams;
  *  - fingerprint = md5 of the chunk's tokens — the dedup key.
  *
  * The whole construction is [[TextFns.hash60]]-based, so a SQL oracle
  * replays boundaries, spans, and fingerprints bit-for-bit.
  */
object Cdc {

  /** Per-chunk table: (cdc_id, chunk_idx, start_tok, n_tok, fp), chunk
    * indexes and token positions 1-based. */
  def chunks(df: DataFrame, id: Column, text: Column, w: Int, modulus: Int): DataFrame = {
    require(w >= 1, s"w must be >= 1, got $w")
    require(modulus >= 1, s"modulus must be >= 1, got $modulus")
    val toksDf = df.select(id.as("cdc_id"), TextFns.tokens(text).as("toks"))
      .withColumn("n", size(col("toks")))
    // boundary set: content-defined interior boundaries + the forced end
    val withBs = toksDf.withColumn("bs",
      concat(
        filter(
          when(col("n") > w, sequence(lit(w), col("n") - 1))
            .otherwise(array().cast("array<int>")),
          j => TextFns.hash60(concat_ws(" ", slice(col("toks"), j - w + 1, lit(w))))
            % modulus === 0),
        array(col("n"))))
    withBs
      .select(col("cdc_id"), col("toks"),
        posexplode(transform(col("bs"), (b, i) => struct(
          when(i === 0, lit(1)).otherwise(element_at(col("bs"), i) + 1).as("s"),
          b.as("e")))))
      .select(
        col("cdc_id"),
        (col("pos") + 1).cast("long").as("chunk_idx"),
        col("col.s").cast("long").as("start_tok"),
        (col("col.e") - col("col.s") + 1).cast("long").as("n_tok"),
        md5(concat_ws(" ",
          slice(col("toks"), col("col.s"), col("col.e") - col("col.s") + 1))).as("fp"))
  }

  /** [[chunks]] plus `n_docs` — how many distinct documents carry each
    * fingerprint (1 = unique content, >1 = a shared passage). One
    * fingerprint-keyed aggregation + join; the fingerprint table is the
    * thing a 100 TB delta store would persist. */
  def sharedChunks(chunkTable: DataFrame): DataFrame = {
    val counts = chunkTable.groupBy(col("fp"))
      .agg(countDistinct(col("cdc_id")).as("n_docs"))
    chunkTable.join(counts, "fp")
      .select(col("cdc_id"), col("chunk_idx"), col("start_tok"),
        col("n_tok"), col("fp"), col("n_docs"))
  }
}
