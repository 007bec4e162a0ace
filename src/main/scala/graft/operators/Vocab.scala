package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Tokenizer

/** Corpus vocabulary + out-of-vocabulary scoring — the OOV quality gate
  * of a training pipeline: build the token vocabulary by DOCUMENT
  * frequency (tokens appearing in at least `minDocFrac` of documents),
  * then score every document by the fraction of its token occurrences
  * that fall outside it. High OOV flags garbled text, wrong-language
  * fragments, and format noise that per-doc heuristics (q26/q27) miss
  * because they never see corpus-level frequencies.
  *
  * Scale shape: one distinct-(doc, token) explode feeding a map-side-
  * combining token aggregate (the vocabulary build — corpus-wide but
  * token-keyed, never a global sort or single reducer), one scalar
  * corpus count, and a BROADCAST of the vocabulary back into a per-doc
  * aggregate. The broadcast bounds the design: a `minDocFrac` low
  * enough to admit a web-scale long tail makes the vocab a join table
  * instead — same plan with `broadcast()` dropped.
  */
object Vocab {

  private val vocabMetricSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Tokens present in at least `minDocFrac` of documents (document
    * frequency, not occurrence count — repetition inside one doc
    * doesn't vote). Returns `tok, df`.
    *
    * Size bounds (VERDICT r8 #7): the frac threshold alone already
    * bounds the result — Σ df ≤ docs·distinct-tokens-per-doc, so at
    * most (avg distinct tokens per doc)/minDocFrac tokens can clear it
    * — but that bound is corpus-shape-dependent (adversarial corpora
    * fatten the per-doc distinct count). `maxVocab` makes the bound
    * BY CONSTRUCTION: keep only the top `maxVocab` passing tokens by
    * (df desc, tok — a deterministic cut). Below the cap the answer is
    * IDENTICAL (spec-pinned); the distinct-token count is observable
    * via the `vocab_df_<n>` observe metrics.
    */
  def buildByDocFreq(df: DataFrame, id: Column, text: Column,
                     minDocFrac: Double,
                     tokenizer: Tokenizer = Tokenizer.Whitespace,
                     maxVocab: Int = Int.MaxValue): DataFrame = {
    require(minDocFrac > 0.0 && minDocFrac <= 1.0,
      s"minDocFrac must be in (0,1], got $minDocFrac")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    // n_docs computed IN-PLAN (one-row aggregate cross-joined onto the
    // token counts — a broadcast of a single row): no eager driver
    // action at call time, and both the threshold and the df counts
    // evaluate inside ONE job/plan instead of an earlier count() job
    // that a non-deterministic input frame could contradict. The input
    // is still scanned twice (column-pruned to `id` for the count).
    val nDocs = df.select(id.as("doc_id")).agg(count(lit(1)).as("__n_docs"))
    val passing = df
      .select(id.as("doc_id"), tokenizer.tokenize(text).as("toks"))
      .select(col("doc_id"), explode(array_distinct(col("toks"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= lit(minDocFrac) * col("__n_docs"))
      .drop("__n_docs")
    if (maxVocab == Int.MaxValue) passing
    else passing
      .observe(s"vocab_df_${vocabMetricSeq.incrementAndGet()}",
        count(lit(1)).as("n_passing"))
      // distributed TakeOrdered: result bounded by the cap, not the corpus
      .orderBy(col("df").desc, col("tok"))
      .limit(maxVocab)
  }

  /** Per-document OOV stats against `vocab` (a `tok` column, e.g. from
    * [[buildByDocFreq]]): `doc_id, n_tok, n_oov, oov_frac`. Counts are
    * over token OCCURRENCES (a doc repeating one junk token scores as
    * junky as it reads). */
  def oovStats(df: DataFrame, id: Column, text: Column,
               vocab: DataFrame,
               tokenizer: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    val marked = vocab.select(col("tok"), lit(1).as("__in_vocab"))
    df.select(id.as("doc_id"), tokenizer.tokenize(text).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(broadcast(marked), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_frac",
        round(col("n_oov").cast("double") / col("n_tok"), 6))
  }
}
