package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", §A1.1.2) — the rule-based corpus gate
  * every large-scale pretraining pipeline runs BEFORE model-based
  * scoring: cheap per-document bounds on length, word shape, stopword
  * presence, and repetition. The reference engine (kinesis-s3) has no
  * quality gate; this follows the published rule set re-expressed in
  * the repo's integer fixed-point discipline (q105/q108/q115): every
  * ratio is a ×100/×1000 floor division both engines replay
  * bit-for-bit, so the gate decision itself is oracle-checkable.
  *
  * Metrics, per document — all int64:
  *  - `n_words`       — whitespace token count
  *  - `mean_len_fp`   — floor(Σ len(word) · 100 / n_words)  (×100)
  *  - `stop_hits`     — tokens in the [[TextFns.EnglishStopwords]] list
  *  - `top_frac_fp`   — floor(max word multiplicity · 1000 / n_words)
  *    (×1000; the "fraction of most-frequent word" repetition rule)
  *  - `distinct_frac_fp` — floor(distinct words · 1000 / n_words)
  *
  * Shape at 100 TB: every metric is a per-row higher-order-function
  * over the token array — ZERO shuffle, fully codegen'd, pushes down
  * beside the scan. The repetition metric deliberately avoids the
  * explode→groupBy(doc, word) formulation (a corpus-sized shuffle):
  * the max multiplicity is the longest run in the SORTED token array,
  * computed by one linear `aggregate` pass per row.
  */
object QualityRules {

  /** Threshold set; defaults are the published Gopher bounds scaled to
    * fixed-point (min/max words 50/100k, mean word length 3–10 chars,
    * ≥ 2 stopword hits, most-frequent word < 20% of the doc). */
  final case class Rules(minWords: Long = 50, maxWords: Long = 100000,
                         minMeanLenFp: Long = 300, maxMeanLenFp: Long = 1000,
                         minStopHits: Long = 2, maxTopFracFp: Long = 200)

  /** Longest equal-run length in a SORTED string array = max word
    * multiplicity, as one linear fold: state (prev, run, best). */
  private def maxRun(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Raw per-row metric columns over a MATERIALIZED token-array column
    * (project [[TextFns.tokens]] first — [[TextFns.shinglesOf]]'s
    * no-CSE-inside-lambdas contract). */
  private def metricCols(toks: Column): Seq[Column] = {
    val stopArr = array(TextFns.EnglishStopwords.map(lit): _*)
    Seq(
      size(toks).cast("long").as("n_words"),
      aggregate(transform(toks, t => length(t).cast("long")),
        lit(0L), (a, b) => a + b).as("sum_len"),
      size(filter(toks, t => array_contains(stopArr, t)))
        .cast("long").as("stop_hits"),
      maxRun(array_sort(toks)).as("top_mult"),
      size(array_distinct(toks)).cast("long").as("n_distinct"))
  }

  private def passCol(rules: Rules): Column =
    (col("n_words") >= rules.minWords && col("n_words") <= rules.maxWords &&
      col("mean_len_fp") >= rules.minMeanLenFp &&
      col("mean_len_fp") <= rules.maxMeanLenFp &&
      col("stop_hits") >= rules.minStopHits &&
      col("top_frac_fp") <= rules.maxTopFracFp).cast("long")

  /** Per-document metric frame: (doc_id, n_words, mean_len_fp,
    * stop_hits, top_frac_fp, distinct_frac_fp, pass 0/1). */
  def score(df: DataFrame, id: Column, text: Column,
            rules: Rules = Rules()): DataFrame =
    df.select(id.as("doc_id"), TextFns.tokens(text).as("__toks"))
      .select(col("doc_id") +: metricCols(col("__toks")): _*)
      .select(
        col("doc_id"), col("n_words"),
        expr("sum_len * 100 div n_words").as("mean_len_fp"),
        col("stop_hits"),
        expr("top_mult * 1000 div n_words").as("top_frac_fp"),
        expr("n_distinct * 1000 div n_words").as("distinct_frac_fp"))
      .withColumn("pass", passCol(rules))

  /** The gate itself: the input rows (all columns) whose text passes
    * `rules` — the same per-row metric expressions applied as a plain
    * filter, so the gate stays a zero-shuffle narrow map (no join back,
    * no second scan). */
  def keep(df: DataFrame, text: Column, rules: Rules = Rules()): DataFrame = {
    require(!df.columns.exists(_.startsWith("__qr")),
      "input frame already has __qr* columns (reserved working names)")
    val stopArr = array(TextFns.EnglishStopwords.map(lit): _*)
    df.withColumn("__qr_toks", TextFns.tokens(text))
      .withColumn("__qr_nw", size(col("__qr_toks")).cast("long"))
      .withColumn("__qr_mean", expr(
        s"aggregate(transform(__qr_toks, t -> cast(length(t) as bigint)), " +
          "cast(0 as bigint), (a, b) -> a + b) * 100 div __qr_nw"))
      .withColumn("__qr_stop",
        size(filter(col("__qr_toks"), t => array_contains(stopArr, t))).cast("long"))
      .withColumn("__qr_top", maxRun(array_sort(col("__qr_toks"))))
      .withColumn("__qr_topfp", expr("__qr_top * 1000 div __qr_nw"))
      .filter(
        col("__qr_nw") >= rules.minWords && col("__qr_nw") <= rules.maxWords &&
          col("__qr_mean") >= rules.minMeanLenFp &&
          col("__qr_mean") <= rules.maxMeanLenFp &&
          col("__qr_stop") >= rules.minStopHits &&
          col("__qr_topfp") <= rules.maxTopFracFp)
      .drop("__qr_toks", "__qr_nw", "__qr_mean", "__qr_stop", "__qr_top", "__qr_topfp")
  }
}
