package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Count-based n-gram language-model fluency scoring — the CCNet-shaped
  * quality gate: score every document by how typical its n-grams are of
  * the corpus (or of a trained reference corpus) and keep the fluent
  * ones. The real CCNet filters on KenLM perplexity; the engine-exact
  * re-expression scores each n-gram by the INTEGER log2 of its corpus
  * count (floor(log2 c) = number of binary digits − 1 — a stupid-backoff
  * -style quantized logprob) so every score is integer arithmetic:
  * associative, partitioning-invariant, and replayable bit-for-bit by a
  * SQL oracle (`length(bin(c)) − 1` here ≡
  * `length(format('{:b}', c)) − 1` in DuckDB). A float logprob sum
  * would be fold-order-dependent across partitions — unusable as a
  * deterministic keep rule on a cluster.
  *
  * Scale shape: train = one explode + one hashed-gram count shuffle;
  * score = explode + a key-partitioned join against the count table
  * (never broadcast-required — the model may exceed driver memory at
  * 100 TB; AQE will broadcast small ones on its own) + one per-doc
  * aggregation. The keep gate is a cross-multiplied rational mean
  * (`ilog_sum·den ≥ n_grams·num`) — no float threshold.
  */
object NgramLm {

  /** floor(log2 cnt) for cnt ≥ 1, as an integer column. */
  def ilog2(cnt: Column): Column = (length(bin(cnt)) - 1).cast("long")

  /** Train: hashed n-gram → occurrence count over the corpus. */
  def train(df: DataFrame, text: Column, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // project tokens to an attribute FIRST — HOF lambdas are not
    // subexpression-eliminated (see TextFns.shinglesOf)
    df.select(TextFns.tokens(text).as("toks"))
      .select(explode(TextFns.ngramsOf(col("toks"), n)).as("gram"))
      .select(TextFns.hash60(col("gram")).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Score: per-doc n-gram count and integer-log2 sum against a trained
    * count table; grams absent from the table (OOV when scoring a NEW
    * corpus against a reference model) contribute `oovIlog`. Total:
    * docs with fewer than `n` tokens surface as (0, 0), not silently
    * vanish. Output: (id, n_grams, ilog_sum).
    */
  def score(df: DataFrame, id: Column, text: Column, counts: DataFrame,
            n: Int, oovIlog: Long = -1L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val base = df.select(id.as("lm_id"), TextFns.tokens(text).as("toks"))
    val grams = base
      .select(col("lm_id"), explode(TextFns.ngramsOf(col("toks"), n)).as("gram"))
      .select(col("lm_id"), TextFns.hash60(col("gram")).as("gram"))
    val scored = grams
      .join(counts, Seq("gram"), "left")
      .groupBy(col("lm_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(ilog2(col("cnt")), lit(oovIlog))).as("ilog_sum"))
    base.select(col("lm_id"))
      .join(scored, Seq("lm_id"), "left")
      .select(
        col("lm_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("ilog_sum"), lit(0L)).as("ilog_sum"))
  }

  /** Keep gate: mean ilog2 ≥ num/den, exact via cross-multiplication.
    * Gram-less docs (0, 0) pass vacuously — too short to judge, the
    * length gates elsewhere own them. */
  def fluent(nGrams: Column, ilogSum: Column, num: Long, den: Long): Column = {
    require(den > 0, s"den must be > 0, got $den")
    ilogSum * den >= nGrams * num
  }
}
