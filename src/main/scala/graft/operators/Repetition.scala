package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Within-document repetition metrics — the Gopher-style repetition
  * filters (Rae et al. 2021, public): machine-generated and boilerplate
  * text shows up as a few n-grams dominating a document, which
  * whole-document dedup and TTR both miss. Per doc:
  *
  *  - `top_gram_frac`: occurrences of the single most frequent n-gram /
  *    total n-grams (Gopher's "top n-gram fraction" gate);
  *  - `dup_gram_frac`: fraction of n-gram slots covered by n-grams that
  *    occur more than once (the "duplicate n-gram fraction" gate).
  *
  * Scale shape: one explode + one (doc, gram) hash-aggregate + one doc
  * re-aggregate — both map-side-combining shuffles keyed finer than or
  * equal to the doc, so hot documents spread across reducers at the
  * (doc, gram) stage and nothing is ever corpus-global.
  */
object Repetition {

  /** One row per doc (total — docs with fewer than `n` tokens report
    * zero grams and null fractions): `doc_id, n_grams, top_gram,
    * top_gram_frac, dup_gram_frac`. The arg-max gram breaks count ties
    * by the lexicographically GREATEST gram (max over a (count, gram)
    * struct), so the result is deterministic and oracle-matchable.
    */
  def ngramStats(df: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val grams = df
      .select(id.as("doc_id"), TextFns.tokens(text).as("toks"))
      .select(col("doc_id"), explode_outer(TextFns.ngramsOf(col("toks"), n)).as("g"))
    val counts = grams.groupBy(col("doc_id"), col("g"))
      // count(g), not count(*): the explode_outer null row for a short
      // doc must contribute ZERO grams, not one
      .agg(count(col("g")).as("c"))
    counts.groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_grams"),
        max(struct(col("c"), col("g"))).as("top"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_n"))
      .select(
        col("doc_id"),
        col("n_grams"),
        when(col("n_grams") > 0, col("top.g")).as("top_gram"),
        when(col("n_grams") > 0,
          round(col("top.c").cast("double") / col("n_grams"), 6)).as("top_gram_frac"),
        when(col("n_grams") > 0,
          round(col("dup_n").cast("double") / col("n_grams"), 6)).as("dup_gram_frac"))
  }
}
