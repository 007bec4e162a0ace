package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Distance-weighted word co-occurrence counts — the corpus-level
  * statistic GloVe-style embedding training consumes (Pennington et
  * al., EMNLP 2014 — public method) and the substrate for PMI/PPMI
  * association matrices beyond [[graft.queries.DataOps]]'s
  * window-free collocations.
  *
  * For every token position i and offset d ≤ `window`, the unordered
  * pair (tokenᵢ, tokenᵢ₊d) accumulates weight 1/d. Weights are kept in
  * EXACT ×60 fixed point (60 = lcm(1..5), so every 1/d with d ≤ 5 is an
  * integer — the engine-replay discipline; larger windows would switch
  * to lcm(1..w)); pairs are canonicalized word-min-first so (a,b) and
  * (b,a) merge.
  *
  * Scale shape: pair generation is a PER-ROW array comprehension (pure
  * codegen, ≤ window·len structs per doc — linear in corpus positions,
  * never vocab²), followed by ONE shuffle keyed on the (a, b) pair for
  * the global sum — the map-side partial aggregation absorbs each
  * partition's repeats, and the reduced matrix is bounded by observed
  * pairs, not the token count. `minWeight60` prunes the long singleton
  * tail AFTER aggregation (a HAVING, not a sample — counts below the
  * floor are exact zeros of the output contract, not approximations).
  */
object Cooccur {

  def pairWeights(docs: DataFrame, text: Column, window: Int,
                  minWeight60: Long = 0L): DataFrame = {
    require(window >= 1 && window <= 5,
      s"window must be in [1,5] (weights are exact ×60 fixed point), got $window")
    val pairs = docs
      .select(TextFns.tokens(text).as("t"))
      .select(explode(expr(
        // size(t) < 2 → no pairs; outer i stops at size-1 so the inner
        // sequence is always ascending (Spark's sequence DESCENDS when
        // start > stop, which would fabricate inverted pairs)
        s"""CASE WHEN size(t) < 2 THEN CAST(array() AS array<struct<a:string,b:string,w:bigint>>)
           |ELSE flatten(transform(sequence(1, size(t) - 1),
           |  i -> transform(sequence(i + 1, least(i + $window, size(t))),
           |    j -> struct(least(element_at(t, i), element_at(t, j)) AS a,
           |                greatest(element_at(t, i), element_at(t, j)) AS b,
           |                60L div (j - i) AS w)))) END""".stripMargin))
        .as("p"))
      .select(col("p.a"), col("p.b"), col("p.w"))
      .filter(col("a") =!= col("b")) // self-pairs carry no association signal
    pairs.groupBy(col("a"), col("b"))
      .agg(sum(col("w")).as("w60"), count(lit(1)).as("n_hits"))
      .filter(col("w60") >= minWeight60)
  }
}
