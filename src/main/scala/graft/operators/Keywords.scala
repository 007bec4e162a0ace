package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Per-document TF-IDF keyword extraction — the corpus-annotation side
  * of the lexical story ([[Retrieval]] is the query-time side): tag
  * every document with the k terms that most distinguish it from the
  * corpus. A training-data pipeline uses the tags for topical mixture
  * accounting, cluster labeling, and retrieval-free slice audits.
  *
  * Scoring reuses the BM25 idf exactly (the integer fixed-point log2
  * of `Retrieval`): `score(t,d) = tf_{t,d} · widf_t`, every division a
  * floor division both engines replay bit-for-bit, ties broken by term
  * — the extraction is deterministic across partitionings and engines.
  *
  * Shape at 100 TB: ONE shuffle builds the postings (tf per (doc,
  * term)); the df table is vocabulary-sized and BROADCASTS back; the
  * per-doc top-k window re-partitions postings by doc — the only other
  * shuffle, and it moves (doc, term, score) triplets, not documents.
  */
object Keywords {

  private val dfMetricSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Top-k distinguishing terms per document.
    *
    * `maxDf` bounds the broadcast df table BY CONSTRUCTION (the
    * Dedup.contaminationPairs cap discipline, VERDICT r8 #7): natural-
    * language vocabularies are Zipfian but adversarial corpora (code,
    * n-gram noise) are not, and an unbounded vocabulary is an unbounded
    * broadcast. Terms with df > maxDf are dropped from CANDIDACY — they
    * are the corpus-ubiquitous terms TF-IDF exists to discount (their
    * widf is minimal), so below the cap the answer is IDENTICAL (kept
    * terms' scores depend only on their own df and n_docs — spec-
    * pinned), and dropped terms are observable via the
    * `keywords_df_<n>` observe metrics.
    *
    * @return (doc_id, term, score, rank) with rank 1..k per doc in
    *         (score desc, term asc) order. Docs with fewer distinct
    *         terms than k yield fewer rows; an empty/null doc yields
    *         its single empty-string token like every other term.
    */
  def tfidfTopK(docs: DataFrame, id: Column, text: Column, k: Int,
                maxDf: Long = Long.MaxValue): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val postings = docs
      .select(id.as("doc_id"), explode(TextFns.tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

    val dfAll = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val df =
      if (maxDf == Long.MaxValue) dfAll
      else dfAll
        .observe(s"keywords_df_${dfMetricSeq.incrementAndGet()}",
          count(lit(1)).as("n_terms"),
          sum(when(col("df") > maxDf, 1).otherwise(0)).as("dropped_terms"))
        .filter(col("df") <= maxDf)
    val stats = postings.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))

    postings
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("ratio", expr("((n_docs + 1) * 1048576) div (df + 1)"))
      .withColumn("e", (length(bin(col("ratio"))) - 1).cast("long"))
      .withColumn("widf",
        expr("e * 1024 + (ratio * 1024) div shiftleft(cast(1 as bigint), cast(e as int)) - 1024"))
      .withColumn("score", expr("tf * widf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("score"), col("rank"))
  }
}
