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

  /** Top-k distinguishing terms per document.
    *
    * @return (doc_id, term, score, rank) with rank 1..k per doc in
    *         (score desc, term asc) order. Docs with fewer distinct
    *         terms than k yield fewer rows; an empty/null doc yields
    *         its single empty-string token like every other term.
    */
  def tfidfTopK(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val postings = docs
      .select(id.as("doc_id"), explode(TextFns.tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

    val df = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
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
