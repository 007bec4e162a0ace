package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-level FIRST-OCCURRENCE paragraph deduplication — the CCNet
  * cleanup step (Wenzek et al. 2020): every paragraph is fingerprinted
  * (CCNet: first 64 bits of SHA-1; here: `TextFns.hash60`, top 60 bits
  * of MD5), and only the globally FIRST occurrence in corpus order
  * `(doc, position)` survives; later repeats — across documents or
  * within one — are excised.
  *
  * Ordering makes this DIFFERENT from `Boilerplate.removeFrequentLines`
  * (a frequency threshold that drops every copy including the first):
  * keep-first preserves exactly one copy of shared content, which is
  * the dedup semantic, not the boilerplate semantic.
  *
  * Scale shape, by construction:
  *  - one narrow paragraph explode;
  *  - the keep-first window runs on a `(pd_id, pos, fp)` PROJECTION —
  *    the shuffle moves 24-byte fingerprint triplets, never paragraph
  *    payloads (spec-asserted);
  *  - the loser set (duplicate occurrences only) joins back on
  *    `(pd_id, pos)` — at real-world dup rates it is the small side and
  *    AQE converts the join to broadcast, leaving paragraphs unmoved;
  *  - one reassembly aggregate on the doc id — the only stage that
  *    shuffles paragraph text, and it is also the output.
  *
  * Dedup identity is the 60-bit fingerprint, as in CCNet: collisions
  * conflate distinct paragraphs with probability ~k²/2⁶¹ for k corpus
  * paragraphs (≈1e-4 at a billion paragraphs) — the accepted trade for
  * never shuffling payloads in the decision stage.
  */
object ParagraphDedup {

  /** Drop every paragraph occurrence whose fingerprint was already seen
    * earlier in `(id, position)` order.
    *
    * Total: every input doc yields exactly one output row — a document
    * whose every paragraph is a repeat comes back with empty
    * `clean_text`, not a missing row (null text reads as one empty
    * paragraph, like every other empty doc).
    *
    * @return one row per input doc: `pd_id, clean_text, n_paras,
    *         n_dropped`
    */
  def dropDuplicateParagraphs(df: DataFrame, id: Column, text: Column,
                              sep: String = "\n\n"): DataFrame = {
    val paras = df
      .select(id.as("pd_id"),
        posexplode(split(coalesce(text, lit("")), Pattern.quote(sep)))
          .as(Seq("pos", "para")))
      // feeds both the fingerprint window and the reassembly — one scan
      .localCheckpoint(false)
    val losers = paras
      .select(col("pd_id"), col("pos"), TextFns.hash60(col("para")).as("fp"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("fp"))
          .orderBy(col("pd_id"), col("pos"))))
      .filter(col("rn") > 1)
      .select(col("pd_id"), col("pos"), lit(true).as("is_dup"))
    paras
      .join(losers, Seq("pd_id", "pos"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
      .groupBy(col("pd_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("is_dup"), struct(col("pos"), col("para"))))),
            s => s.getField("para")),
          sep).as("clean_text"),
        count(lit(1)).as("n_paras"),
        sum(col("is_dup").cast("long")).as("n_dropped"))
  }
}
