package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate-line removal — the C4/CCNet cleanup step:
  * navigation chrome, cookie banners, and subscription prompts repeat
  * verbatim across thousands of pages, so any line occurring in more
  * than `maxDocs` distinct documents is boilerplate and is dropped from
  * every document (content lines are overwhelmingly unique to their
  * page). This is a CORPUS-level signal — no per-document heuristic can
  * see it.
  *
  * Scale shape, by construction:
  *  - one narrow line explode (bounded by line counts);
  *  - one map-side-combined aggregate on the line to find frequent
  *    lines — and only lines ABOVE the threshold survive it, which by
  *    definition of boilerplate is a small set (a line in >maxDocs docs
  *    can number at most `total_lines/maxDocs`);
  *  - that small set broadcast-joins back (left join as a tag — no
  *    corpus shuffle);
  *  - one aggregate on the doc id reassembles cleaned text in original
  *    line order.
  *
  * Reassembly keeps the original order via the exploded position
  * (`array_sort` on (pos, …) structs), and is total: a document whose
  * every line is boilerplate comes back with empty text, not a missing
  * row.
  */
object Boilerplate {

  /** Remove lines occurring in more than `maxDocs` distinct documents.
    *
    * Frequency counts DISTINCT documents (a line repeated inside one
    * page is not corpus boilerplate), and exact line equality is the
    * match rule — normalize first (see `TextFns.normalize`) if trailing
    * whitespace variants should collapse.
    *
    * @return one row per input doc: `bp_id, clean_text, n_lines,
    *         n_removed`
    */
  def removeFrequentLines(df: DataFrame, id: Column, text: Column,
                          maxDocs: Long, sep: String = "\n"): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val lines = df
      .select(id.as("bp_id"),
        // coalesce keeps the totality promise for null text: split(null)
        // is null and posexplode(null) emits NOTHING, which would drop
        // the document from the output entirely; '' yields one empty
        // line instead, so the doc comes back (possibly empty) like
        // every other
        posexplode(split(coalesce(text, lit("")), Pattern.quote(sep))).as(Seq("pos", "line")))
      // feeds the frequency aggregate AND the tag join — one scan
      .localCheckpoint(false)
    val boiler = lines.groupBy(col("line"))
      .agg(countDistinct(col("bp_id")).as("n_docs"))
      .filter(col("n_docs") > maxDocs)
      .select(col("line"), lit(true).as("is_bp"))
    lines.join(broadcast(boiler), Seq("line"), "left")
      .groupBy(col("bp_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("is_bp"), 1L).otherwise(0L)).as("n_removed"),
        concat_ws(sep,
          transform(
            filter(
              array_sort(collect_list(struct(col("pos"), col("line"), col("is_bp")))),
              x => x.getField("is_bp").isNull),
            x => x.getField("line"))).as("clean_text"))
      .select(col("bp_id"), col("clean_text"), col("n_lines"), col("n_removed"))
  }
}
