package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markup → text extraction — the WET/C4-style first stage of a web
  * training corpus: raw HTML-ish pages become clean whitespace-normal
  * text BEFORE any dedup/quality stage sees them.
  *
  * Order matters and is part of the contract:
  *   1. `<script>`/`<style>` BLOCKS go first (their contents are code,
  *      not text — and may contain literal `<`/`>` that would corrupt a
  *      naive tag strip), then comments (`(?s)` so multi-line bodies
  *      die whole);
  *   2. remaining tags collapse to a space (block boundaries must not
  *      glue words together);
  *   3. a fixed entity set decodes, `&amp;` LAST so `&amp;lt;` yields
  *      the literal text `&lt;`, not a double-decoded `<`;
  *   4. control chars → space, runs collapse, ends trim.
  *
  * Patterns stay in the Java∩RE2 subset (char classes, non-greedy
  * quantifiers, `(?s)` — no backrefs/lookaround), the same discipline as
  * [[Redaction]]/[[graft.functions.TextFns.normalize]], so a DuckDB
  * oracle replays the pass byte-for-byte via [[stripMarkupSql]].
  *
  * Scale shape: a pure per-row codegen'd `regexp_replace` chain — no
  * shuffle, no UDFs; at 100 TB this runs at scan speed inside the same
  * WholeStageCodegen span as the read.
  */
object Extraction {

  /** Ordered (pattern → replacement) rewrite chain. */
  val MarkupRules: Seq[(String, String)] = Seq(
    "(?s)<script[^>]*>.*?</script>" -> " ",
    "(?s)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]*>" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** Clean text of one markup column (rules, then whitespace normal). */
  def stripMarkup(html: Column): Column = {
    val rewritten = MarkupRules.foldLeft(html) {
      case (c, (pat, rep)) => regexp_replace(c, pat, rep)
    }
    trim(regexp_replace(
      regexp_replace(rewritten, "[\\x00-\\x1f\\x7f]", " "),
      "  +", " "))
  }

  private def sqlQuote(s: String): String = s.replace("'", "''")

  /** DuckDB rendition of [[stripMarkup]] over a SQL expression string. */
  def stripMarkupSql(expr: String): String = {
    val rewritten = MarkupRules.foldLeft(expr) {
      case (e, (pat, rep)) =>
        s"regexp_replace($e, '${sqlQuote(pat)}', '${sqlQuote(rep)}', 'g')"
    }
    s"trim(regexp_replace(regexp_replace($rewritten, " +
      "'[\\x00-\\x1f\\x7f]', ' ', 'g'), '  +', ' ', 'g'))"
  }

  /** `df` → (id, n_raw, clean_text, n_clean): the extraction pass plus
    * the before/after sizes a curation funnel reports. */
  def extract(df: DataFrame, id: Column, html: Column): DataFrame = {
    val clean = stripMarkup(html)
    df.select(
      id.as("ex_id"),
      length(html).cast("long").as("n_raw"),
      clean.as("clean_text"),
      length(clean).cast("long").as("n_clean"))
  }
}
