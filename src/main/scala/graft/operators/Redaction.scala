package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass a training corpus gets before
  * export: replace personally-identifying spans (emails, URLs, long
  * digit runs) with typed placeholder tokens and report per-rule hit
  * counts for audit.
  *
  * Rules apply IN ORDER, each seeing the previous rule's output (so an
  * email's digits are gone before the number rule runs), and each rule
  * counts its matches on the text it actually scrubbed. Patterns are
  * deliberately restricted to the regex subset with identical semantics
  * in Java (Spark) and RE2-style (DuckDB) engines — char classes,
  * bounded/unbounded greedy quantifiers, alternation; no backrefs, no
  * lookaround — so the whole pass is oracle-checkable byte-for-byte.
  *
  * Scale shape: pure per-row codegen'd expressions (`regexp_replace` /
  * `regexp_extract_all`), no shuffle, no UDFs.
  */
object Redaction {

  /** One scrub rule: matches of `pattern` become `replacement`; the
    * rule's hit count lands in column `n_<name>`. */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Lowercase-normalized corpus defaults (the documents table is
    * lowercase; a mixed-case deployment passes case-folded rules). */
  val DefaultRules: Seq[Rule] = Seq(
    Rule("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    Rule("url", "https?://[^ ]+", "<URL>"),
    Rule("number", "[0-9][0-9 -]{6,}[0-9]", "<NUMBER>"))

  /** `df` plus `redacted` (fully scrubbed text) and one `n_<rule>` hit
    * count per rule. */
  def scrub(df: DataFrame, text: Column, rules: Seq[Rule] = DefaultRules): DataFrame = {
    // select(col("*"), …) would emit DUPLICATE columns if the input
    // already carries any output name — ambiguous downstream references
    val taken = df.columns.toSet
    val clashes = ("redacted" +: rules.map(r => s"n_${r.name}")).filter(taken)
    require(clashes.isEmpty,
      s"input frame already has output column(s) ${clashes.mkString(", ")} — rename them first")
    val (redacted, counts) = rules.foldLeft((text, Seq.empty[Column])) {
      case ((t, cs), r) =>
        val hits = size(regexp_extract_all(t, lit(r.pattern), lit(0)))
          .cast("long").as(s"n_${r.name}")
        (regexp_replace(t, r.pattern, r.replacement), cs :+ hits)
    }
    df.select(col("*") +: counts :+ redacted.as("redacted"): _*)
  }
}
