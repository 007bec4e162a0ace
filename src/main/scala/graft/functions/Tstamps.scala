package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Collector-timestamp extraction from enriched TSV lines (reference
  * Common.scala:88-96, column index from StatsD.scala:19): total function,
  * invalid/missing → null, matching the reference's swallowed Either.
  *
  * All built-in expressions — split + get + regexp gate + to_timestamp —
  * so the parse stays inside whole-stage codegen.
  */
object Tstamps {

  val CollectorTstampIdx = 3

  /** Strictly the strings the reference accepts: `Instant.parse` of
    * `yyyy-MM-ddTHH:mm:ss[.fff]Z` after space→T. A plain `cast(timestamp)`
    * would be laxer (it accepts date-only strings); the regex gate keeps
    * totality AND strictness.
    */
  private val Acceptable = "^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}(\\.\\d{1,9})?$"

  /** Parse one column holding `yyyy-MM-dd HH:mm:ss[.SSS]`; null if not.
    * `try_to_timestamp`, not `to_timestamp`: under ANSI mode (Spark 4
    * default) the latter throws on out-of-range components like
    * `2020-13-40`, which the reference swallows into a Left.
    */
  def enrichedTstamp(c: Column): Column =
    when(c.rlike(Acceptable), try_to_timestamp(c))

  /** Extract + parse collector_tstamp (TSV column 3) from a full line. */
  def collectorTstamp(line: Column): Column =
    enrichedTstamp(get(split(line, "\t", -1), lit(CollectorTstampIdx)))
}
