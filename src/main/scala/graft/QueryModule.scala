package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries. `queries` run on Spark;
  * `oracles` hold the equivalent DuckDB SQL (same column names — the
  * driver sorts columns by name before hashing values). Queries without
  * an oracle entry get a weaker rows-only check.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Bench family label for this module's queries (per-family subtotals
    * in the bench JSON) — derived from the registering module so a query
    * can never be misattributed by a hand-maintained number range.
    */
  def family: String
}
