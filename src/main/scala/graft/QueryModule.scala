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

  /** STAGED oracle variants for queries whose self-contained replay is
    * capacity-infeasible at big SF: same semantics, but the one stage
    * DuckDB cannot afford is read from another query's Spark dump —
    * hash-verified by the SAME sweep — registered as a view named after
    * that query. Used only by tools/check_sweep.py at sf1; the driver's
    * sf0.01 gate always runs the self-contained `oracles` entry.
    */
  def stagedOracles: Map[String, String] = Map.empty

  /** Bench family label for this module's queries (per-family subtotals
    * in the bench JSON) — derived from the registering module so a query
    * can never be misattributed by a hand-maintained number range.
    */
  def family: String
}
