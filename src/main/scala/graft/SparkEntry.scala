package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `QueryModule` contributes named queries (Spark-side) and, where
  * SQL-expressible, a DuckDB oracle with matching column names.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    q.Relational,
    q.PipelineQueries,
    q.DataOps,
    q.SketchQueries,
    q.StreamingQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap

  /** Staged big-SF oracle variants (see [[QueryModule.stagedOracles]]):
    * consumed by tools/check_sweep.py, never by the driver's gate. */
  def stagedOracleSql: Map[String, String] =
    modules.flatMap(_.stagedOracles).toMap

  /** query name → bench family, derived from the registering module
    * (cached: Bench looks this up once per query while assembling JSON). */
  lazy val familyOf: Map[String, String] =
    modules.flatMap(m => m.queries.keys.map(_ -> m.family)).toMap
}
