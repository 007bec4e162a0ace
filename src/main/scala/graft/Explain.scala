package graft

import org.apache.spark.sql.execution.FormattedMode

/** Developer tool: dump `.explain("formatted")` for every (or a
  * SPARK_GRAFT_ONLY subset of) SparkEntry query — the per-round plan
  * audit (pushed filters, broadcast choices, codegen spans, no
  * cartesian nodes). Not part of the driver contract.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.local("graft-explain")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try println(fn(spark, sfDir).queryExecution.explainString(FormattedMode))
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    spark.stop()
  }
}
