package graft.queries

import graft.SparkSpec

/** q208's claim is a PLAN property: dynamic partition pruning turns the
  * weekend-dim filter into a pruning subquery inside the fact scan's
  * PARTITION filters, so non-weekend day partitions are never opened.
  * The oracle pins values (pruning is correctness-neutral); this spec
  * pins that the pruning subquery is actually present and that the
  * executed scan read only the weekend partitions.
  */
class DppPlanSpec extends SparkSpec {

  describe("Relational.dynamicPartitionPruning") {
    it("plants a dynamicpruning subquery in the fact scan's partition filters") {
      val df = Relational.dynamicPartitionPruning(spark, "/root/testdata/sf0.001")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dynamicpruning"),
        s"no DPP subquery in optimized plan:\n$optimized")
      // execute, then check the scan's selected partitions: January 2024
      // has 8 weekend days in the staged 30-day span
      df.collect()
      // unwrap AQE: the final plan nests inside AdaptiveSparkPlanExec /
      // QueryStageExec / ReusedExchangeExec wrappers whose inner plan is
      // not a `children` member
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          scansOf(r.child)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scansOf)
      }
      val scans = scansOf(df.queryExecution.executedPlan)
      val fact = scans.find(_.metadata("Location").contains("evpart")).get
      assert(fact.partitionFilters.mkString.contains("dynamicpruning"),
        fact.partitionFilters.mkString("; "))
      assert(fact.selectedPartitions.partitionCount == 8,
        s"read ${fact.selectedPartitions.partitionCount} partitions, expected 8 weekend days")
    }
  }
}
