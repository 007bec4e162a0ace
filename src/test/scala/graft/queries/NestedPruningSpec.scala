package graft.queries

import graft.SparkSpec

/** q212's claim is a SCAN property: nested schema pruning pushes the
  * selected subfields (`meta.type`, `payload.value`) into the parquet
  * ReadSchema, so the wide `payload.props` leaf is never decoded. The
  * oracle pins the values; this spec pins the pruned ReadSchema.
  */
class NestedPruningSpec extends SparkSpec {

  describe("PipelineQueries.nestedPruning") {
    it("reads only the selected struct subfields from parquet") {
      val df = PipelineQueries.nestedPruningInner(spark, "/root/testdata/sf0.001")
      df.collect() // finalize the AQE plan
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
      val scan = scansOf(df.queryExecution.executedPlan).head
      val read = scan.metadata("ReadSchema")
      assert(read.contains("type") && read.contains("value"), read)
      assert(!read.contains("props") && !read.contains("day")
        && !read.contains("user_id") && !read.contains("event_id"),
        s"unpruned subfields reached the scan: $read")
    }
  }
}
