package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AQE's runtime skew-join split — the first line of defense the salted
  * join backs up (Joins.scala doc): with thresholds scaled to test data,
  * a pathologically hot key makes AQE mark the SortMergeJoin `skew=true`
  * and split the hot partition across tasks.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  describe("AQE skew-join handling") {
    it("marks and splits the hot partition at runtime (skew=true in the final plan)") {
      val confs = Seq(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        // hot key 1 carries 50k rows with a fat payload; ~100 cold keys
        // (id/500 % 100 spreads the sprinkled rows, unlike id % 100
        // which is always 0 when id % 500 == 0)
        val left = spark.range(0, 50000).select(
          when(col("id") % 500 === 0, (col("id") / 500) % 100).otherwise(lit(1L)).as("k"),
          concat(lit("x" * 100), col("id").cast("string")).as("payload"))
        val right = spark.range(0, 100).select(col("id").as("k"), col("id").as("rv"))
        val joined = left.join(right, "k")
        // run THIS frame's own execution (AQE finalizes the plan at runtime)
        assert(joined.collect().length == 50000)
        val finalPlan = joined.queryExecution.executedPlan.toString
        assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
        assert(finalPlan.contains("skew=true"), s"expected a skew-split join:\n$finalPlan")
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
