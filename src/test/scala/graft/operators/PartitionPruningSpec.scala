package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  describe("Hive-style partitioned writes (the q147 layout)") {
    it("binds day filters to partition DIRECTORIES: pruned scan, exact data") {
      withTempDir { dir =>
        val out = s"${dir.getAbsolutePath}/part"
        (0 until 100).map(i => (i.toLong, i % 10)).toDF("id", "day_n")
          .write.partitionBy("day_n").parquet(out)
        val q = spark.read.parquet(out).filter(col("day_n").between(3, 5))
        val scan = q.queryExecution.executedPlan
          .collect { case f: FileSourceScanExec => f }.head
        // the filter must reach the scan as a PARTITION filter (pruned
        // before any file is opened), not a data filter
        assert(scan.partitionFilters.nonEmpty, scan.toString)
        assert(scan.metadata("PartitionFilters").contains("day_n"), scan.metadata)
        assert(q.count() == 30)
        // only the 3 matching directories are read
        assert(scan.selectedPartitions.partitionCount == 3,
          s"read ${scan.selectedPartitions.partitionCount} partitions")
      }
    }
  }
}
