package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  describe("Bucketing.bucketedJoin") {
    it("joins same-bucketed tables with ZERO exchange nodes and correct results") {
      val left = (1L to 200L).map(i => (i, s"l$i")).toDF("k", "lv")
      val right = (1L to 200L).filter(_ % 2 == 0).map(i => (i, s"r$i")).toDF("k", "rv")
      Bucketing.writeBucketed(left, "graft_spec_left", "k", numBuckets = 4)
      Bucketing.writeBucketed(right, "graft_spec_right", "k", numBuckets = 4)
      // disable auto-broadcast so the assertion exercises the co-located
      // SortMergeJoin path (a broadcast would also be exchange-light but
      // proves nothing about bucketing)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = Bucketing.bucketedJoin(spark, "graft_spec_left", "graft_spec_right", "k")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
        assert(joined.count() == 100)
        // equivalent unbucketed join DOES shuffle — the cost bucketing removes
        val naive = left.join(right, "k")
        assert(naive.queryExecution.executedPlan.toString.contains("Exchange"))
        assert(naive.count() == 100)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS graft_spec_left")
        spark.sql("DROP TABLE IF EXISTS graft_spec_right")
      }
    }
  }

  describe("Bucketing.ensureBucketed") {
    it("pays the write once per session and skips (not rewrites) thereafter") {
      val df = (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v")
      try {
        Bucketing.ensureBucketed(df, "graft_spec_once", "k", numBuckets = 2)
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), "graft_spec_once")
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        def newestMtime: Long = fs.listStatus(loc).map(_.getModificationTime).max
        val written = newestMtime
        Thread.sleep(50)
        Bucketing.ensureBucketed(df, "graft_spec_once", "k", numBuckets = 2)
        assert(newestMtime == written, "second ensureBucketed must not rewrite")
        assert(spark.table("graft_spec_once").count() == 50)
      } finally spark.sql("DROP TABLE IF EXISTS graft_spec_once")
    }
  }
}
