package graft.queries

import graft.SparkSpec

/** q197's claim is a PLAN property: Spark's InjectRuntimeFilter turns
  * the selective orders filter into a bloom filter evaluated inside the
  * lineitem scan side. The oracle pins the values (bloom filtering must
  * be correctness-neutral); this spec pins that the filter actually
  * fired — without it the query would silently degrade to a plain join
  * and the "runtime pruning" row in SURVEY §2.3 would be vapor.
  */
class RuntimeFilterSpec extends SparkSpec {

  describe("Relational.runtimeBloomJoin") {
    it("injects a runtime bloom filter into the fact side of the join") {
      Relational.withBloomConfs(spark) {
        val df = Relational.runtimeBloomJoinPlan(spark, "/root/testdata/sf0.001")
        val plan = df.queryExecution.optimizedPlan.toString
        assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"),
          s"no runtime bloom filter in plan:\n$plan")
        assert(plan.contains("might_contain"),
          s"bloom filter built but not applied to the scan side:\n$plan")
        // and it is correctness-neutral
        val r = df.collect()
        assert(r.length == 1 && r(0).getLong(1) > 0)
      }
    }

    it("the conf window restores every setting on exit") {
      val before = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      Relational.withBloomConfs(spark) {
        assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1")
      }
      assert(spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold") == before)
    }
  }
}
