package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // group A: values with a tie at 30 (ids 3 < 7 wins the tie)
    ("A", 10L, 1L), ("A", 30L, 7L), ("A", 30L, 3L), ("A", 20L, 2L), ("A", 5L, 9L),
    // group B: fewer rows than k
    ("B", 1L, 11L), ("B", 2L, 12L))
    .toDF("g", "v", "id")

  describe("TopK.perGroup (typed Aggregator)") {
    it("ranks by (value desc, id asc) with exact tie-breaks and short groups") {
      val out = TopK.perGroup(rows, Seq(col("g")), col("v"), col("id"), k = 3)
        .select("g0", "rnk", "id", "v").as[(String, Int, Long, Long)].collect().toSet
      assert(out == Set(
        ("A", 1, 3L, 30L), ("A", 2, 7L, 30L), ("A", 3, 2L, 20L),
        ("B", 1, 12L, 2L), ("B", 2, 11L, 1L)))
    }

    it("merge law ≡ the window sort definition on random data, any partitioning") {
      val big = (1 to 500).map(i => (s"g${i % 7}", (i * 131) % 50L, i.toLong))
        .toDF("g", "v", "id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val expect = big.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 4)
        .select("g", "rnk", "id", "v").as[(String, Int, Long, Long)].collect().toSet
      val got = TopK.perGroup(big.repartition(13), Seq(col("g")), col("v"), col("id"), k = 4)
        .select("g0", "rnk", "id", "v").as[(String, Int, Long, Long)].collect().toSet
      assert(got == expect)
    }

    it("partially aggregates: the plan carries a partial_ stage, not a window sort") {
      val plan = TopK.perGroup(rows, Seq(col("g")), col("v"), col("id"), k = 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("partial_"), s"expected map-side partial aggregation:\n$plan")
      assert(!plan.contains("Window"), s"must not fall back to a window sort:\n$plan")
    }
  }
}
