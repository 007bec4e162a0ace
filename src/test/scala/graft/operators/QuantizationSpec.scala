package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f)),
    (4L, Array(0.5f, 0.5f, 0.5f))
  ).toDF("vec_id", "embedding")

  private def codesOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] = {
    val stats = Quantization.dimStats(df, col("embedding"))
    Quantization.quantize(df, col("vec_id"), col("embedding"), stats)
      .as[(Long, Seq[Long])].collect().toMap
  }

  describe("Quantization.quantize") {
    it("maps each dimension's [min,max] onto [-128,127] with round-half-up") {
      val c = codesOf(vecs)
      // dim mins are 0.0, maxes 1.0 → code = round(x·255) − 128
      assert(c(0L) == Seq(127L, -128L, -128L))
      assert(c(2L) == Seq(-128L, 127L, -128L))
      assert(c(4L) == Seq(0L, 0L, 127L)) // 0.5·255+0.5 → 128 − 128 = 0; dim3 max
    }

    it("constant dimensions quantize to 0 rather than dividing by zero") {
      val const = Seq((0L, Array(1.0f, 7.0f)), (1L, Array(2.0f, 7.0f)))
        .toDF("vec_id", "embedding")
      val c = codesOf(const)
      assert(c(0L)(1) == 0L && c(1L)(1) == 0L)
    }

    it("codes are identical under any partitioning (stats are corpus-global)") {
      assert(codesOf(vecs) == codesOf(vecs.repartition(5)))
    }
  }

  describe("Quantization.topKInt") {
    it("integer-dot ranking recovers the obvious nearest neighbors") {
      val stats = Quantization.dimStats(vecs, col("embedding"))
      val codes = Quantization.quantize(vecs, col("vec_id"), col("embedding"), stats)
      val top = Quantization.topKInt(codes, codes.filter(col("vec_id") <= 2), k = 1)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
      assert(top(0L) == 1L, s"x-axis query → x-axis neighbor: $top")
      assert(top(2L) == 3L, s"y-axis query → y-axis neighbor: $top")
    }

    it("broadcasts the query side — no shuffle of the corpus") {
      val stats = Quantization.dimStats(vecs, col("embedding"))
      val codes = Quantization.quantize(vecs, col("vec_id"), col("embedding"), stats)
      val plan = Quantization.topKInt(codes, codes.filter(col("vec_id") === 0), 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    }
  }
}
