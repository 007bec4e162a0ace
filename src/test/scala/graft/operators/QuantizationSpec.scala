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

  describe("Quantization.topKTwoStage") {
    // dim 1 alone (the coarse slice) ranks id 1 over id 2; the full dot
    // (signed codes: matching MINIMA also score +128·128) flips them
    val twoStage = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),   // query → codes (127, -128, -128)
      (1L, Array(0.9f, 1.0f, 1.0f)),   // coarse winner, exact NEGATIVE vs q
      (2L, Array(0.8f, 0.0f, 0.0f)),   // coarse 2nd, exact winner
      (3L, Array(0.0f, 1.0f, 1.0f))    // coarse last
    ).toDF("vec_id", "embedding")

    def codesFor(df: org.apache.spark.sql.DataFrame) = {
      val stats = Quantization.dimStats(df, col("embedding"))
      Quantization.quantize(df, col("vec_id"), col("embedding"), stats)
    }

    it("equals the single-stage exact top-k when kCoarse spans the corpus") {
      val codes = codesFor(vecs)
      val qs = codes.filter(col("vec_id") <= 2)
      val exact = Quantization.topKInt(codes, qs, k = 3)
        .collect().map(_.toSeq).toSet
      val two = Quantization.topKTwoStage(codes, qs, k = 3, kCoarse = 10, coarseDims = 2)
        .collect().map(_.toSeq).toSet
      assert(two == exact)
    }

    it("re-ranks coarse survivors by the exact score; a tight kCoarse trades recall") {
      val codes = codesFor(twoStage)
      val qs = codes.filter(col("vec_id") === 0L)
      // kCoarse=2 keeps ids 1 and 2 (coarse dim-1 order), exact re-rank
      // then puts 2 first
      val wide = Quantization.topKTwoStage(codes, qs, k = 2, kCoarse = 2, coarseDims = 1)
        .select("rnk", "neighbor_id").as[(Int, Long)].collect().toMap
      assert(wide == Map(1 -> 2L, 2 -> 1L), s"got $wide")
      // kCoarse=1 cuts id 2 at the coarse stage → recall loss, id 1 wins
      val tight = Quantization.topKTwoStage(codes, qs, k = 1, kCoarse = 1, coarseDims = 1)
        .select("rnk", "neighbor_id").as[(Int, Long)].collect().toMap
      assert(tight == Map(1 -> 1L), s"got $tight")
    }

    it("keeps code arrays out of the coarse-cut window: narrow projection only") {
      import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
      val codes = codesFor(vecs)
      val wins = Quantization.topKTwoStage(codes, codes.filter(col("vec_id") === 0), 2, 3, 2)
        .queryExecution.optimizedPlan.collect { case w: LWindow => w }
      val coarseWin = wins.last // outermost-last in collect order = the coarse cut
      val names = coarseWin.child.output.map(_.name)
      assert(names.toSet == Set("query_id", "neighbor_id", "coarse"),
        s"code arrays leaked into the coarse window: $names")
    }
  }
}
