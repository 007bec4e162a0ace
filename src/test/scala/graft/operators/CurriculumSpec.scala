package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  // score = id for a transparent ranking: id 100 is "easiest" (tier 0)
  private val scored = (1L to 100L).toDF("id").withColumn("score", col("id"))

  describe("Curriculum.tieredInterleave") {
    it("cuts equal tiers by score rank and interleaves them round-robin") {
      val out = Curriculum.tieredInterleave(scored, col("id"), col("score"), tiers = 5)
        .orderBy("curriculum_pos")
        .select("id", "tier", "curriculum_pos").as[(Long, Long, Long)].collect()
      // 100 rows, 5 tiers of 20: tier 0 = scores 100..81, tier 4 = 20..1
      assert(out.length == 100)
      val byTier = out.groupBy(_._2).view.mapValues(_.length).toMap
      assert(byTier == Map(0L -> 20, 1L -> 20, 2L -> 20, 3L -> 20, 4L -> 20))
      // first cycle: the best of each tier, in tier order
      assert(out.take(5).map(_._1).toSeq == Seq(100L, 80L, 60L, 40L, 20L))
      // second cycle continues round-robin
      assert(out.slice(5, 10).map(_._1).toSeq == Seq(99L, 79L, 59L, 39L, 19L))
      // positions are a 1-based total order
      assert(out.map(_._3).toSeq == (1L to 100L).toSeq)
    }

    it("is total for N not divisible by tiers (remainder to earlier tiers)") {
      val seven = (1L to 7L).toDF("id").withColumn("score", col("id"))
      val out = Curriculum.tieredInterleave(seven, col("id"), col("score"), tiers = 3)
        .orderBy("curriculum_pos").select("id", "tier").as[(Long, Long)].collect()
      // ranks x=0..6 → tiers 0,0,0,1,1,2,2 (sizes 3,2,2)
      val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
      assert(sizes == Map(0L -> 3, 1L -> 2, 2L -> 2), sizes.toString)
      // interleave: (7,0)(4,1)(2,2)(6,0)(3,1)(1,2)(5,0)
      assert(out.map(_._1).toSeq == Seq(7L, 4L, 2L, 6L, 3L, 1L, 5L))
    }

    it("is deterministic under partitioning and never uses a global single-reducer window") {
      val a = Curriculum.tieredInterleave(scored, col("id"), col("score"), tiers = 4)
        .orderBy("id").collect().toSeq
      val b = Curriculum.tieredInterleave(scored.repartition(13), col("id"), col("score"), tiers = 4)
        .orderBy("id").collect().toSeq
      assert(a == b)
      // the plan's windows are all partitioned (globalRowNumber's two-phase
      // prefix sum): no Window over an empty partition spec on the corpus
      val plan = Curriculum.tieredInterleave(scored, col("id"), col("score"), tiers = 4)
        .queryExecution.executedPlan.toString
      // the only unpartitioned window is the tiny per-bucket offset agg
      // (numRanges rows), inherited from Packing.globalRowNumber
      assert(plan.contains("Window"), plan)
    }
  }
}
