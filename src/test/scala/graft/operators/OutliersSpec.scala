package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  // label 0: three points near the origin plus one far point (id 4);
  // label 1: two identical points → zero distances
  private val vecs = Seq(
    (1L, 0, Array(0.1f, 0.0f)),
    (2L, 0, Array(-0.1f, 0.0f)),
    (3L, 0, Array(0.0f, 0.1f)),
    (4L, 0, Array(0.9f, 0.9f)),
    (5L, 1, Array(0.5f, -0.5f)),
    (6L, 1, Array(0.5f, -0.5f))
  ).toDF("vec_id", "label", "embedding")

  describe("Outliers.classCentroids") {
    it("floor-divides sums exactly, including negative sums") {
      val c = Outliers.classCentroids(vecs, col("label"), col("embedding"), scale = 1024)
        .orderBy("label").as[(Int, Seq[Long])].collect()
      // label 0 dim 0: q = 102, -102, 0, 922 → s=922, n=4 → 230
      // (floor(102.4+0.5)=102; floor(-102.4+0.5)=-101? no: -0.1*1024=-102.4,
      //  +0.5 → -101.9 → floor → -102)
      assert(c(0)._2 == Seq(230L, 256L))
      // label 1 dim 1: q = -512, -512 → s=-1024, n=2 → -512 (floor-div
      // of a negative sum; truncation toward zero would also give -512
      // here, the NON-divisible negative case is pinned below)
      assert(c(1)._2 == Seq(512L, -512L))
    }

    it("pins floor semantics on a non-divisible negative sum") {
      val odd = Seq((1L, 0, Array(-0.1f)), (2L, 0, Array(0.0f))).toDF("vec_id", "label", "embedding")
      val c = Outliers.classCentroids(odd, col("label"), col("embedding"), scale = 1024)
        .as[(Int, Seq[Long])].collect()
      // s = -102, n = 2 → floor(-51.0) = -51; s = -103 would floor to -52
      assert(c(0)._2 == Seq(-51L))
      val odd2 = Seq((1L, 0, Array(-0.1005f)), (2L, 0, Array(0.0f))).toDF("vec_id", "label", "embedding")
      val c2 = Outliers.classCentroids(odd2, col("label"), col("embedding"), scale = 1024)
        .as[(Int, Seq[Long])].collect()
      // q1 = floor(-102.912+0.5) = -103 → s = -103 → floor(-51.5) = -52
      assert(c2(0)._2 == Seq(-52L))
    }
  }

  describe("Outliers.centroidOutliers") {
    it("ranks the far point first and breaks ties by vec_id") {
      val r = Outliers.centroidOutliers(vecs, col("vec_id"), col("label"),
          col("embedding"), m = 2)
        .orderBy("label", "rank").as[(Int, Long, Long, Int)].collect()
      assert(r(0)._1 == 0 && r(0)._2 == 4L && r(0)._4 == 1)
      // label 1: identical points → dist2 0 for both, id order breaks tie
      assert(r(2)._2 == 5L && r(3)._2 == 6L && r(2)._3 == 0L && r(3)._3 == 0L)
    }

    it("is invariant under repartitioning") {
      val a = Outliers.centroidOutliers(vecs, col("vec_id"), col("label"),
        col("embedding"), m = 3).collect().map(_.toSeq).toSet
      val b = Outliers.centroidOutliers(vecs.repartition(5), col("vec_id"),
        col("label"), col("embedding"), m = 3).collect().map(_.toSeq).toSet
      assert(a == b)
    }

    it("broadcasts the centroid table: no sort-merge join, no cartesian") {
      val plan = Outliers.centroidOutliers(vecs, col("vec_id"), col("label"),
          col("embedding"), m = 2)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    }
  }
}
