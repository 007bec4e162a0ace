package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CupedSpec extends SparkSpec {
  import spark.implicits._

  describe("Cuped.adjustedMeans") {
    // events: (user, arm, x-part, y-part) — u4's rows are split to prove
    // the unit-level aggregation happens before the moments
    val events = Seq(
      (1L, 0L, 10L, 20L), (2L, 0L, 20L, 40L), (3L, 1L, 10L, 30L),
      (4L, 1L, 30L, 0L), (4L, 1L, 0L, 50L))
      .toDF("user_id", "arm", "x", "y")

    it("matches the hand-computed pooled theta and adjusted arm means") {
      val out = Cuped.adjustedMeans(events, col("user_id"), col("arm"),
          col("x"), col("y"))
        .as[(Long, Long, Long, Long, Double, Double, Double)]
        .collect().map(r => r._1 -> r).toMap
      // units: (10,20) (20,40) (10,30) (30,50); moments by hand:
      val (n, sx, sy, sxy, sxx) = (4L, 70L, 140L, 2800L, 1500L)
      val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      def adj(sumX: Long, sumY: Long, nu: Long): Double =
        sumY.toDouble / nu - theta * (sumX.toDouble / nu - sx.toDouble / n)
      assert(out(0L)._2 == 2 && out(0L)._3 == 30L && out(0L)._4 == 60L)
      def r6(v: Double): Double = // Spark round() is HALF_UP, not rint's HALF_EVEN
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(0L)._6 == r6(adj(30, 60, 2)))
      assert(out(1L)._6 == r6(adj(40, 80, 2)))
      assert(out(0L)._7 == r6(theta))
      // the correction moves the two arms toward each other here: arm 0
      // had the lower pre-period spend, so its outcome is adjusted UP
      assert(out(0L)._6 > out(0L)._5 && out(1L)._6 < out(1L)._5)
    }

    it("is invariant under partitioning") {
      val big = (1 to 300).map { i =>
        (i.toLong, (i % 2).toLong, (i * 7 % 50).toLong, (i * 7 % 50 * 3 + i % 11).toLong)
      }.toDF("user_id", "arm", "x", "y")
      val a = Cuped.adjustedMeans(big, col("user_id"), col("arm"), col("x"), col("y"))
        .collect().map(_.toString).sorted.toSeq
      val b = Cuped.adjustedMeans(big.repartition(17), col("user_id"), col("arm"),
          col("x"), col("y"))
        .collect().map(_.toString).sorted.toSeq
      assert(a == b && a.size == 2)
    }
  }
}
