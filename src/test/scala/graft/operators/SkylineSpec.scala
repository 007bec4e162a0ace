package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  // (x, y, id): frontier of "smaller x, strictly smaller y than every
  // earlier (x, id) row" = ids 1, 3, 6
  private val pts = Seq(
    (1.0, 50L, 1L), (2.0, 60L, 2L), (2.0, 40L, 3L),
    (3.0, 45L, 4L), (3.0, 40L, 5L), (4.0, 10L, 6L), (5.0, 10L, 7L)
  ).toDF("x", "y", "id")

  describe("Skyline.paretoFrontier2d") {
    it("matches the hand-checked frontier") {
      val r = Skyline.paretoFrontier2d(pts, "x", "y", "id", numRanges = 3)
        .select("id").as[Long].collect().sorted.toSeq
      assert(r == Seq(1L, 3L, 6L))
    }

    it("equals the single-window cumulative-min form on random-ish data") {
      val big = (1L to 5000L)
        .map(i => ((i * 2654435761L % 9973L).toDouble, (i * 40503L % 7919L), i))
        .toDF("x", "y", "id")
      val dist = Skyline.paretoFrontier2d(big, "x", "y", "id", numRanges = 7)
        .select("id").as[Long].collect().toSet
      val w = Window.orderBy(col("x"), col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val single = big.withColumn("b", min(col("y")).over(w))
        .filter(col("b").isNull || col("y") < col("b"))
        .select("id").as[Long].collect().toSet
      assert(dist == single, s"diff: ${(dist diff single) ++ (single diff dist)}")
    }

    it("never funnels the data through a single-partition window") {
      val plan = Skyline.paretoFrontier2d(pts, "x", "y", "id", numRanges = 3)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"), plan)
      // the finishing window runs parallel, partitioned by the range
      // partition id (the range exchange itself is materialized behind
      // the pid-pinning checkpoint, so it isn't in THIS plan's text)
      assert(plan.toLowerCase.contains("hashpartitioning(__pid"), plan)
    }
  }
}
