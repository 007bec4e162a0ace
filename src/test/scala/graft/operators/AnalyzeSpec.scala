package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  // 10 rows, skewed: seven 5.0s and three distinct tails
  private val skewed = Seq(
    (1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 5.0), (5L, 5.0), (6L, 5.0),
    (7L, 5.0), (8L, 1.0), (9L, 9.0), (10L, 100.0)
  ).toDF("id", "v")

  describe("Analyze.tableStats") {
    it("hostile column names (quotes, dots, spaces, backticks) are data, not SQL (ADVICE r9)") {
      val hostile = Seq("we'ird \"name\"", "a.b`c", "plain")
      val r = Analyze.tableStats(skewed,
          hostile.map(nm => nm -> col("v")))
        .orderBy("col_name")
        .as[(String, Long, Long, Long, Boolean)].collect()
      assert(r.map(_._1).toSeq == hostile.sorted)
      // all three profile the same column → identical stats
      assert(r.map(x => (x._2, x._3, x._4)).distinct.toSeq == Seq((10L, 0L, 4L)))
    }

    it("profiles null fraction and NDV per column in one pass") {
      val df = Seq((Some(1), "x"), (None, "x"), (Some(3), "y"))
        .toDF("i", "s")
      val r = Analyze.tableStats(df, Seq("i" -> col("i"), "s" -> col("s")))
        .as[(String, Long, Long, Long, Boolean)].collect().map(x => x._1 -> x).toMap
      assert(r("i")._2 == 3L && r("i")._3 == 1L && r("i")._4 == 2L)
      assert(r("s")._2 == 3L && r("s")._3 == 0L && r("s")._4 == 2L)
    }
  }

  describe("Analyze.equiDepthHistogram") {
    it("buckets carry equal row counts (±1) regardless of value skew") {
      val h = Analyze.equiDepthHistogram(skewed, col("v"), col("id"), k = 4)
        .orderBy("bucket").as[(Long, Double, Double, Long, Long)].collect()
      assert(h.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
      assert(h.map(_._4).sum == 10L)
      assert(h.map(_._4).forall(n => n == 2L || n == 3L), h.mkString(","))
    }

    it("bucket boundaries are ordered and per-bucket stats exact") {
      val h = Analyze.equiDepthHistogram(skewed, col("v"), col("id"), k = 4)
        .orderBy("bucket").as[(Long, Double, Double, Long, Long)].collect()
      // rank order: 1.0, then the 5.0 run (ties broken by id), 9.0, 100.0
      assert(h(0)._2 == 1.0 && h.last._3 == 100.0)
      h.sliding(2).foreach {
        case Array(a, b) => assert(a._3 <= b._2, s"interleaved buckets: $a $b")
        case _ =>
      }
      // the 5.0 run splits across buckets (rank-based equi-depth), so
      // middle buckets have ndv 1 over the duplicated value
      assert(h(1)._5 == 1L && h(1)._2 == 5.0 && h(1)._3 == 5.0)
    }

    it("is invariant under repartitioning") {
      val a = Analyze.equiDepthHistogram(skewed, col("v"), col("id"), 3)
        .collect().map(_.toSeq).toSet
      val b = Analyze.equiDepthHistogram(skewed.repartition(7), col("v"), col("id"), 3)
        .collect().map(_.toSeq).toSet
      assert(a == b)
    }
  }
}
