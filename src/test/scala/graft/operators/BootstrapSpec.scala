package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFns

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def jvmWeight(rep: Int, unit: Long): Long = {
    val u = TextFns.hash60Value(s"$rep:$unit") % 1000000L
    if (u < 367879L) 0L else if (u < 735759L) 1L else if (u < 919699L) 2L
    else if (u < 981012L) 3L else if (u < 996340L) 4L else 5L
  }

  describe("Bootstrap.meanCi") {
    val rows = (1 to 60).map(i => (i.toLong, "g", (i % 7 + 1).toLong))
      .toDF("unit", "grp", "v")

    it("matches a JVM replay of every replica's weighted mean and the CI ranks") {
      val b = 20
      val out = Bootstrap.meanCi(rows, col("unit"), col("grp"), col("v"),
          b = b, loIdx = 2, hiIdx = 19)
        .as[(String, Long, Double, Double, Double)].head()
      val unitVals = (1 to 60).map(i => i.toLong -> (i % 7 + 1).toLong)
      val means = (1 to b).flatMap { rep =>
        val ws = unitVals.map { case (u, v) => (jvmWeight(rep, u), v) }
        val sw = ws.map(_._1).sum
        if (sw > 0) Some((ws.map { case (w, v) => w * v }.sum.toDouble / sw, rep))
        else None
      }.sorted
      def r6(v: Double): Double =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out._2 == 60L)
      assert(out._3 == r6(unitVals.map(_._2).sum.toDouble / 60))
      assert(out._4 == r6(means(1)._1) && out._5 == r6(means(18)._1))
      assert(out._4 < out._3 && out._3 < out._5) // the CI brackets the mean
    }

    it("weights follow the Poisson(1) thresholds and are partitioning-invariant") {
      val counts = (1 to 50).flatMap(r => (1L to 200L).map(u => jvmWeight(r, u)))
        .groupBy(identity).view.mapValues(_.size).toMap
      // ~36.8% zeros / ~36.8% ones out of 10 000 draws
      assert(counts(0L) > 3300 && counts(0L) < 4100)
      assert(counts(1L) > 3300 && counts(1L) < 4100)
      val a = Bootstrap.meanCi(rows, col("unit"), col("grp"), col("v"), 20, 2, 19)
        .collect().map(_.toString).toSeq
      val bb = Bootstrap.meanCi(rows.repartition(13), col("unit"), col("grp"),
          col("v"), 20, 2, 19)
        .collect().map(_.toString).toSeq
      assert(a == bb)
    }
  }
}
