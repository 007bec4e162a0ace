package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AbTestsSpec extends SparkSpec {
  import spark.implicits._

  // units: arm0 = {10, 20, 30}, arm1 = {20, 40} (one value tied across arms)
  private val rows = Seq(
    (1L, 0L, 10L), (2L, 0L, 20L), (3L, 0L, 30L), (4L, 1L, 40L), (5L, 1L, 20L),
    (3L, 0L, 0L)) // unit 3 split across events: sums must happen first
    .toDF("unit", "grp0", "v").withColumn("grp", lit("g"))

  describe("AbTests.welch") {
    it("matches hand-computed means, t, and Welch df") {
      val out = AbTests.welch(rows, col("unit"), col("grp"), col("grp0"), col("v"))
        .as[(String, Long, Long, Double, Double, Double, Double)].head()
      val (m0, m1) = (20.0, 30.0)
      val v0 = ((10.0 - m0) * (10 - m0) + 0 + (30 - m0) * (30 - m0)) / 2 // 100
      val v1 = ((40.0 - m1) * (40 - m1) + (20 - m1) * (20 - m1)) / 1     // 200
      val (se0, se1) = (v0 / 3, v1 / 2)
      val t = (m0 - m1) / math.sqrt(se0 + se1)
      val dfW = (se0 + se1) * (se0 + se1) / (se0 * se0 / 2 + se1 * se1 / 1)
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out == (("g", 3L, 2L, r6(m0), r6(m1), r6(t), r6(dfW))))
    }
  }

  describe("AbTests.mannWhitneyU") {
    it("matches hand-computed tie-averaged U statistics") {
      // sorted unit sums: 10, 20, 20, 30, 40 → avg ranks 1, 2.5, 2.5, 4, 5
      // arm0 ranks {1, 2.5, 4} → R0 = 7.5, U0 = 7.5 − 3·4/2 = 1.5 → ×2 = 3
      // arm1 ranks {2.5, 5} → R1 = 7.5, U1 = 7.5 − 2·3/2 = 4.5 → ×2 = 9
      val out = AbTests.mannWhitneyU(rows, col("unit"), col("grp"), col("grp0"), col("v"))
        .as[(String, Long, Long, Long, Long)].head()
      assert(out == (("g", 3L, 2L, 3L, 9L)))
      assert(out._4 + out._5 == 2 * out._2 * out._3) // U0+U1 ≡ n0·n1
    }

    it("is partitioning-invariant with many ties") {
      val big = (1 to 400).map(i => (i.toLong, (i % 2).toLong, (i % 5).toLong))
        .toDF("unit", "grp0", "v").withColumn("grp", col("unit") % 3)
      val a = AbTests.mannWhitneyU(big, col("unit"), col("grp"), col("grp0"), col("v"))
        .collect().map(_.toString).sorted.toSeq
      val b = AbTests.mannWhitneyU(big.repartition(11), col("unit"), col("grp"),
          col("grp0"), col("v"))
        .collect().map(_.toString).sorted.toSeq
      assert(a == b && a.size == 3)
    }
  }
}
