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

  describe("AbTests.sprtMonitor") {
    // llr constants for H0 p=1/2 vs H1 p=3/4: +584962 / −1000000, bound 4247927
    val (su, fu, bu) = (584962L, -1000000L, 4247927L)

    it("accumulates the llr per day and decides at the first crossing") {
      // day 1: 5 of 6 success → llr = 5·584962 − 1000000 = 1924810 (continue)
      // day 2: +5/5 → llr = 10·584962 − 1000000 = 4849620 ≥ bound → h1
      // day 3: all failures, llr falls back BELOW the bound — state stays h1
      val rows = (1 to 6).map(i => ("e", 1, i != 6)) ++
        (1 to 5).map(_ => ("e", 2, true)) ++ (1 to 9).map(_ => ("e", 3, false))
      val df = rows.toDF("exp", "day", "succ")
      val got = AbTests.sprtMonitor(df, col("exp"), col("day"), col("succ"), su, fu, bu)
        .as[(String, Int, Long, Long, Long, String)].collect().sortBy(_._2).toSeq
      assert(got == Seq(
        ("e", 1, 6L, 5L, 1924810L, "continue"),
        ("e", 2, 11L, 10L, 4849620L, "h1"),
        ("e", 3, 20L, 10L, -4150380L, "h1")))
    }

    it("accepts h0 when the llr drifts below the negative bound") {
      // 5 failures/day: llr after day d = −5d·10⁶ → crosses −bound on day 1
      val rows = for (d <- 1 to 2; _ <- 1 to 5) yield ("e", d, false)
      val got = AbTests.sprtMonitor(rows.toDF("exp", "day", "succ"),
          col("exp"), col("day"), col("succ"), su, fu, bu)
        .as[(String, Int, Long, Long, Long, String)].collect().sortBy(_._2).toSeq
      assert(got.map(_._6) == Seq("h0", "h0"))
      assert(got.head._5 == -5000000L)
    }

    it("monitors experiments independently") {
      val rows = Seq(("a", 1, false), ("b", 1, true))
      val got = AbTests.sprtMonitor(rows.toDF("exp", "day", "succ"),
          col("exp"), col("day"), col("succ"), su, fu, bu)
        .as[(String, Int, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(got.map(g => (g._1, g._5, g._6)) ==
        Seq(("a", -1000000L, "continue"), ("b", 584962L, "continue")))
    }

    it("rejects same-sign llr increments (one hypothesis unreachable)") {
      val df = Seq(("e", 1, true)).toDF("exp", "day", "succ")
      // both positive: llr_u is monotone nondecreasing, h0 unreachable
      intercept[IllegalArgumentException] {
        AbTests.sprtMonitor(df, col("exp"), col("day"), col("succ"),
          llrSuccU = 2L, llrFailU = 1L, boundU = 10L)
      }
      // both negative: h1 unreachable
      intercept[IllegalArgumentException] {
        AbTests.sprtMonitor(df, col("exp"), col("day"), col("succ"),
          llrSuccU = -1L, llrFailU = -2L, boundU = 10L)
      }
    }
  }
}
