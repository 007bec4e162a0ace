package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def flips(id: Long, den: Long, num: Long): Boolean =
    TextFns.hash60Value(s"rr:$id") % den < num

  describe("Privacy.rrRelease") {
    it("reports truth XOR the deterministic hash coin, exactly") {
      val rows = (0L until 40L).map(i => (i, "g", i % 3 == 0))
      val df = rows.toDF("id", "grp", "truth")
      val got = Privacy.rrRelease(df, col("grp"), col("truth"), col("id"))
        .as[(String, Long, Long, Long, Long, Long)].head()
      val reported = rows.count { case (i, _, t) => t != flips(i, 4, 1) }
      assert(got == (("g", 40L, reported.toLong,
        4L * reported - 40L, 2L, 1098612L)))
    }

    it("debiases exactly: T-hat = (den*R - num*N)/(den - 2*num)") {
      // truth-all-true group: every flip turns a report false, so
      // R = N - #flips and T-hat's numerator is den*(N-#flips) - num*N
      val n = 60L
      val df = (0L until n).map(i => (i, "a", true)).toDF("id", "grp", "truth")
      val nFlips = (0L until n).count(flips(_, 4, 1)).toLong
      val got = Privacy.rrRelease(df, col("grp"), col("truth"), col("id"))
        .select(col("n_reported"), col("t_hat_num")).as[(Long, Long)].head()
      assert(got == ((n - nFlips, 4L * (n - nFlips) - n)))
      // the exact-rational estimate should sit near the true count n
      assert(math.abs(got._2.toDouble / 2d - n) <= n * 0.35)
    }

    it("epsilon accounting follows the flip odds") {
      val df = Seq((1L, "g", true)).toDF("id", "grp", "truth")
      val eps = Privacy.rrRelease(df, col("grp"), col("truth"), col("id"),
        flipNum = 1, flipDen = 10).select(col("eps_ppm")).as[Long].head()
      assert(eps == math.round(math.log(9d) * 1000000d))
      intercept[IllegalArgumentException] {
        Privacy.rrRelease(df, col("grp"), col("truth"), col("id"),
          flipNum = 2, flipDen = 4)
      }
    }
  }
}
