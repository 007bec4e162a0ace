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
        .as[(String, Long, Long, Long, Long, Long, Long)].head()
      val reported = rows.count { case (i, _, t) => t != flips(i, 4, 1) }
      assert(got == (("g", 40L, reported.toLong,
        4L * reported - 40L, 2L, 3L, 1L)))
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

    it("releases epsilon as the exact rational, never a float log") {
      val df = Seq((1L, "g", true)).toDF("id", "grp", "truth")
      val eps = Privacy.rrRelease(df, col("grp"), col("truth"), col("id"),
          flipNum = 1, flipDen = 10)
        .select(col("eps_num"), col("eps_den")).as[(Long, Long)].head()
      // eps = ln(9/1) is the CALLER's derivation — the release carries (9, 1)
      assert(eps == ((9L, 1L)))
      intercept[IllegalArgumentException] {
        Privacy.rrRelease(df, col("grp"), col("truth"), col("id"),
          flipNum = 2, flipDen = 4)
      }
    }

    it("excludes null-truth/null-id rows from n AND the report sum") {
      val df = Seq(
        (java.lang.Long.valueOf(1L), "g", java.lang.Boolean.TRUE),
        (java.lang.Long.valueOf(2L), "g", null.asInstanceOf[java.lang.Boolean]),
        (null.asInstanceOf[java.lang.Long], "g", java.lang.Boolean.TRUE))
        .toDF("id", "grp", "truth")
      val got = Privacy.rrRelease(df, col("grp"), col("truth"), col("id"))
        .select(col("n"), col("n_reported")).as[(Long, Long)].head()
      val clean = Privacy.rrRelease(
          Seq((1L, "g", true)).toDF("id", "grp", "truth"),
          col("grp"), col("truth"), col("id"))
        .select(col("n"), col("n_reported")).as[(Long, Long)].head()
      assert(got == clean) // contract violations drop from BOTH counts
      assert(got._1 == 1L)
    }
  }

  describe("Privacy.dgeoThresholds") {
    it("matches the exact closed-form CDF on the 2^60 lattice (alpha = 1/2)") {
      val (b, thr) = Privacy.dgeoThresholds(1, 2)
      // smallest B with (1/2)^B * 2^60 < 1 is 61
      assert(b == 61)
      assert(thr.length == 2 * b)
      // goldens against hand-derived exact values:
      // CDF(-1) = alpha/(1+alpha) = 1/3 -> floor(2^60/3)
      assert(thr(b - 1) == ((BigInt(1) << 60) / 3).toLong)
      // CDF(0) = 1 - alpha/(1+alpha) = 2/3 -> floor(2^61/3)
      assert(thr(b) == ((BigInt(1) << 61) / 3).toLong)
      // CDF(-2) = alpha^2/(1+alpha) = 1/6
      assert(thr(b - 2) == ((BigInt(1) << 60) / 6).toLong)
      // monotone nondecreasing, all on the lattice
      assert(thr.zip(thr.tail).forall { case (a2, c) => a2 <= c })
      assert(thr.head >= 0 && thr.last < (1L << 60))
      // mass below the bound is under lattice resolution: t_0 == 0
      assert(thr.head == 0L)
    }

    it("rejects degenerate ratios") {
      intercept[IllegalArgumentException] { Privacy.dgeoThresholds(2, 2) }
      intercept[IllegalArgumentException] { Privacy.dgeoThresholds(0, 2) }
    }

    it("quantized CDF keeps the exact symmetry CDF(z) + CDF(-z-1) = 1 at every ratio") {
      // closed forms: CDF(-m) = a^m/(1+a) and 1 - CDF(m-1) = a^m/(1+a),
      // so the true CDF satisfies CDF(z) + CDF(-z-1) = 1 exactly; on the
      // floor-quantized lattice the pair sums to 2^60 or 2^60 - 1
      // (floor(x) + floor(S - x) = S - [x not on the lattice])
      val lattice = BigInt(1) << 60
      for ((an, ad) <- Seq((1L, 2L), (3L, 4L), (1L, 3L), (9L, 10L))) {
        val (b, thr) = Privacy.dgeoThresholds(an, ad)
        // thr(i) = floor(2^60 CDF(i-b)); pair indices (i, 2b-1-i) are
        // (z, -z-1) pairs
        (0 until b).foreach { i =>
          val s = BigInt(thr(i)) + BigInt(thr(2 * b - 1 - i))
          assert(s == lattice || s == lattice - 1,
            s"alpha=$an/$ad i=$i sum=$s")
        }
      }
    }
  }

  describe("Privacy.dgeoSumRelease") {
    // driver-side replay of the in-plan draws: u = hash60(seed||grp),
    // z = -B + |{t_i <= u}|; sum leg seeds "dgeo:", count leg "dgeo_n:"
    def drawZ(grp: String, alphaNum: Long, alphaDen: Long,
              seed: String = "dgeo:"): Long = {
      val (b, thr) = Privacy.dgeoThresholds(alphaNum, alphaDen)
      val u = TextFns.hash60Value(s"$seed$grp")
      thr.count(_ <= u).toLong - b
    }

    it("releases the clamped sum AND the count, each plus its own seeded draw") {
      val df = Seq(("g", 100L), ("g", 500L), ("g", -7L), ("h", 10L))
        .toDF("grp0", "v")
      val got = Privacy.dgeoSumRelease(df, col("grp0"), col("v"), clampHi = 400L)
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .sortBy(_._1).toSeq
      // g: clamp(100)+clamp(500)+clamp(-7) = 100+400+0 = 500; the exact
      // count (unbounded loss under add/remove adjacency) is noised with
      // an INDEPENDENT draw seeded dgeo_n:
      assert(got == Seq(
        ("g", 3L + drawZ("g", 1, 2, "dgeo_n:"),
          500L + drawZ("g", 1, 2), 400L, 2L, 1L),
        ("h", 1L + drawZ("h", 1, 2, "dgeo_n:"),
          10L + drawZ("h", 1, 2), 400L, 2L, 1L)))
    }

    it("noise replays across runs and alpha controls the accounting") {
      val df = Seq(("a", 5L)).toDF("grp0", "v")
      def run() = Privacy.dgeoSumRelease(df, col("grp0"), col("v"),
          clampHi = 10L, alphaNum = 3, alphaDen = 4)
        .select(col("released_sum"), col("eps_num"), col("eps_den"))
        .as[(Long, Long, Long)].head()
      val first = run()
      assert(first == run()) // deterministic coin: same noise every run
      assert(first._2 == 4L && first._3 == 3L) // eps = (clampHi+1) * ln(4/3)
      assert(first._1 == 5L + drawZ("a", 3, 4))
    }

    it("excludes null value/group rows explicitly") {
      val df = Seq(
        ("a", java.lang.Long.valueOf(5L)),
        ("a", null.asInstanceOf[java.lang.Long]))
        .toDF("grp0", "v")
      val got = Privacy.dgeoSumRelease(df, col("grp0"), col("v"), clampHi = 10L)
        .select(col("released_n")).as[Long].head()
      assert(got == 1L + drawZ("a", 1, 2, "dgeo_n:"))
    }
  }
}
