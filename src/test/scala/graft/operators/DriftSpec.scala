package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  // three lookalike groups and one vocabulary-shifted outlier
  private val corpus = Seq(
    ("a", "data table query join scan"),
    ("a", "table query join scan data"),
    ("b", "data table query join scan"),
    ("b", "query join scan data table"),
    ("c", "data table query join scan"),
    ("z", "zebra quark xylophone umlaut fjord")
  ).toDF("source", "text")

  describe("Drift.unigramKl") {
    it("scores the vocabulary-shifted group far above the lookalikes") {
      val r = Drift.unigramKl(corpus, col("source"), col("text"))
        .as[(String, Long, Long)].collect().map(x => x._1 -> x._3).toMap
      assert(r("z") > r("a") && r("z") > r("b") && r("z") > r("c"))
      // z's tokens are exclusive to z (p_z(t)/p_C(t) = 6×, true KL
      // ≈ 2.59 → ~2650 fp) while the others share all their tokens
      // (true KL ≈ 0.26 → ~270 fp; the 10-bit mantissa overshoots to
      // ~384 — deterministic, just not float-accurate)
      assert(r("z") > 2000L, s"expected ~2650 for z, got ${r("z")}")
      assert(math.abs(r("a")) < 500 && math.abs(r("c")) < 500)
    }

    it("computes the fixed-point value exactly on a hand-checked split") {
      // two groups, disjoint single-token vocabularies, equal sizes:
      // KL = log2(2) = 1 → kl_fp = 1024 exactly (all L args are powers
      // of two, where the mantissa interpolation is exact)
      val half = Seq(("g1", "aa aa aa aa"), ("g2", "bb bb bb bb"))
        .toDF("source", "text")
      val r = Drift.unigramKl(half, col("source"), col("text"))
        .as[(String, Long, Long)].collect().map(x => x._1 -> x._3).toMap
      assert(r == Map("g1" -> 1024L, "g2" -> 1024L))
    }

    it("a maxVocab at or above the vocabulary changes NOTHING (cap bounds cost, not answers)") {
      val un = Drift.unigramKl(corpus, col("source"), col("text"))
        .as[(String, Long, Long)].collect().toSet
      // 10 distinct terms in the corpus; cap at exactly 10
      val capped = Drift.unigramKl(corpus, col("source"), col("text"), maxVocab = 10)
        .as[(String, Long, Long)].collect().toSet
      assert(capped == un)
    }

    it("a binding maxVocab coarsens the tail into one cell: totals hold, KL is a lower bound") {
      val un = Drift.unigramKl(corpus, col("source"), col("text"))
        .as[(String, Long, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap
      val capped = Drift.unigramKl(corpus, col("source"), col("text"), maxVocab = 3)
        .as[(String, Long, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap
      // per-group token totals are UNCHANGED by coarsening
      assert(capped.view.mapValues(_._1).toMap == un.view.mapValues(_._1).toMap)
      // z's exclusive vocabulary all falls in the coarsened cell, which the
      // lookalikes dominate → its KL drops but stays the clear outlier
      assert(capped("z")._2 > capped("a")._2 && capped("z")._2 <= un("z")._2)
      // deterministic: same result on a different partitioning
      val again = Drift.unigramKl(corpus.repartition(7), col("source"), col("text"),
        maxVocab = 3).as[(String, Long, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap
      assert(again == capped)
    }

    it("a surviving token literally spelled like the tail cell does not merge with it (ADVICE r9)") {
      // "other" (and even a forged control-char lookalike) is the DOMINANT
      // token, so it survives any cut; tail terms coarsen into TailCell.
      // If the sentinel could collide, renaming the dominant token would
      // change the coarsened KL — assert renaming symmetry instead.
      def mk(tok: String) = Seq(
        ("a", s"$tok $tok $tok alpha beta"),
        ("b", s"$tok $tok $tok gamma delta"),
        ("z", s"$tok zebra quark xylophone fjord")
      ).toDF("source", "text")
      def run(tok: String) =
        Drift.unigramKl(mk(tok), col("source"), col("text"), maxVocab = 1)
          .as[(String, Long, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap
      val base = run("keepme")
      assert(run("other") == base)
      assert(run("\u0001other") == base)
      // and the sentinel itself cannot be tokenized into existence
      assert(Drift.TailCell.contains(" "))
    }

    it("is invariant under repartitioning") {
      val a = Drift.unigramKl(corpus, col("source"), col("text"))
        .collect().map(_.toSeq).toSet
      val b = Drift.unigramKl(corpus.repartition(7), col("source"), col("text"))
        .collect().map(_.toSeq).toSet
      assert(a == b)
    }

    it("broadcasts the rollup tables: no sort-merge join, no cartesian") {
      val plan = Drift.unigramKl(corpus, col("source"), col("text"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    }
  }
}
