package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  // texts built so 3-shingle overlap is controlled exactly:
  // base shares its full 4-shingle run; "noise…" shares nothing
  private val base = "alpha beta gamma delta epsilon zeta"
  private val pairs = Seq(
    (10L, "s1", base, "noise one two three four"),       // clean pair
    (20L, "s1", "unrelated text with no overlap here", base), // rejected ≈ 10's chosen
    (30L, "s2", "one two three four five six", "one two three four seven eight"))
    .toDF("pair_id", "source", "chosen_text", "rejected_text")

  describe("Preference.crossRoleLeakage") {
    it("finds rejected≈chosen across pairs and excludes the same-pair diagonal") {
      val got = Preference.crossRoleLeakage(pairs, col("pair_id"),
          col("chosen_text"), col("rejected_text"), w = 3, minShared = 3)
        .as[(Long, Long, Long)].collect().toSet
      // pair 20's rejected is byte-equal to pair 10's chosen: 4 shared
      // shingles; pair 30's own chosen/rejected share 2 shingles but the
      // diagonal is excluded anyway, and 2 < minShared across pairs
      assert(got == Set((10L, 20L, 4L)))
    }
  }

  describe("Preference.pairContamination") {
    it("rolls leg-level eval hits up to the pair frame") {
      val eval = Seq((900L, base), (901L, "one two three four nine ten"))
        .toDF("doc_id", "text")
      val got = Preference.pairContamination(pairs, col("pair_id"),
          col("chosen_text"), col("rejected_text"),
          eval, col("doc_id"), col("text"), w = 3, minShared = 2)
        .as[(Long, Long, Long, Long)].collect().toSet
      // pair 10: chosen leg ≡ eval 900 (4 shingles) AND its rejected leg
      // shares 2 shingles with eval 901 → 2 eval docs, 2 legs; pair 20:
      // rejected leg ≡ eval 900; pair 30: BOTH legs share 2 with 901
      assert(got == Set((10L, 2L, 2L, 4L), (20L, 1L, 1L, 4L), (30L, 1L, 2L, 2L)))
    }
  }

  describe("Preference plan shapes") {
    it("no operator ever plans a cartesian; the skew global is ONE bounded broadcast") {
      def plan(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.toString
      def count(p: String, n: String) = p.sliding(n.length).count(_ == n)
      val eval = Seq((900L, base)).toDF("doc_id", "text")
      val leak = plan(Preference.crossRoleLeakage(pairs, col("pair_id"),
        col("chosen_text"), col("rejected_text")))
      val cont = plan(Preference.pairContamination(pairs, col("pair_id"),
        col("chosen_text"), col("rejected_text"), eval, col("doc_id"), col("text")))
      val skew = plan(Preference.lengthSkewAudit(pairs, col("source"),
        length(col("chosen_text")), length(col("rejected_text"))))
      Seq(leak, cont, skew).foreach { p =>
        assert(count(p, "CartesianProduct") == 0, p)
      }
      // the only nested-loop anywhere is the 1-row global broadcast
      assert(count(skew, "BroadcastNestedLoopJoin") == 1, skew)
      assert(count(leak, "BroadcastNestedLoopJoin") == 0, leak)
      assert(count(cont, "BroadcastNestedLoopJoin") == 0, cont)
    }
  }

  describe("Preference.lengthSkewAudit") {
    it("computes per-source longer-chosen ppm vs the global rate, exact") {
      val p = Seq(
        ("a", 10L, 5L), ("a", 10L, 20L), ("a", 10L, 3L), // 2/3 longer
        ("b", 1L, 2L))                                    // 0/1 longer
        .toDF("source", "chosen_len", "rejected_len")
      val got = Preference.lengthSkewAudit(p, col("source"),
          col("chosen_len"), col("rejected_len"))
        .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      // global: 2/4 = 500000 ppm
      assert(got == Seq(
        ("a", 3L, 666666L, 500000L, 166666L),
        ("b", 1L, 0L, 500000L, -500000L)))
    }
  }
}
