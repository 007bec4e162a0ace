package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "a b a b"), // bigrams: "a b", "b a", "a b"
    (1L, "a b c"))   // bigrams: "a b", "b c"
    .toDF("doc_id", "text")

  describe("NgramLm.ilog2") {
    it("is floor(log2) on positive counts") {
      val got = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).toDF("c")
        .select(NgramLm.ilog2(col("c"))).as[Long].collect().toSeq
      assert(got == Seq(0L, 1L, 1L, 2L, 2L, 3L, 9L, 10L))
    }
  }

  describe("NgramLm.train") {
    it("counts hashed n-grams with multiplicity") {
      val counts = NgramLm.train(corpus, col("text"), 2)
      // 3 distinct bigrams; "a b" occurs 3 times across the corpus
      assert(counts.count() == 3)
      assert(counts.agg(sum(col("cnt"))).head().getLong(0) == 5L)
      assert(counts.agg(max(col("cnt"))).head().getLong(0) == 3L)
    }
  }

  describe("NgramLm.score") {
    it("sums integer-log2 gram frequencies per doc") {
      val counts = NgramLm.train(corpus, col("text"), 2)
      val got = NgramLm.score(corpus, col("doc_id"), col("text"), counts, 2)
        .orderBy(col("lm_id")).as[(Long, Long, Long)].collect().toSeq
      // doc 0: ilog2(3) + ilog2(1) + ilog2(3) = 1 + 0 + 1; doc 1: 1 + 0
      assert(got == Seq((0L, 3L, 2L), (1L, 2L, 1L)))
    }

    it("penalizes out-of-vocabulary grams when scoring a new corpus") {
      val counts = NgramLm.train(corpus, col("text"), 2)
      val fresh = Seq((9L, "x y z")).toDF("doc_id", "text")
      val got = NgramLm.score(fresh, col("doc_id"), col("text"), counts, 2)
        .as[(Long, Long, Long)].head()
      assert(got == ((9L, 2L, -2L)))
      val custom = NgramLm.score(fresh, col("doc_id"), col("text"), counts, 2, oovIlog = -5L)
        .as[(Long, Long, Long)].head()
      assert(custom == ((9L, 2L, -10L)))
    }

    it("is total over docs too short to produce a gram") {
      val counts = NgramLm.train(corpus, col("text"), 2)
      val short = Seq((5L, "a")).toDF("doc_id", "text")
      val got = NgramLm.score(short, col("doc_id"), col("text"), counts, 2)
        .as[(Long, Long, Long)].head()
      assert(got == ((5L, 0L, 0L)))
    }
  }

  describe("NgramLm.fluent") {
    it("gates on the cross-multiplied rational mean") {
      val rows = Seq((2L, 3L), (2L, 4L), (0L, 0L), (3L, -3L))
        .toDF("n_grams", "ilog_sum")
      val got = rows.select(
        NgramLm.fluent(col("n_grams"), col("ilog_sum"), num = 2L, den = 1L))
        .as[Boolean].collect().toSeq
      // means: 1.5 < 2 → false; 2 ≥ 2 → true; gram-less passes; -1 < 2 → false
      assert(got == Seq(false, true, true, false))
    }
  }
}
