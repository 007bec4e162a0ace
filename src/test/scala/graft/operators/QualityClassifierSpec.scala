package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns

/** QualityClassifier: the spec pins TRAINING (non-SQL-expressible, the
  * k-means precedent) and the exact-integer scoring contract; the
  * driver oracle (q105) pins scoring itself end-to-end.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // good/bad vocabularies chosen hash-collision-free at dim 32
  // (verified via TextFns.hash60Value below — the spec would be
  // meaningless if a good and a bad word shared a bucket)
  private val goodWords = Seq("fresh", "clean", "crisp", "bright")
  private val badWords = Seq("spam", "trash", "scam", "noise")
  private val dim = 32

  private val corpus = Seq(
    ("fresh clean", 1.0), ("clean bright fresh", 1.0), ("crisp fresh", 1.0),
    ("bright crisp clean", 1.0),
    ("spam trash", 0.0), ("trash noise spam", 0.0), ("scam noise", 0.0),
    ("noise spam scam", 0.0))

  describe("QualityClassifier.train") {
    it("vocabularies do not collide in the hash buckets (spec precondition)") {
      val buckets = (goodWords ++ badWords).map(w => TextFns.hash60Value(w) % dim)
      assert(buckets.distinct.size == buckets.size)
    }

    it("learns to separate good from bad vocabulary; the fixed-point model reproduces it") {
      val df = corpus.toDF("text", "y")
      val model = QualityClassifier.train(df, col("text"), col("y"),
        dim = dim, epochs = 40, lr = 4.0)
      val got = QualityClassifier.score(df, col("text"), model)
        .select(col("y"), col("keep")).as[(Double, Boolean)].collect()
      got.foreach { case (y, keep) => assert(keep == (y == 1.0)) }
    }
  }

  describe("QualityClassifier.score") {
    it("feat_sum is the exact integer bucket-weight sum and the gate is the integer inequality") {
      // hand-computable model: weight = bucket index in micros
      val model = QualityClassifier.Model((0 until dim).map(_.toLong * 1000L), -30000L)
      val df = Seq("fresh spam", "", "noise").toDF("text")
      val got = QualityClassifier.score(df, col("text"), model)
        .select(col("text"), col("n_tok"), col("feat_sum"), col("keep"))
        .as[(String, Long, Long, Boolean)].collect().sortBy(_._1)

      def w(tok: String): Long = (TextFns.hash60Value(tok) % dim) * 1000L
      val byText = got.map(r => r._1 -> r).toMap
      assert(byText("fresh spam")._2 == 2L)
      assert(byText("fresh spam")._3 == w("fresh") + w("spam"))
      assert(byText("fresh spam")._4 ==
        (-30000L * 2 + w("fresh") + w("spam") >= 0))
      // empty text: ONE empty token (split keeps empties), scored like
      // any other token — totality, no special case
      assert(byText("")._2 == 1L)
      assert(byText("")._3 == w(""))
      assert(byText("noise")._4 == (-30000L + w("noise") >= 0))
    }
  }
}
