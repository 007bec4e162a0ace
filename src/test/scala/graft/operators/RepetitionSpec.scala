package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher-style repetition metrics: hand-computed fractions, the
  * deterministic tie-break on the arg-max gram, and totality for docs
  * too short to have any n-gram. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(rows: Seq[(Long, String)], n: Int) =
    Repetition.ngramStats(rows.toDF("id", "text"), col("id"), col("text"), n)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[String]("top_gram"),
          Option(r.getAs[java.lang.Double]("top_gram_frac")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("dup_gram_frac")).map(_.doubleValue))))
      .toMap

  describe("Repetition.ngramStats") {
    it("computes top/duplicate bigram fractions (hand-computed)") {
      val got = statsOf(Seq(
        (1L, "x y x y x"),   // bigrams: x y, y x, x y, y x → all duplicated
        (2L, "a b c d"),     // all bigrams unique
        (3L, "t t t a b")),  // t t ×2, t a, a b
        n = 2)
      // doc 1: 4 bigrams, tie 2-2 between "x y" and "y x" → greatest wins
      assert(got(1L) == ((4L, "y x", Some(0.5), Some(1.0))))
      // doc 2: 3 unique bigrams → top is the greatest gram at 1/3, no dups
      assert(got(2L) == ((3L, "c d", Some(0.333333), Some(0.0))))
      // doc 3: 4 bigrams, "t t" twice
      assert(got(3L) == ((4L, "t t", Some(0.5), Some(0.5))))
    }

    it("is total: a doc with fewer than n tokens reports zero grams and null fractions") {
      val got = statsOf(Seq((1L, "solo"), (2L, "a b")), n = 2)
      assert(got(1L) == ((0L, null, None, None)))
      assert(got(2L) == ((1L, "a b", Some(1.0), Some(0.0))))
    }
  }
}
