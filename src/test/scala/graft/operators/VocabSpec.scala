package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Vocabulary build by document frequency + per-doc OOV scoring:
  * hand-computed df threshold behavior (document frequency, not
  * occurrence count) and occurrence-weighted OOV fractions. */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs: "a" in all 4, "b" in 3, "c" in 1 (but 3 occurrences there)
  private val docs = Seq(
    (1L, "a b"),
    (2L, "a b"),
    (3L, "a b"),
    (4L, "a c c c")).toDF("id", "text")

  describe("Vocab.buildByDocFreq") {
    it("thresholds on document frequency, not occurrence count") {
      val vocab = Vocab.buildByDocFreq(docs, col("id"), col("text"), minDocFrac = 0.75)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // a: df 4, b: df 3 (= 0.75*4, inclusive), c: df 1 despite 3 occurrences
      assert(vocab == Map("a" -> 4L, "b" -> 3L))
    }

    it("maxVocab above the passing count changes NOTHING; a binding cap keeps top df") {
      val un = Vocab.buildByDocFreq(docs, col("id"), col("text"), minDocFrac = 0.25)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(un == Map("a" -> 4L, "b" -> 3L, "c" -> 1L))
      val loose = Vocab.buildByDocFreq(docs, col("id"), col("text"),
        minDocFrac = 0.25, maxVocab = 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(loose == un)
      val tight = Vocab.buildByDocFreq(docs, col("id"), col("text"),
        minDocFrac = 0.25, maxVocab = 2)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(tight == Map("a" -> 4L, "b" -> 3L))
    }
  }

  describe("Vocab.oovStats") {
    it("scores documents by OOV occurrence fraction") {
      val vocab = Vocab.buildByDocFreq(docs, col("id"), col("text"), minDocFrac = 0.75)
      val got = Vocab.oovStats(docs, col("id"), col("text"), vocab)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tok"), r.getAs[Long]("n_oov"), r.getAs[Double]("oov_frac"))))
        .toMap
      assert(got(1L) == ((2L, 0L, 0.0)))
      // doc 4: tokens a c c c → 3 of 4 occurrences are OOV
      assert(got(4L) == ((4L, 3L, 0.75)))
    }
  }
}
