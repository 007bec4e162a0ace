package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private val rules = QualityRules.Rules(
    minWords = 3, maxWords = 10, minMeanLenFp = 200, maxMeanLenFp = 600,
    minStopHits = 1, maxTopFracFp = 500)

  private val corpus = Seq(
    (1L, "the cat sat on a mat"),        // 6 words, passes everything
    (2L, "go go go go go go"),           // top_frac 1000 > 500 → repetition fail
    (3L, "hi by"),                       // 2 words < 3 → length fail
    (4L, "zz yy xx ww vv"),              // no stopwords → stopword fail
    (5L, "the verylongwordhereok similarlyhugetoken anotherbigone more")
  ).toDF("doc_id", "text")               // mean len 1040/100... > 600 → fail

  describe("QualityRules.score") {
    it("computes the fixed-point metrics exactly") {
      val m = QualityRules.score(corpus, col("doc_id"), col("text"), rules)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      // doc 1: 6 words, sum_len 15 → 250; 3 stop hits; top_mult 1 → 166
      assert(m(0) == ((1L, 6L, 250L, 3L, 166L, 1000L, 1L)))
      // doc 2: top word is the whole doc → 1000‰, distinct 1/6 → 166‰
      assert(m(1)._5 == 1000L && m(1)._6 == 166L && m(1)._7 == 0L)
      assert(m(2)._7 == 0L) // too short
      assert(m(3)._4 == 0L && m(3)._7 == 0L) // zero stop hits
      assert(m(4)._7 == 0L) // mean word length out of range
    }

    it("pass matches keep: the gate keeps exactly the pass=1 rows, all columns intact") {
      val passIds = QualityRules.score(corpus, col("doc_id"), col("text"), rules)
        .filter(col("pass") === 1L).select("doc_id").as[Long].collect().toSet
      val kept = QualityRules.keep(corpus, col("text"), rules)
      assert(kept.columns.toSeq == Seq("doc_id", "text"))
      assert(kept.select("doc_id").as[Long].collect().toSet == passIds)
      assert(passIds == Set(1L))
    }

    it("keep is a zero-shuffle narrow filter") {
      val plan = QualityRules.keep(corpus, col("text"), rules)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    }

    it("max word multiplicity via sorted-run fold matches a groupBy count") {
      val expected = corpus
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nw"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "nw", "w").count()
        .groupBy("doc_id", "nw").agg(max("count").as("m"))
        .select(col("doc_id"), expr("m * 1000 div nw").as("fp"))
        .as[(Long, Long)].collect().toMap
      val got = QualityRules.score(corpus, col("doc_id"), col("text"), rules)
        .select(col("doc_id"), col("top_frac_fp"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected)
    }
  }
}
