package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  // "common" appears in every doc (df=4 → idf floor), each doc has one
  // rare marker term (df=1) plus fillers
  private val corpus = Seq(
    (1L, "common alpha alpha filler"),
    (2L, "common beta beta filler"),
    (3L, "common gamma gamma gamma"),
    (4L, "common delta filler other")
  ).toDF("doc_id", "text")

  describe("Keywords.tfidfTopK") {
    it("ranks rare terms above ubiquitous ones at equal tf") {
      val top1 = Keywords.tfidfTopK(corpus, col("doc_id"), col("text"), 1)
        .select("doc_id", "term").as[(Long, String)].collect().toMap
      assert(top1 == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma", 4L -> "delta"))
    }

    it("tf scales the idf linearly and ties break by term") {
      val r = Keywords.tfidfTopK(corpus, col("doc_id"), col("text"), 4)
        .filter(col("doc_id") === 4L)
        .select("term", "score", "rank").as[(String, Long, Int)].collect()
        .sortBy(_._3)
      // delta, filler, other all tf=1: delta df=1; filler df=3; other df=1
      // → delta and other tie on score, term order breaks it
      assert(r.map(_._1).toSeq == Seq("delta", "other", "filler", "common"))
      assert(r(0)._2 == r(1)._2)
    }

    it("a maxDf above every term's df changes NOTHING (the cap bounds cost, not answers)") {
      val un = Keywords.tfidfTopK(corpus, col("doc_id"), col("text"), 4)
        .orderBy("doc_id", "rank").collect().toSeq
      val capped = Keywords.tfidfTopK(corpus, col("doc_id"), col("text"), 4, maxDf = 4L)
        .orderBy("doc_id", "rank").collect().toSeq
      assert(capped == un)
    }

    it("a binding maxDf drops only the ubiquitous terms; kept terms' scores are unchanged") {
      // "common" has df=4; cap at 3 removes it from candidacy
      val un = Keywords.tfidfTopK(corpus, col("doc_id"), col("text"), 4)
        .select("doc_id", "term", "score")
        .as[(Long, String, Long)].collect().toSet
      val capped = Keywords.tfidfTopK(corpus, col("doc_id"), col("text"), 4, maxDf = 3L)
        .select("doc_id", "term", "score")
        .as[(Long, String, Long)].collect().toSet
      assert(!capped.exists(_._2 == "common"))
      assert(capped == un.filterNot(_._2 == "common"))
    }

    it("is invariant under repartitioning") {
      val a = Keywords.tfidfTopK(corpus, col("doc_id"), col("text"), 2)
        .collect().map(_.toSeq).toSet
      val b = Keywords.tfidfTopK(corpus.repartition(7), col("doc_id"), col("text"), 2)
        .collect().map(_.toSeq).toSet
      assert(a == b)
    }

    it("broadcasts the df and stats sides: no sort-merge join, no cartesian product") {
      val plan = Keywords.tfidfTopK(corpus, col("doc_id"), col("text"), 2)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    }
  }
}
