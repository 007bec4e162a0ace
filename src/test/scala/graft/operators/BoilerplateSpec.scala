package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  describe("Boilerplate.removeFrequentLines") {

    it("removes exactly the lines in more than maxDocs distinct docs, preserving line order") {
      val docs = Seq(
        (1L, "unique alpha\nBOILER\nunique beta"),
        (2L, "BOILER\nunique gamma"),
        (3L, "unique delta\nBOILER"),
        (4L, "unique epsilon only")).toDF("id", "text")
      val out = Boilerplate.removeFrequentLines(docs, col("id"), col("text"), maxDocs = 2)
        .orderBy("bp_id").collect()
      assert(out.map(_.getAs[String]("clean_text")).toSeq == Seq(
        "unique alpha\nunique beta", "unique gamma", "unique delta", "unique epsilon only"))
      assert(out.map(_.getAs[Long]("n_removed")).toSeq == Seq(1L, 1L, 1L, 0L))
      assert(out.map(_.getAs[Long]("n_lines")).toSeq == Seq(3L, 2L, 2L, 1L))
    }

    it("counts distinct documents, not occurrences: a line repeated inside one doc stays") {
      val docs = Seq(
        (1L, "echo\necho\necho"), // 3 occurrences, 1 doc
        (2L, "other")).toDF("id", "text")
      val out = Boilerplate.removeFrequentLines(docs, col("id"), col("text"), maxDocs = 2)
        .orderBy("bp_id").collect()
      assert(out(0).getAs[String]("clean_text") == "echo\necho\necho")
      assert(out(0).getAs[Long]("n_removed") == 0L)
    }

    it("is total: a doc that is all boilerplate comes back with empty text, not a missing row") {
      val docs = Seq(
        (1L, "SPAM"), (2L, "SPAM"), (3L, "SPAM"),
        (4L, "SPAM\nreal content")).toDF("id", "text")
      val out = Boilerplate.removeFrequentLines(docs, col("id"), col("text"), maxDocs = 2)
        .orderBy("bp_id").collect()
      assert(out.length == 4)
      assert(out(0).getAs[String]("clean_text") == "")
      assert(out(0).getAs[Long]("n_removed") == 1L)
      assert(out(3).getAs[String]("clean_text") == "real content")
    }

    it("null text comes back as an empty-text row, not a missing one") {
      val docs = Seq((1L, null.asInstanceOf[String]), (2L, "real line")).toDF("id", "text")
      val out = Boilerplate.removeFrequentLines(docs, col("id"), col("text"), maxDocs = 2)
        .orderBy("bp_id").collect()
      assert(out.length == 2)
      assert(out(0).getAs[String]("clean_text") == "")
      assert(out(0).getAs[Long]("n_removed") == 0L)
    }

    it("supports a custom separator and regex metacharacters in it") {
      val docs = Seq(
        (1L, "a||BP||b"), (2L, "BP||c"), (3L, "BP")).toDF("id", "text")
      val out = Boilerplate.removeFrequentLines(docs, col("id"), col("text"),
          maxDocs = 2, sep = "||")
        .orderBy("bp_id").collect()
      assert(out.map(_.getAs[String]("clean_text")).toSeq == Seq("a||b", "c", ""))
    }
  }
}
