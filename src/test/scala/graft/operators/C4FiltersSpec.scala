package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class C4FiltersSpec extends SparkSpec {
  import spark.implicits._

  private val rules = C4Filters.Rules(
    terminal = Seq(".", "!", "?", "\""),
    minLineWords = 5,
    banLineSubstrings = Seq("javascript"),
    banPageSubstrings = Seq("lorem ipsum", "{"),
    minKeptLines = 2)

  private val pages = Seq(
    // 2 good lines → passes
    (1L, "this first line has enough words here.\nand this second line also qualifies fine!"),
    // line 2 lacks terminal punctuation → only 1 kept → page fails
    (2L, "this first line has enough words here.\nno terminal punctuation on this line"),
    // short line + javascript line filtered; page fails on minKeptLines
    (3L, "too short.\nplease enable Javascript to view this content."),
    // good lines but page-level lorem ipsum ban
    (4L, "this first line has enough words here.\nlorem ipsum dolor sit amet consectetur adipiscing."),
    // good lines but code tell '{'
    (5L, "this first line has enough words here.\nvar x = function() { return enough words here; }\nand this second line also qualifies fine!"),
    (6L, null.asInstanceOf[String])
  ).toDF("doc_id", "page")

  describe("C4Filters.clean") {
    it("applies line rules: terminal punctuation, min words, banned substrings") {
      val r = C4Filters.clean(pages, col("doc_id"), col("page"), rules)
        .orderBy("c4_id")
        .as[(Long, String, Long, Long, Long)].collect()
      assert(r(0) == ((1L,
        "this first line has enough words here.\nand this second line also qualifies fine!",
        2L, 2L, 1L)))
      // doc 2: second line dropped (no terminal mark)
      assert(r(1)._2 == "this first line has enough words here." && r(1)._4 == 1L && r(1)._5 == 0L)
      // doc 3: "too short." < 5 words; javascript ban is case-insensitive
      assert(r(2)._2 == "" && r(2)._4 == 0L && r(2)._5 == 0L)
    }

    it("page-level bans fail the page even when its lines are clean") {
      val r = C4Filters.clean(pages, col("doc_id"), col("page"), rules)
        .orderBy("c4_id")
        .as[(Long, String, Long, Long, Long)].collect()
      assert(r(3)._4 == 2L && r(3)._5 == 0L) // lorem ipsum
      // doc 5: the '{' line itself is dropped (ends in '}'), but the raw
      // page still carries '{' → wholesale fail — line and page rules
      // are tested on different texts
      assert(r(4)._4 == 2L && r(4)._5 == 0L)
    }

    it("is total: null page yields one row with empty text, not a missing row") {
      val r = C4Filters.clean(pages, col("doc_id"), col("page"), rules)
        .filter(col("c4_id") === 6L)
        .as[(Long, String, Long, Long, Long)].collect()
      assert(r.length == 1 && r(0)._2 == "" && r(0)._5 == 0L)
    }

    it("keep returns exactly the page_pass=1 pages, cleaned") {
      val kept = C4Filters.keep(pages, col("doc_id"), col("page"), rules)
        .as[(Long, String, Long)].collect()
      assert(kept.map(_._1).toSeq == Seq(1L))
    }

    it("is a zero-shuffle narrow projection") {
      val plan = C4Filters.clean(pages, col("doc_id"), col("page"), rules)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    }
  }
}
