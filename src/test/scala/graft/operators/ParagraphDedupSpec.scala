package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha one\n\nshared paragraph\n\nbeta two"),
    (2L, "shared paragraph\n\ngamma three"),     // para 0 repeats doc 1's
    (3L, "delta four\n\ndelta four"),            // intra-doc repeat
    (4L, "shared paragraph"),                    // fully deduplicated away
    (5L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  private def run() =
    ParagraphDedup.dropDuplicateParagraphs(corpus, col("doc_id"), col("text"))
      .orderBy("pd_id")
      .as[(Long, String, Long, Long)].collect()

  describe("ParagraphDedup.dropDuplicateParagraphs") {
    it("keeps the globally first occurrence in (doc, position) order") {
      val r = run()
      assert(r(0) == ((1L, "alpha one\n\nshared paragraph\n\nbeta two", 3L, 0L)))
      assert(r(1) == ((2L, "gamma three", 2L, 1L)))
    }

    it("drops intra-document repeats too") {
      assert(run()(2) == ((3L, "delta four", 2L, 1L)))
    }

    it("is total: a fully-duplicate doc and a null doc still return rows") {
      val r = run()
      assert(r(3) == ((4L, "", 1L, 1L)))
      // null text = one empty paragraph; it is the corpus's FIRST empty
      // paragraph so it survives (as the empty string)
      assert(r(4) == ((5L, "", 1L, 0L)))
    }

    it("shuffles fingerprints, not payloads: the window input projects (id,pos,fp) only") {
      import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
      val win = ParagraphDedup
        .dropDuplicateParagraphs(corpus, col("doc_id"), col("text"))
        .queryExecution.optimizedPlan.collect { case w: LWindow => w }.head
      val names = win.child.output.map(_.name)
      assert(names.toSet == Set("pd_id", "pos", "fp"),
        s"payload column leaked into the keep-first window: $names")
    }
  }
}
