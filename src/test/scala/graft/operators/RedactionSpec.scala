package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII scrubbing: placeholder substitution, per-rule counts, and the
  * sequential-rule interaction (earlier rules consume text later rules
  * would otherwise match). */
class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(text: String): (Long, Long, Long, String) = {
    val r = Redaction.scrub(Seq((1L, text)).toDF("id", "text"), col("text")).head()
    (r.getAs[Long]("n_email"), r.getAs[Long]("n_url"),
      r.getAs[Long]("n_number"), r.getAs[String]("redacted"))
  }

  describe("Redaction.scrub") {
    it("redacts emails, urls, and digit runs with typed placeholders and counts") {
      val (e, u, n, red) = scrubOne(
        "mail bob.smith@example.com or see https://ex.org/a?b=1 card 1234 5678 9012")
      assert((e, u, n) == ((1L, 1L, 1L)))
      assert(red == "mail <EMAIL> or see <URL> card <NUMBER>")
    }

    it("earlier rules consume their spans: digits inside an email are not number hits") {
      val (e, u, n, red) = scrubOne("ping user12345678@example.com now")
      assert((e, u, n) == ((1L, 0L, 0L)))
      assert(red == "ping <EMAIL> now")
    }

    it("short digit runs and plain text pass through untouched") {
      val (e, u, n, red) = scrubOne("call 1234567 rooms at the plaza")
      assert((e, u, n) == ((0L, 0L, 0L)))
      assert(red == "call 1234567 rooms at the plaza")
    }

    it("rejects an input frame already carrying an output column name") {
      val df = Seq(("x", 1L)).toDF("text", "n_email")
      val e = intercept[IllegalArgumentException] {
        Redaction.scrub(df, col("text"))
      }
      assert(e.getMessage.contains("n_email"))
    }
  }
}
