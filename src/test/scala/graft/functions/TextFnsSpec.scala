package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text canonicalization: case-folding, control-char handling,
  * whitespace collapse, and idempotence. */
class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(TextFns.normalize(col("t"))).head().getString(0)

  describe("TextFns.normalize") {
    it("folds case, maps control chars to spaces, collapses runs, trims") {
      assert(norm("\t  Hello\r\nWORLD  x ") == "hello world x")
      assert(norm("a\u0000b") == "a b")
      assert(norm("plain text") == "plain text")
    }

    it("is idempotent") {
      val once = norm("\tA  B\r\nC")
      assert(norm(once) == once)
    }

    it("normalized variants of one document are byte-identical") {
      val variants = Seq("Doc one\ttext", "doc ONE text", " doc  one text \r\n").map(norm)
      assert(variants.distinct == Seq("doc one text"))
    }
  }

  describe("TextFns.hash60Value") {
    /** The pre-optimization reference: first 15 hex chars of the md5
      * digest parsed base-16 — the formula the DuckDB oracles replay
      * (`('0x' || substr(md5(s),1,15))::BIGINT`). The production path
      * reads the value straight off the first 8 digest bytes; this pin
      * holds the two formulations bit-identical. */
    def hexReference(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }

    it("equals the 15-hex-char md5 prefix parse on varied inputs") {
      val inputs = Seq("", "a", "0:0", "seed:7:3", "aud:123:64",
        "2:9999999", "unicode ✓ Ω", "x" * 500) ++
        (0 until 200).map(i => s"$i:${i * 31}:${i % 9}")
      inputs.foreach { s =>
        assert(TextFns.hash60Value(s) == hexReference(s), s"input '$s'")
      }
    }

    it("matches the Spark-side hash60 column expression") {
      val inputs = Seq("doc one text", "seed:0:0", "", "Ω")
      val viaSpark = inputs.toDF("t")
        .select(TextFns.hash60(col("t"))).collect().map(_.getLong(0)).toSeq
      assert(viaSpark == inputs.map(TextFns.hash60Value))
    }

    it("stays non-negative (60-bit range)") {
      (0 until 100).map(i => TextFns.hash60Value(s"neg:$i"))
        .foreach(v => assert(v >= 0L && v < (1L << 60)))
    }
  }
}
