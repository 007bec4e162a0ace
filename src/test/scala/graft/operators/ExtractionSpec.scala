package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ExtractionSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(Extraction.stripMarkup(col("h"))).head().getString(0)

  describe("Extraction.stripMarkup") {
    it("recovers the text of a full page") {
      val page = "<html><head><title>t</title><style>p { margin: 0 }</style></head>\n" +
        "<body><p class=\"lead\">hello world</p><div>second line</div>\n</body></html>"
      assert(strip(page) == "t hello world second line")
    }

    it("removes script blocks whole, including literal < and > in the body") {
      // a naive tag strip would see `< 2 >` as a tag boundary and leak "var x"
      assert(strip("a<script>var x = \"1 < 2 > 0\";\nalert(x);</script>b") == "a b")
    }

    it("removes style blocks and multi-line comments") {
      assert(strip("a<style>p{x:1}\nq{y:2}</style>b<!-- c\nd -->e") == "a b e")
    }

    it("decodes the fixed entity set with &amp; last") {
      assert(strip("x &lt;3 &amp; &quot;q&quot; &#39;s&#39; y") == "x <3 & \"q\" 's' y")
      // &amp;lt; is the TEXT "&lt;", not a double-decoded "<"
      assert(strip("a &amp;lt; b") == "a &lt; b")
    }

    it("converts tags to spaces and normalizes whitespace") {
      assert(strip("  a<br/><br/>b\n\nc\t d  ") == "a b c d")
    }

    it("is total on markup-free and empty text") {
      assert(strip("plain text") == "plain text")
      assert(strip("") == "")
    }
  }

  describe("Extraction.extract") {
    it("reports before/after sizes alongside the clean text") {
      val df = Seq((7L, "<p>hi</p>")).toDF("id", "html")
      val row = Extraction.extract(df, col("id"), col("html")).head()
      assert(row.getLong(0) == 7L)
      assert(row.getLong(1) == 9L) // raw chars
      assert(row.getString(2) == "hi")
      assert(row.getLong(3) == 2L)
    }
  }
}
