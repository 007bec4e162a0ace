package graft.functions

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Totality + strictness of the collector-tstamp parse (reference
  * Common.scala:88-96 swallows all failures into Either-left; the engine
  * maps them to null). Property-style with a seeded generator (the
  * offline cache has no scalatest↔scalacheck bridge).
  */
class TstampsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(lines: Seq[String]): Seq[Option[Timestamp]] =
    lines.toDF("value")
      .select(Tstamps.collectorTstamp(col("value")).as("t"))
      .as[Option[Timestamp]].collect().toSeq

  describe("collectorTstamp") {
    it("parses the reference's accepted format at TSV index 3") {
      val line = List.fill(4)("2020-11-26 00:01:05").mkString("\t")
      assert(parse(Seq(line)) == Seq(Some(Timestamp.valueOf("2020-11-26 00:01:05"))))
    }

    it("parses fractional seconds") {
      val line = s"a\tb\tc\t2020-11-26 00:01:05.123"
      assert(parse(Seq(line)) == Seq(Some(Timestamp.valueOf("2020-11-26 00:01:05.123"))))
    }

    it("returns null for short rows, garbage, empties, and date-only strings") {
      val lines = Seq(
        "only\ttwo",
        "a\tb\tc\tnot-a-time",
        "a\tb\tc\t",
        "a\tb\tc\t2020-11-26", // Instant.parse would reject date-only; so do we
        "")
      assert(parse(lines) == Seq(None, None, None, None, None))
    }

    it("never throws on arbitrary input lines (total function)") {
      val rnd = new scala.util.Random(42)
      val alphabet = (' ' to '~') ++ Seq('\t', 'é', 'ÿ')
      val lines = Seq.fill(500) {
        val n = rnd.nextInt(40)
        String.valueOf(Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))))
      }
      val out = parse(lines)
      assert(out.length == lines.length)
    }

    it("out-of-range components are rejected, not wrapped") {
      assert(parse(Seq("a\tb\tc\t2020-13-40 99:99:99")) == Seq(None))
    }
  }
}
