package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EnrichedEventSpec extends SparkSpec {
  import spark.implicits._

  describe("EnrichedEvent schema") {
    it("has exactly 131 fields with collector_tstamp at wire index 3") {
      assert(EnrichedEvent.fieldNames.size == 131)
      assert(EnrichedEvent.fieldNames(EnrichedEvent.CollectorTstampIdx) == "collector_tstamp")
      assert(EnrichedEvent.CollectorTstampIdx == Tstamps.CollectorTstampIdx)
      assert(EnrichedEvent.fieldNames.head == "app_id")
      assert(EnrichedEvent.fieldNames.last == "true_tstamp")
      assert(EnrichedEvent.fieldNames.distinct.size == 131) // no dup names
    }
  }

  describe("EnrichedEvent.parse") {
    it("maps a full-width line to named columns") {
      val line = EnrichedEvent.fieldNames.indices.map(i => s"v$i").mkString("\t")
      val r = EnrichedEvent.parse(Seq(line).toDF("value")).collect().head
      assert(r.getAs[String]("app_id") == "v0")
      assert(r.getAs[String]("collector_tstamp") == "v3")
      assert(r.getAs[String]("true_tstamp") == "v130")
    }

    it("is total: short rows null-fill the tail, long rows drop extras") {
      val df = Seq("only\tfour\tcols\there", "").toDF("value")
      val rows = EnrichedEvent.parse(df).collect()
      assert(rows(0).getAs[String]("app_id") == "only")
      assert(rows(0).getAs[String]("collector_tstamp") == "here")
      assert(rows(0).isNullAt(4)) // dvce_created_tstamp missing → null
      val wide = (1 to 200).map(_.toString).mkString("\t")
      assert(EnrichedEvent.parse(Seq(wide).toDF("value")).columns.length == 131)
    }

    it("typed accessors are null on malformed input, typed on valid") {
      val df = Seq(("2013-11-26 00:02:05", "41828", "x")).toDF("ts", "n", "bad")
      val r = df.select(
        EnrichedEvent.tstamp(col("ts")).as("t"),
        EnrichedEvent.asLong(col("n")).as("l"),
        EnrichedEvent.asLong(col("bad")).as("b"),
        EnrichedEvent.tstamp(col("bad")).as("tb")).collect().head
      assert(!r.isNullAt(0) && r.getLong(1) == 41828L)
      assert(r.isNullAt(2) && r.isNullAt(3))
    }
  }
}
