package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Partition-matrix semantics of reference CommonSpec.scala:29-108 over
  * the engine's column expressions, including the cases the DuckDB
  * oracle can't host (malformed JSON, reading errors).
  */
class RowTypesSpec extends SparkSpec {
  import spark.implicits._

  private def partitionOf(rows: Seq[(String, Option[Seq[String]])]): Map[String, Long] = {
    val df = rows.toDF("value", "error")
      .withColumn("error", col("error").cast("array<string>"))
    df.select(RowTypes.partition(col("value"), col("error")).as("p"))
      .groupBy("p").count().as[(String, Long)].collect().toMap
  }

  describe("RowTypes.partition") {
    it("groups self-describing JSON by schema key (CommonSpec fixture matrix)") {
      val rows = Seq(
        ("""{"schema": "iglu:com.acme1/example1/jsonschema/2-0-1", "data": "data1"}""", None),
        ("""{"schema": "iglu:com.acme1/example2/jsonschema/2-0-0", "data": "data1"}""", None),
        ("""{"schema": "iglu:com.acme1/example2/jsonschema/2-0-1", "data": "data2"}""", None),
        ("""{"schema": "iglu:com.acme2/example1/jsonschema/2-0-0", "data": "data1"}""", None),
        ("""{"schema": "iglu:com.acme2/example1/jsonschema/2-0-1", "data": "data2"}""", None),
        ("""{"schema": "iglu:com.acme2/example1/jsonschema/2-0-1", "data": "data3"}""", None),
        ("failed-record", Some(Seq("boom"))),
        ("failed-record", Some(Seq("boom"))),
        ("""{"data": "data", "key": "value"}""", None),
        ("not json data", None))
      assert(partitionOf(rows) == Map(
        "com.acme1.example1/jsonschema-2" -> 1L,
        "com.acme1.example2/jsonschema-2" -> 2L,
        "com.acme2.example1/jsonschema-2" -> 3L,
        RowTypes.ReadingErrorName -> 2L,
        RowTypes.UnpartitionedName -> 2L))
    }

    it("sends malformed JSON and non-string schema fields to unpartitioned") {
      val rows = Seq(
        ("{not valid json", None),
        ("""{"schema": 42}""", None),
        ("""{"schema": "iglu:bad"}""", None),
        ("", None))
      assert(partitionOf(rows) == Map(RowTypes.UnpartitionedName -> 4L))
    }

    it("rejects model 0 and negative revisions (Iglu URI grammar)") {
      val rows = Seq(
        ("""{"schema": "iglu:com.acme/ex/jsonschema/0-0-1"}""", None),
        ("""{"schema": "iglu:com.acme/ex/jsonschema/1-0-0"}""", None))
      assert(partitionOf(rows) == Map(
        RowTypes.UnpartitionedName -> 1L,
        "com.acme.ex/jsonschema-1" -> 1L))
    }

    it("extracts vendor/name/format/model parts") {
      val df = Seq("""{"schema": "iglu:com.acme/ev/jsonschema/3-1-2", "data": 1}""").toDF("value")
      val row = df.select(
        RowTypes.vendor(col("value")), RowTypes.name(col("value")),
        RowTypes.format(col("value")), RowTypes.model(col("value"))).head()
      assert((row.getString(0), row.getString(1), row.getString(2), row.getInt(3))
        == (("com.acme", "ev", "jsonschema", 3)))
    }

    it("partitionDir is a single path segment") {
      val df = Seq("""{"schema": "iglu:com.acme/ev/jsonschema/3-1-2"}""").toDF("value")
      val v = df.select(RowTypes.partitionDir(col("value"), lit(null).cast("array<string>"))).head().getString(0)
      assert(v == "com.acme.ev.jsonschema-3" && !v.contains("/"))
    }
  }
}
