package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the schema-adaptive events `ts` read (VERDICT r7 #1/#8): the
  * testdata generator has shipped `ts` as TIMESTAMP(NANOS) (read as
  * LongType under nanosAsLong) and TIMESTAMP(MICROS) (read as
  * TIMESTAMP_NTZ); a fixed normalization expression cost round 7 all 34
  * events queries. Each known physical type must normalize to the SAME
  * micro-precision TIMESTAMP values, and an unknown type must fail fast
  * with an error naming the table and the found type — not a generic
  * analysis error three operators downstream.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2021-03-04T05:06:07.123456789 UTC as nanos since epoch
  private val nanos = 1614834367123456789L

  describe("Tables.normalizeTs") {
    it("truncates legacy nanos-as-long to micros") {
      val df = Seq(nanos).toDF("ts")
      val out = Tables.normalizeTs(df)
      assert(out.schema("ts").dataType == TimestampType)
      val got = out.select(unix_micros(col("ts"))).as[Long].head()
      assert(got == nanos / 1000L)
    }

    it("casts TIMESTAMP_NTZ (micros parquet) to session-TZ timestamp, value-identically") {
      val df = Seq(nanos / 1000L).toDF("us")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      assert(df.schema("ts").dataType == TimestampNTZType)
      val out = Tables.normalizeTs(df)
      assert(out.schema("ts").dataType == TimestampType)
      // UTC session (Sessions.builder): NTZ wall-clock == instant
      val got = out.select(unix_micros(col("ts"))).as[Long].head()
      assert(got == nanos / 1000L)
    }

    it("passes a proper TIMESTAMP through unchanged") {
      val df = Seq(nanos / 1000L).toDF("us")
        .select(timestamp_micros(col("us")).as("ts"))
      val out = Tables.normalizeTs(df)
      assert(out.schema("ts").dataType == TimestampType)
      assert(out.select(unix_micros(col("ts"))).as[Long].head() == nanos / 1000L)
    }

    it("all three known physical types agree on the normalized value") {
      val fromLong = Tables.normalizeTs(Seq(nanos).toDF("ts"))
      val fromNtz = Tables.normalizeTs(Seq(nanos / 1000L).toDF("us")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
      val fromTs = Tables.normalizeTs(Seq(nanos / 1000L).toDF("us")
        .select(timestamp_micros(col("us")).as("ts")))
      val vals = Seq(fromLong, fromNtz, fromTs)
        .map(_.select(unix_micros(col("ts"))).as[Long].head())
      assert(vals.distinct.size == 1)
    }

    it("fails FAST on an unknown ts type, naming the table and the found type") {
      // deliberate drift: a generator switch to e.g. STRING or DOUBLE must
      // produce a diagnosis, not DATATYPE_MISMATCH three plans later
      val df = Seq("2021-03-04 05:06:07").toDF("ts")
      val e = intercept[IllegalStateException](Tables.normalizeTs(df))
      assert(e.getMessage.contains("events.parquet drift"))
      assert(e.getMessage.contains("StringType"))
      assert(e.getMessage.contains("ts"))
    }
  }
}
