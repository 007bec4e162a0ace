package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
  * rejects by default (PARQUET_TYPE_ILLEGAL). We read it with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (ts arrives as nanos-since-
  * epoch LongType) and truncate to microseconds via `timestamp_micros(ts
  * div 1000)`. DuckDB — the correctness oracle — coerces TIMESTAMP_NS to
  * its native micro-precision TIMESTAMP with the same truncation, so both
  * engines see identical values.
  */
object Tables {
  val relationalNames: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val allNames: Seq[String] =
    relationalNames ++ Seq("events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // Requires spark.sql.legacy.parquet.nanosAsLong=true at session build
      // (Sessions.local sets it); ts arrives as nanos-since-epoch LongType.
      spark.read
        .parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case n =>
      spark.read.parquet(s"$dir/$n.parquet")
  }

  /** Register all tables as temp views for `spark.sql` access. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    allNames.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
