package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) joins — the warehouse-scale answer to repeated
  * fact-fact joins on a stable key: bucket BOTH sides on write
  * (`bucketBy(n, key)` + `sortBy`), and every later equi-join on that
  * key reads buckets 1:1 with NO shuffle exchange in the plan
  * (SortMergeJoin over pre-hashed, pre-sorted buckets). At 100 TB the
  * one-time bucketed write amortizes across every downstream join and
  * aggregation on the key; the per-query shuffle it removes is the
  * dominant cost of the naive plan (see q13 vs q47).
  *
  * Spark requirements baked into the helpers: same bucket count on both
  * sides, join keys = bucket keys, `saveAsTable` (bucket metadata lives
  * in the catalog).
  */
object Bucketing {

  /** One-time bucketed write (the amortized cost). Buckets by `key`,
    * sorts within buckets by `key` so merge joins skip the sort too.
    * Idempotent across JVMs: the in-memory catalog forgets tables at
    * shutdown while the warehouse directory persists, so a stale
    * location is cleared before `saveAsTable` recreates the table. */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** [[writeBucketed]] only if `table` isn't already in this session's
    * catalog WITH the requested bucket spec — the amortization contract
    * made literal: the first caller pays the bucketed write, every later
    * caller in the session joins against the existing buckets for free.
    * (Benchmarks get the honest split too: warmup pays the write, timed
    * passes measure the join — the steady-state cost a warehouse sees.)
    * A same-named table whose bucket key or count differs is REWRITTEN,
    * not silently reused — a spec mismatch would re-introduce the
    * Exchange (or join on the wrong layout) with no error. Same-name
    * same-spec tables are trusted to carry the same data, as a catalog
    * does; callers generating per-dataset names (q47 tags the sf dir)
    * keep that assumption honest.
    */
  def ensureBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    val specMatches = spark.catalog.tableExists(table) && {
      val spec = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .bucketSpec
      spec.exists(b => b.numBuckets == numBuckets && b.bucketColumnNames == Seq(key))
    }
    if (!specMatches) writeBucketed(df, table, key, numBuckets)
  }

  /** Equi-join of two same-bucketed tables on the bucket key: plans with
    * zero Exchange nodes (assert with `.explain` — see BucketingSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
