package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier): the rows no other row
  * dominates on (smaller `x`, smaller `y`). The 2-D frontier is a
  * cumulative-minimum scan over the (x, tie) total order — a row
  * survives iff its y beats every EARLIER row's y strictly — and the
  * cumulative min distributes the same way
  * [[Packing.globalRowNumber]]'s prefix counts do:
  *
  *  1. range-partition + sort on (x, tie) — each partition owns a
  *     contiguous key range;
  *  2. per-partition y-minimum → driver (bounded by the PARTITION
  *     count, never the data — the globalRowNumber collect discipline);
  *  3. broadcast each partition's exclusive prefix-min back; inside a
  *     partition a plain window running-min finishes the job.
  *
  * No single-partition window anywhere (the naive `Window.orderBy`
  * form funnels the whole input through one task — fine at test SF,
  * a wall at 100×); no O(n²) NOT-EXISTS self-join (the definitional
  * form the q193 oracle still runs). `y` must be LongType — map
  * timestamps/amounts to integer micros/cents upstream (the repo's
  * fixed-point discipline), which also makes the strict `<` exact.
  */
object Skyline {

  def paretoFrontier2d(df: DataFrame, xCol: String, yCol: String, tieCol: String,
                       numRanges: Int = 32): DataFrame = {
    require(numRanges >= 1, s"numRanges must be >= 1, got $numRanges")
    require(df.schema(yCol).dataType == org.apache.spark.sql.types.LongType,
      s"paretoFrontier2d needs a LongType y column, got ${df.schema(yCol).dataType}")
    val parted = df
      .repartitionByRange(numRanges, col(xCol), col(tieCol))
      .sortWithinPartitions(col(xCol), col(tieCol))
      .withColumn("__pid", spark_partition_id())
      // pin the pid assignment: both consumers below must see the SAME
      // partitioning (a recomputed range sample could move boundary rows)
      .localCheckpoint(false)
    // phase 2: per-partition minima — one row per partition to the driver
    val mins = parted.groupBy(col("__pid")).agg(min(col(yCol)).as("__m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val prefix: Seq[(Int, Long)] = {
      var best = Long.MaxValue
      mins.map { case (pid, m) =>
        val out = (pid, best); best = math.min(best, m); out
      }.toSeq
    }
    val spark = df.sparkSession
    import spark.implicits._
    val prefixDf = prefix.toDF("__pid", "__before")
    // phase 3: intra-partition running min (exclusive) + the broadcast
    // prefix floor from all earlier partitions
    val w = Window.partitionBy(col("__pid")).orderBy(col(xCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    parted.join(broadcast(prefixDf), "__pid")
      .withColumn("__local", min(col(yCol)).over(w))
      .filter(col(yCol) <
        least(coalesce(col("__local"), lit(Long.MaxValue)), col("__before")))
      .drop("__pid", "__before", "__local")
  }
}
