package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Sampling

/** Skewed-stratum probe for the per-stratum prefix-sum family
  * (developer tooling, like [[StateProbe]]): builds an in-memory corpus
  * where ONE stratum holds ~90% of all rows — the language/source-sized
  * hot-stratum shape that makes a naive `PARTITION BY stratum` window
  * serialize into a single sort task — and times
  * [[Sampling.stratifiedKFold]] (routed through
  * `Packing.stratumRowNumber`'s stratum-keyed two-phase prefix sum)
  * against the naive window formulation on the same frame, verifying
  * both produce identical fold mass. Run at two decades
  * (`SPARK_GRAFT_PROBE_ROWS=1000000` / `10000000`) to read the scaling
  * shape; results are recorded in BASELINE.md.
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "10000000").toLong
    val k = 5
    val spark = Sessions.local("graft-skew-probe")

    // 90% of rows land in stratum "hot"; the rest spread over 20 cold
    // strata. Materialized up front so the timings exclude generation.
    val df = spark.range(n).select(
        col("id"),
        when(col("id") % 10 < 9, lit("hot"))
          .otherwise(concat(lit("cold_"), (col("id") % 20).cast("string")))
          .as("st"))
      .repartition(32)
      .localCheckpoint(true)

    def time(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val out = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s (checksum $out)")
      out
    }

    // warm both code paths once at 1/100 size so JIT cost doesn't land
    // on whichever leg runs first
    val warm = df.filter(col("id") % 100 === 0).localCheckpoint(true)
    Sampling.stratifiedKFold(warm, col("st"), col("id"), k)
      .agg(sum(col("fold"))).head
    val wWarm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("st")).orderBy(TextFns.hash60(col("id")), col("id"))
    warm.withColumn("fold", (row_number().over(wWarm) - 1) % k)
      .agg(sum(col("fold"))).head

    val twoPhase = time("two_phase_prefix_sum") {
      Sampling.stratifiedKFold(df, col("st"), col("id"), k)
        .agg(sum(col("fold").cast("long"))).head.getLong(0)
    }
    val naive = time("naive_partitionby_window") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("st")).orderBy(TextFns.hash60(col("id")), col("id"))
      df.withColumn("fold", (row_number().over(w) - 1) % k)
        .agg(sum(col("fold").cast("long"))).head.getLong(0)
    }
    require(twoPhase == naive,
      s"fold-mass mismatch: two-phase $twoPhase vs naive $naive")
    println(s"rows=$n k=$k hot_share=0.9 checksums_match=true")
    spark.stop()
  }
}
