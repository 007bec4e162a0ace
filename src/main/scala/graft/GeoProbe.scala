package graft

import org.apache.spark.sql.functions._

/** Output-volume decade probe for q255 (developer tooling, the
  * [[AnnProbe]] discipline applied to the last >10×-decade asterisk):
  * q255's grid-bucketed neighbor join is OUTPUT-BOUND — the number of
  * customer pairs within one cell radius grows superlinearly with
  * point density (uniform hashes over a FIXED 1000×1000 grid: pair
  * count ~ n²·(area ratio)), so its bench decade reads >10× even
  * though the plan is a cartesian-free equi-join whose cost per
  * EMITTED PAIR is constant. This probe measures exactly that claim:
  * for each corpus decade it counts the emitted d²-filtered pairs and
  * the wall time, and reports pairs/sec — flat-ish pairs/sec across
  * the decade retires the asterisk by measurement, the way AnnProbe
  * retired the Q∝N ANN batteries. Results recorded in BASELINE.md.
  *
  * Usage: `SPARK_GRAFT_GEO_DIRS=/root/testdata/sf0.1,/tmp/sf1ci
  * sbt "runMain graft.GeoProbe"`.
  */
object GeoProbe {

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_GEO_DIRS",
      "/root/testdata/sf0.1,/tmp/sf1ci").split(",").toSeq
    val spark = Sessions.local("graft-geo-probe")

    for (dir <- dirs) {
      val n = spark.read.parquet(s"$dir/customer.parquet").count()
      graft.queries.Relational.geoGridPairs(spark, dir).count() // warm once
      val t0 = System.nanoTime()
      val pairs = graft.queries.Relational.geoGridPairs(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"geoprobe dir=$dir customers=$n pairs=$pairs sec=$sec%.3f " +
        f"pairs_per_sec=${pairs / sec}%.0f")
    }
    spark.stop()
  }
}
