package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Quantization}

/** Fixed-Q ANN decade probe (developer tooling, like [[SkewProbe]] /
  * [[StateProbe]]): the official bench's ANN batteries construct their
  * query/centroid sets as `vec_id % 50 = 0` — Q ∝ N — so their
  * measured sf0.1→sf1 decades (q80 ~27×, q121 ~36×, q139 ~20×) read
  * as quadratic even though every operator is one broadcast
  * quantizer/LUT + a LINEAR scan per query. This probe retires that
  * recurring asterisk BY MEASUREMENT: it runs the same three operators
  * with a CONSTANT 20-query batch (`vec_id < 20`, present at every
  * scale) and, for IVF-PQ, a CONSTANT 10-centroid coarse codebook
  * (`vec_id % 50 = 0 AND vec_id < 500`) across two corpus decades and
  * reports per-query wall time. Per-query cost growing ~linearly with
  * the corpus (decade ratio ≈ 10, not ≈ 100) is the flatness claim;
  * results are recorded in BASELINE.md.
  *
  * Usage: `SPARK_GRAFT_ANN_DIRS=/root/testdata/sf0.1,/tmp/sf1ci
  * sbt "runMain graft.AnnProbe"`.
  */
object AnnProbe {

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_ANN_DIRS",
      "/root/testdata/sf0.1,/tmp/sf1ci").split(",").toSeq
    val spark = Sessions.local("graft-ann-probe")
    val q = 20L

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    for (dir <- dirs) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint(true)
      val n = e.count()

      // q121's operator, fixed 20 queries
      def sq8(): Long = {
        val stats = Quantization.dimStats(e, col("embedding"))
        val codes = Quantization.quantize(e, col("vec_id"), col("embedding"), stats)
        Quantization.topKInt(codes, codes.filter(col("vec_id") < q), 5).count()
      }
      // q139's operator, fixed 20 queries
      def twoStage(): Long = {
        val stats = Quantization.dimStats(e, col("embedding"))
        val codes = Quantization.quantize(e, col("vec_id"), col("embedding"), stats)
        Quantization.topKTwoStage(codes, codes.filter(col("vec_id") < q),
          k = 5, kCoarse = 20, coarseDims = 16).count()
      }
      // q80's operator, fixed 20 queries AND fixed 10 coarse centroids
      def ivfpq(): Long = {
        val ed = e.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        val cb = Pq.trainCodebooks(ed, m = 4, ksub = 8, iters = 0)
        val cents = ed.filter(col("vec_id") % 50 === 0 && col("vec_id") < 500)
        val index = Pq.bucketedEncode(ed, cents, cb, m = 4)
        Pq.ivfAdcTopK(index, ed.filter(col("vec_id") < q), cents, cb,
          m = 4, k = 3, nprobe = 2).count()
      }

      val ops = Seq("sq8" -> (sq8 _), "two_stage" -> (twoStage _),
        "ivfpq" -> (ivfpq _))
      ops.foreach { case (_, f) => f() } // warm JIT/codegen once per corpus
      ops.foreach { case (name, f) =>
        val (sec, rows) = time(f())
        println(f"annprobe dir=$dir n=$n op=$name queries=$q rows=$rows " +
          f"sec=$sec%.3f sec_per_query=${sec / q}%.4f")
      }
    }
    spark.stop()
  }
}
