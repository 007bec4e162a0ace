package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the grid-bucketed spatial neighbor join (q255) and the
  * sparse matrix multiply (q256): the grid join must equal the
  * brute-force all-pairs semantics (computed in-test over a small
  * table) without ever forming a cartesian product, and the SpMM
  * arithmetic is hand-checked on a two-doc corpus.
  */
class GeoMatmulSpec extends SparkSpec {
  import spark.implicits._

  describe("Relational.geoGridJoin (q255)") {
    it("equals brute-force all-pairs and plans no cartesian product") {
      withTempDir { dir =>
        val segs = Seq("A", "B", "C")
        (0L until 400L).map(k => (k, s"c$k", (k % 3).toInt, 0.0, segs((k % 3).toInt)))
          .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
          .repartition(2).write.mode("overwrite")
          .parquet(new java.io.File(dir, "customer.parquet").toString)
        val grid = Relational.geoGridJoin(spark, dir.toString)
        assert(!grid.queryExecution.executedPlan.toString.contains("Cartesian"),
          "grid join must not plan a cartesian product")
        // brute force with the same hashed coordinates, radius inclusive
        val pts = spark.read
          .parquet(new java.io.File(dir, "customer.parquet").toString)
          .select(col("c_custkey").as("k"),
            pmod(graft.functions.TextFns.seededHash(1,
              col("c_custkey").cast("string")), lit(1000L)).as("x"),
            pmod(graft.functions.TextFns.seededHash(2,
              col("c_custkey").cast("string")), lit(1000L)).as("y"),
            col("c_mktsegment").as("seg"))
        val a = pts.select(col("k").as("ka"), col("x").as("xa"),
          col("y").as("ya"), col("seg").as("sega"))
        val b = pts.select(col("k").as("kb"), col("x").as("xb"),
          col("y").as("yb"), col("seg").as("segb"))
        val brute = a.crossJoin(b).filter(col("ka") < col("kb"))
          .withColumn("d2",
            (col("xa") - col("xb")) * (col("xa") - col("xb")) +
              (col("ya") - col("yb")) * (col("ya") - col("yb")))
          .filter(col("d2") <= 400L)
          .select(least(col("sega"), col("segb")).as("seg_lo"),
            greatest(col("sega"), col("segb")).as("seg_hi"), col("d2"))
          .groupBy(col("seg_lo"), col("seg_hi"))
          .agg(count(lit(1)).as("n_pairs"), sum(col("d2")).as("sum_d2"))
          .orderBy(col("seg_lo"), col("seg_hi"))
        assert(grid.collect().toSeq == brute.collect().toSeq)
        assert(brute.agg(sum(col("n_pairs"))).first().getLong(0) > 0L,
          "test set must actually contain qualifying pairs")
      }
    }
  }

  describe("DataOps.sparseMatmul (q256)") {
    it("multiplies the hand-computed doc-term x term-topic product") {
      withTempDir { dir =>
        // doc 1 = "aa bb" (len-2 terms), doc 2 = "aa aa ccc".
        // w(len2,k) over k=0..4: 0,5,3,1,6; w(len3,k) = 3 for all k.
        // C[1,k] = 2·w2(k); C[2,k] = 2·w2(k) + 3.
        Seq((1L, "aa bb", "en", "s", 5L), (2L, "aa aa ccc", "en", "s", 9L))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .repartition(1).write.mode("overwrite")
          .parquet(new java.io.File(dir, "documents.parquet").toString)
        val r = DataOps.sparseMatmul(spark, dir.toString).collect()
          .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
            x.getLong(4))).toSeq
        assert(r == Seq(
          (0L, 3L, 1L, 3L, 2L),
          (1L, 23L, 2L, 13L, 2L),
          (2L, 15L, 2L, 9L, 2L),
          (3L, 7L, 2L, 5L, 2L),
          (4L, 27L, 2L, 15L, 2L)))
      }
    }
  }
}
