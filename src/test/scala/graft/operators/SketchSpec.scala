package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sketch operators beyond what the q56–q59 oracles pin: the
  * count-min-sketch point-estimate guarantee (q125 pins the certificate
  * end-to-end through [[graft.catalyst.CmsEstimate]]; this spec keeps
  * the raw-sketch goldens) and HLL++ behavior at a cardinality far
  * above the q56 corpus.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  describe("CmsEstimate (catalyst probe expression)") {
    it("matches the deserialized sketch's estimateCount row-for-row, codegen and eval") {
      val rows = (1 to 50).flatMap(k => Seq.fill(k)(k.toLong)).toDF("v")
      val cms = rows.stat.countMinSketch("v", 0.01, 0.99, 42)
      val probed = (1L to 60L).toDF("k")
        .withColumn("est", graft.catalyst.CmsEstimate.estimate(col("k"), cms))
        .as[(Long, Long)].collect().toMap
      (1L to 60L).foreach { k =>
        assert(probed(k) == cms.estimateCount(k), s"key $k")
      }
      // structural guarantee surfaces through the expression too
      (1L to 50L).foreach(k => assert(probed(k) >= k))
    }

    it("is null-safe and type-checked") {
      val cms = Seq(1L).toDF("v").stat.countMinSketch("v", 0.1, 0.9, 1)
      val out = Seq(Some(1L), None).toDF("k")
        .withColumn("est", graft.catalyst.CmsEstimate.estimate(col("k"), cms))
        .collect()
      assert(!out(0).isNullAt(1) && out(1).isNullAt(1))
      val e = intercept[Exception] {
        Seq("x").toDF("s")
          .withColumn("est", graft.catalyst.CmsEstimate.estimate(col("s"), cms))
          .collect()
      }
      assert(e.getMessage.toLowerCase.contains("cms_estimate") ||
        e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
    }
  }

  describe("count_min_sketch") {
    it("point estimates are >= true counts and within the eps*N guarantee") {
      // skewed stream: key k appears k times, N = 1+2+...+100 = 5050
      val rows = (1 to 100).flatMap(k => Seq.fill(k)(k.toLong)).toDF("v")
      val eps = 0.01
      val bin = rows.agg(expr(s"count_min_sketch(v, ${eps}d, 0.99d, 42)")).head().getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bin))
      val n = 5050L
      for (k <- Seq(1L, 7L, 50L, 100L)) {
        val est = cms.estimateCount(k)
        assert(est >= k, s"CMS underestimated key $k: $est")
        assert(est <= k + (eps * n).ceil.toLong, s"CMS outside eps*N for key $k: $est")
      }
      // a key never inserted estimates at most eps*N
      assert(cms.estimateCount(9999L) <= (eps * n).ceil.toLong)
    }
  }

  describe("approx_count_distinct (HLL++)") {
    it("stays within 5% at 20k distinct keys (far beyond register exactness)") {
      val df = (1L to 20000L).toDF("v")
      val r = df.agg(countDistinct(col("v")).as("exact"),
        approx_count_distinct(col("v"), 0.02).as("approx")).head()
      val (exact, approx) = (r.getLong(0), r.getLong(1))
      assert(math.abs(approx - exact) <= exact * 0.05, s"approx $approx vs exact $exact")
    }
  }

  describe("hll_sketch union") {
    it("merging per-partition sketches tracks the exact union within 5%") {
      // two overlapping halves: 1..12k and 8k..20k — union 20k distinct
      val df = ((1L to 12000L).map(("a", _)) ++ (8000L to 20000L).map(("b", _))).toDF("part", "v")
      val merged = df.groupBy(col("part")).agg(hll_sketch_agg(col("v")).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("m")).head().getLong(0)
      assert(math.abs(merged - 20000L) <= 1000L, s"merged estimate $merged")
    }
  }
}
