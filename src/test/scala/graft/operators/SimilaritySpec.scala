package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFns

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4 points in 2 well-separated clusters + an in-between query target
  private val vectors = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 1.0f)),
    (3L, Array(0.0f, 0.1f, 0.9f)),
    (4L, Array(0.8f, 0.2f, 0.0f)))
    .toDF("vec_id", "embedding")

  describe("VectorFns.cosine") {
    it("matches hand-computed values") {
      val sim = vectors.filter(col("vec_id") === 0)
        .crossJoin(vectors.filter(col("vec_id") === 2).select(col("embedding").as("e2")))
        .select(VectorFns.cosine(col("embedding"), col("e2"))).head().getDouble(0)
      assert(sim == 0.0)
      val self = vectors.filter(col("vec_id") === 0)
        .select(VectorFns.cosine(col("embedding"), col("embedding"))).head().getDouble(0)
      assert(math.abs(self - 1.0) < 1e-12)
    }
  }

  describe("CosineSimilarity expression vs composed form") {
    it("matches the zip_with/aggregate composition bit-for-bit") {
      val pairs = vectors.select(col("vec_id").as("ida"), col("embedding").as("ea"))
        .crossJoin(vectors.select(col("vec_id").as("idb"), col("embedding").as("eb")))
      val diff = pairs.select(
        VectorFns.cosine(col("ea"), col("eb")).as("fast"),
        VectorFns.cosineComposed(col("ea"), col("eb")).as("slow"))
        .filter(col("fast") =!= col("slow"))
      assert(diff.count() == 0)
    }

    it("returns null on length mismatch and null elements") {
      val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
      assert(df.select(VectorFns.cosine(col("a"), col("b"))).head().isNullAt(0))
    }
  }

  describe("Similarity.cosineNearDupPairs") {
    it("finds exactly the above-threshold pairs") {
      val pairs = Similarity.cosineNearDupPairs(vectors, threshold = 0.99)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      // cos(1,4)=0.991 also clears 0.99 — three near-dup pairs
      assert(pairs == Set((0L, 1L), (1L, 4L), (2L, 3L)))
    }
  }

  describe("Similarity.bruteTopK") {
    it("ranks the same-cluster vectors first and excludes self") {
      val res = Similarity.bruteTopK(vectors, vectors.filter(col("vec_id") === 0), k = 2)
        .select("rnk", "neighbor_id").as[(Int, Long)].collect().toList.sortBy(_._1)
      assert(res.map(_._2) == List(1L, 4L))
    }
  }

  describe("Similarity.assign + ivfTopK") {
    it("assigns vectors to the nearest centroid") {
      val centroids = vectors.filter(col("vec_id") < 2 || col("vec_id") === 2)
      val assigned = Similarity.assign(vectors, vectors.filter(col("vec_id").isin(0L, 2L)))
        .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
      assert(assigned(1L) == 0L && assigned(4L) == 0L && assigned(3L) == 2L)
      assert(assigned(0L) == 0L && assigned(2L) == 2L)
    }

    it("ivf search stays within the probe bucket") {
      val res = Similarity.ivfTopK(vectors, vectors.filter(col("vec_id") === 3),
        vectors.filter(col("vec_id").isin(0L, 2L)), k = 3)
        .select("neighbor_id").as[Long].collect().toSet
      assert(res == Set(2L)) // only the other member of cluster {2,3}
    }
  }
}
