package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  // chunk patterns: 4 distinct 2-dim subvectors
  private val patterns = Array(
    Array(0.0, 1.0), Array(10.0, 11.0), Array(20.0, 21.0), Array(30.0, 31.0))

  /** vectors with every chunk drawn from the pattern pool; ids 0..3 are
    * the pure pattern vectors (so deterministic lowest-id init seeds the
    * codebooks with exactly the pool). */
  private def losslessCorpus(n: Int) = {
    val rows = (0L until n.toLong).map { id =>
      val v =
        if (id < 4) Array.fill(4)(patterns(id.toInt)).flatten
        else (0 until 4).flatMap(c => patterns(((id + c * 7) % 4).toInt)).toArray
      (id, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def bruteL2TopK(rows: Map[Long, Array[Double]], queries: Seq[Long], k: Int) =
    queries.flatMap { q =>
      rows.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          val d = rows(q).zip(v).map { case (a, b) => (a - b) * (a - b) }.sum
          (id, d)
        }
        .sortBy { case (id, d) => (d, id) }
        .take(k)
        .zipWithIndex
        .map { case ((id, _), i) => (q, i + 1, id) }
    }.toSet

  describe("Pq") {
    it("rejects a vector dimension not divisible by m at execution, in-plan") {
      val bad = Seq((1L, Array(1.0, 2.0, 3.0))).toDF("vec_id", "embedding")
      val e = intercept[Exception] {
        Pq.chunks(bad, m = 2).collect()
      }
      assert(e.getMessage.contains("not divisible by m=2"))
    }

    it("codes have m entries in [0, ksub) and equal vectors get equal codes") {
      val corpus = losslessCorpus(24)
      val cb = Pq.trainCodebooks(corpus, m = 4, ksub = 4, iters = 2)
      val codes = Pq.encode(corpus, cb, m = 4)
        .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
      assert(codes.values.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 4)))
      // ids 4 and 8: same (id + c*7) % 4 pattern sequence → same codes
      assert(codes(4L) == codes(8L))
      assert(codes(0L) != codes(1L))
    }

    it("quantization is lossless on a pattern-pool corpus: ADC top-k == brute L2 top-k") {
      // every chunk sits exactly ON a codeword, so the trained codebook
      // reproduces the pool, ADC distance equals true squared L2, and
      // approximate search returns the exact answer
      val corpus = losslessCorpus(24)
      val cb = Pq.trainCodebooks(corpus, m = 4, ksub = 4, iters = 3)
      val codes = Pq.encode(corpus, cb, m = 4)
      val queries = corpus.filter(col("vec_id") < 3)
      val got = Pq.adcTopK(codes, queries, cb, m = 4, k = 3)
        .select("query_id", "rnk", "neighbor_id").as[(Long, Int, Long)].collect().toSet
      val rows = corpus.as[(Long, Array[Double])].collect().toMap
      assert(got == bruteL2TopK(rows, Seq(0L, 1L, 2L), k = 3))
    }

    it("IVF-PQ: nprobe = numCentroids equals full ADC; nprobe=1 stays in the probed bucket") {
      val corpus = losslessCorpus(24)
      val cb = Pq.trainCodebooks(corpus, m = 4, ksub = 4, iters = 3)
      val centroids = corpus.filter(col("vec_id") < 4) // the 4 pure patterns
      val index = Pq.bucketedEncode(corpus, centroids, cb, m = 4)
      val queries = corpus.filter(col("vec_id") < 3)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "rnk", "neighbor_id").as[(Long, Int, Long)].collect().toSet
      val full = rows(Pq.adcTopK(index.select("vec_id", "codes"), queries, cb, m = 4, k = 3))
      val probeAll = rows(Pq.ivfAdcTopK(index, queries, centroids, cb, m = 4, k = 3, nprobe = 4))
      assert(probeAll == full)
      // nprobe=1: every returned neighbor must live in the query's own
      // L2-nearest bucket (for query q < 3, that is centroid q's bucket
      // — the query IS pattern q repeated, distance 0 to centroid q)
      val bucketOf = index.select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
      val one = Pq.ivfAdcTopK(index, queries, centroids, cb, m = 4, k = 3, nprobe = 1)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      assert(one.nonEmpty)
      one.foreach { case (q, n) =>
        assert(bucketOf(n) == q, s"neighbor $n of query $q came from bucket ${bucketOf(n)}")
      }
    }

    it("perturbed clusters: ADC picks a neighbor from the brute winner's quantization cell") {
      // PQ cannot rank WITHIN a cell (all members share codes → equal
      // ADC distance, tie → lowest id), so the honest recall property is
      // cell-level: the ADC pick's codes must equal the true nearest
      // neighbor's codes.
      val rnd = new scala.util.Random(11)
      val rows = (0L until 40L).map { id =>
        val base =
          if (id < 4) Array.fill(4)(patterns(id.toInt)).flatten
          else (0 until 4).flatMap(c => patterns(((id + c) % 4).toInt)).toArray
        (id, base.map(_ + rnd.nextGaussian() * 0.05))
      }
      val corpus = rows.toDF("vec_id", "embedding")
      val cb = Pq.trainCodebooks(corpus, m = 4, ksub = 4, iters = 4)
      val codes = Pq.encode(corpus, cb, m = 4)
      val codeOf = codes.select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
      val qIds = (0L until 10L).toSeq
      val got = Pq.adcTopK(codes, corpus.filter(col("vec_id") < 10), cb, m = 4, k = 1)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
      val brute = bruteL2TopK(rows.toMap.map(identity), qIds, k = 1)
        .map { case (q, _, id) => q -> id }.toMap
      val hits = qIds.count(q => codeOf(got(q)) == codeOf(brute(q)))
      assert(hits >= 8, s"ADC cell-level recall $hits/10")
    }
  }
}
