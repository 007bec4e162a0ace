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

  /** Deterministic random unit-ish vectors (fixed seed → reproducible). */
  private def randomCorpus(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()))
    }
    rows.toDF("vec_id", "embedding")
  }

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

  describe("Similarity.cosineNearDupPairs (blocked exact)") {
    it("finds exactly the above-threshold pairs") {
      val pairs = Similarity.cosineNearDupPairs(vectors, threshold = 0.99)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      // cos(1,4)=0.991 also clears 0.99 — three near-dup pairs
      assert(pairs == Set((0L, 1L), (1L, 4L), (2L, 3L)))
    }

    it("equals the brute all-pairs result on a random corpus, for any block count") {
      val corpus = randomCorpus(n = 120, dim = 8, seed = 7)
      val brute = Similarity.bruteCosinePairs(corpus, threshold = 0.5)
        .select("vec_a", "vec_b", "sim_r").as[(Long, Long, Double)].collect().toSet
      assert(brute.nonEmpty) // threshold must bite for the proof to mean anything
      for (nb <- Seq(1, 3, 16, 300)) {
        val blocked = Similarity.cosineNearDupPairs(corpus, threshold = 0.5, numBlocks = nb)
          .select("vec_a", "vec_b", "sim_r").as[(Long, Long, Double)].collect().toSet
        assert(blocked == brute, s"numBlocks=$nb")
      }
    }

    it("plans an equi-join — no cartesian / nested-loop node") {
      val plan = Similarity.cosineNearDupPairs(vectors, threshold = 0.5)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    }

    it("publishes the exact_cosine_pairs observe metric — the Θ(n²) hazard, measured") {
      // a 100 TB caller's pointer to signLshNearDupPairs/semanticDedup
      // is this metric climbing quadratically; pin that it reports the
      // executed compare count (every unordered pair exactly once) and
      // the surviving pair count
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("exact_cosine_pairs_")) seen.add(row)
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        val out = Similarity.cosineNearDupPairs(vectors, threshold = 0.99).collect()
        val deadline = System.currentTimeMillis() + 30000
        while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
        assert(!seen.isEmpty, "observe metric never arrived")
        val row = seen.poll()
        val n = vectors.count()
        assert(row.getAs[Long]("n_compares") == n * (n - 1) / 2)
        assert(row.getAs[Long]("n_pairs") == out.length.toLong)
      } finally spark.listenerManager.unregister(listener)
    }
  }

  describe("Similarity.signLshNearDupPairs") {
    it("recovers exactly the brute result on a separated near-dup corpus") {
      // planted duplicates at cosine ~0.995 over an orthogonal-ish background
      val base = randomCorpus(n = 150, dim = 16, seed = 11)
      val planted = base.select((col("vec_id") + 10000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.05)),
          slice(col("embedding"), 2, 1000)).as("embedding"))
      val corpus = base.unionByName(planted)
      val brute = Similarity.bruteCosinePairs(corpus, threshold = 0.9)
        .select("vec_a", "vec_b", "sim_r").as[(Long, Long, Double)].collect().toSet
      assert(brute.size >= 150) // every planted pair is above threshold
      val lsh = Similarity.signLshNearDupPairs(corpus, threshold = 0.9)
        .select("vec_a", "vec_b", "sim_r").as[(Long, Long, Double)].collect().toSet
      assert(lsh == brute)
    }

    it("plans bucket joins — no cartesian / nested-loop node") {
      val plan = Similarity.signLshNearDupPairs(vectors, threshold = 0.9)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  describe("Similarity.mmrGreedy") {
    it("trades relevance against redundancy on a hand-checked case") {
      // a and b near-identical, c less relevant but diverse: pure
      // relevance picks (a, b); MMR at λ=0.7 picks (a, c)
      val cands = Seq((1L, 900000L), (2L, 890000L), (3L, 600000L)) // a b c
      val pairs = Map((2L, 1L) -> 990000L, (1L, 2L) -> 990000L,
        (3L, 1L) -> 100000L, (1L, 3L) -> 100000L,
        (3L, 2L) -> 120000L, (2L, 3L) -> 120000L)
      val picked = Similarity.mmrGreedy(cands, pairs, k = 2, lam10 = 7)
      assert(picked.map(_._2) == Seq(1L, 3L), picked)
      // scores: step1 = 7·900000; step2(c) = 7·600000 − 3·100000
      assert(picked.map(_._3) == Seq(6300000L, 3900000L), picked)
      // λ=10 degenerates to pure relevance: (a, b)
      assert(Similarity.mmrGreedy(cands, pairs, 2, 10).map(_._2) == Seq(1L, 2L))
    }

    it("ties break to the smaller id and k caps at the candidate count") {
      val cands = Seq((5L, 100L), (4L, 100L))
      val r = Similarity.mmrGreedy(cands, Map((4L, 5L) -> 0L, (5L, 4L) -> 0L), 5, 7)
      assert(r.map(_._2) == Seq(4L, 5L))
      assert(r.map(_._1) == Seq(1, 2))
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

    it("nprobe widens recall: nprobe = numCentroids equals brute force") {
      val corpus = randomCorpus(n = 80, dim = 8, seed = 3)
      val queries = corpus.filter(col("vec_id") < 10)
      val centroids = corpus.filter(col("vec_id") < 4)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "rnk", "neighbor_id").as[(Long, Int, Long)].collect().toSet
      val brute = rows(Similarity.bruteTopK(corpus, queries, k = 3))
      val probeAll = rows(Similarity.ivfTopK(corpus, queries, centroids, k = 3, nprobe = 4))
      assert(probeAll == brute)
    }

    it("trainCentroids converges to the cluster structure (Lloyd's)") {
      // two tight clusters: ids 0/1 seed one member of each (the
      // deterministic lowest-id init), the rest split between them
      val rnd = new scala.util.Random(5)
      def around(base: Array[Double]) =
        base.map(_ + rnd.nextGaussian() * 0.05)
      val a = Array(1.0, 0.0, 0.0, 0.0)
      val b = Array(0.0, 0.0, 1.0, 0.0)
      val rows = (0L until 60L).map { i =>
        (i, around(if (i % 2 == 0) a else b))
      }
      val corpus = rows.toDF("vec_id", "embedding")
      val trained = Similarity.trainCentroids(corpus, k = 2, iters = 5)
      val cents = trained.select("vec_id", "embedding").as[(Long, Array[Double])]
        .collect().toMap
      assert(cents.size == 2)
      // each trained centroid aligns with one true cluster direction
      def cos(x: Array[Double], y: Array[Double]): Double = {
        val d = x.zip(y).map { case (p, q) => p * q }.sum
        d / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
      }
      assert(cos(cents(0L), a) > 0.99 && cos(cents(1L), b) > 0.99)
      // trained codebook drives IVF: in-cluster queries match brute force
      val queries = corpus.filter(col("vec_id") < 6)
      val brute = Similarity.bruteTopK(corpus, queries, k = 2)
        .select("query_id", "rnk", "neighbor_id").as[(Long, Int, Long)].collect().toSet
      val ivf = Similarity.ivfTopK(corpus, queries, trained, k = 2)
        .select("query_id", "rnk", "neighbor_id").as[(Long, Int, Long)].collect().toSet
      assert(ivf == brute) // clusters are separated, so nprobe=1 suffices
    }

    it("trainCentroids under Reliable truncation matches the Local policy") {
      withTempDir { dir =>
        val corpus = randomCorpus(n = 40, dim = 6, seed = 9)
        def cents(t: Truncation) =
          Similarity.trainCentroids(corpus, k = 3, iters = 4, truncation = t)
            .select("vec_id", "embedding").as[(Long, Array[Double])]
            .collect().toMap.map { case (k, v) => k -> v.toSeq }
        assert(cents(Truncation.Reliable(dir.getAbsolutePath, every = 2)) ==
          cents(Truncation.Local))
      }
    }

    it("argmax runs as a partial aggregation, not a window sort") {
      // partial_max_by = map-side combine (one row per vector per
      // partition crosses the shuffle); the old row_number window
      // shuffled and sorted EVERY scored row. max_by's struct buffer
      // keeps it a SortAggregate rather than HashAggregate — the partial
      // step is the scale win either way.
      val plan = Similarity.assign(vectors, vectors.filter(col("vec_id").isin(0L, 2L)))
        .queryExecution.executedPlan.toString
      assert(plan.contains("partial_max_by") && !plan.contains("Window"), plan)
    }
  }

  describe("Similarity.hardNegatives") {
    // labels: cluster around x-axis = label 0, around z-axis = label 1
    def labeled = vectors.withColumn("label",
      when(col("vec_id").isin(0L, 1L, 4L), 0).otherwise(1))

    it("ranks only different-label neighbors, hardest first") {
      val got = Similarity.hardNegatives(labeled,
          labeled.filter(col("vec_id") === 0L), k = 2)
        .select("query_id", "rnk", "neighbor_id", "neighbor_label")
        .as[(Long, Int, Long, Int)].collect().toSeq
      // anchor 0 = (1,0,0), label 0: negatives are 2,3 (label 1), both
      // orthogonal (cos = 0) → the deterministic id tie-break orders them
      assert(got == Seq((0L, 1, 2L, 1), (0L, 2, 3L, 1)))
      assert(got.forall(_._4 == 1))
    }

    it("never returns a same-label neighbor even at k past the negative pool") {
      val got = Similarity.hardNegatives(labeled,
          labeled.filter(col("vec_id") === 2L), k = 10)
      assert(got.count() == 3) // only the three label-0 vectors qualify
      assert(got.filter(col("neighbor_label") === 1).count() == 0)
    }
  }

  describe("Similarity.semanticDedup") {
    // the 5-vector fixture: cluster around (1,0,0) = ids 0,1,4; around
    // (0,0,1) = ids 2,3; centroids = vectors 0 and 2
    def centroids = vectors.filter(col("vec_id").isin(0L, 2L))

    it("drops within-cluster near-dups, keep-earliest, total over the corpus") {
      val got = Similarity.semanticDedup(vectors, centroids, threshold = 0.9)
        .select("vec_id", "centroid_id", "kept").as[(Long, Long, Boolean)]
        .collect().toSet
      // cos(0,1)≈0.994, cos(0,4)≈0.970, cos(2,3)≈0.994 — every later
      // member of each cluster loses to its earliest
      assert(got == Set((0L, 0L, true), (1L, 0L, false), (4L, 0L, false),
        (2L, 2L, true), (3L, 2L, false)))
    }

    it("keeps everything when nothing clears the threshold") {
      val kept = Similarity.semanticDedup(vectors, centroids, threshold = 0.999)
        .filter(col("kept")).count()
      assert(kept == 5L)
    }

    it("misses cross-cluster pairs by design (the documented approximation)") {
      // ids 0 and 1 at cos≈0.994, but each is its OWN centroid → they
      // land in different clusters and both survive
      val both = vectors.filter(col("vec_id").isin(0L, 1L))
      val got = Similarity.semanticDedup(vectors, both, threshold = 0.9)
        .filter(col("vec_id").isin(0L, 1L)).select("kept").as[Boolean].collect().toSeq
      assert(got == Seq(true, true))
    }

    it("plans the within-cluster pair join as an equi-join, never a cartesian") {
      // the only nested-loop in the plan is assign()'s deliberate
      // broadcast of the (small-by-contract) centroid table; the
      // quadratic-risk pair join must key-partition on centroid_id
      val plan = Similarity.semanticDedup(vectors, centroids, threshold = 0.9)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(plan.contains("centroid_id"), plan)
    }
  }

  describe("Similarity.semanticDedupK / semanticDedupAuto (k scales with N)") {
    it("derives k = ceil(N / target), holding E|cluster| at or under target") {
      assert(Similarity.semanticDedupK(1000L, 125L) == 8)
      assert(Similarity.semanticDedupK(1001L, 125L) == 9)
      assert(Similarity.semanticDedupK(1L, 125L) == 1)
      assert(Similarity.semanticDedupK(0L, 125L) == 1)
      assert(Similarity.semanticDedupK(100000000000L, 4096L) == 24414063)
      // the invariant the derivation exists for: E|c| = N/k <= target,
      // so balanced pairwise work sum(|c|^2) ~= N * E|c| stays LINEAR
      // in N at fixed target (a fixed k degrades to N^2/k)
      for (n <- Seq(10L, 1000L, 123457L, 10000000L); t <- Seq(1L, 125L, 4096L)) {
        val k = Similarity.semanticDedupK(n, t)
        assert(n.toDouble / k <= t.toDouble, s"E|c| ${n.toDouble / k} > target $t (n=$n)")
      }
    }

    it("balanced k = ceil(sqrt(N)) equalizes brute-assignment and pairwise terms") {
      assert(Similarity.semanticDedupKBalanced(0L) == 1)
      assert(Similarity.semanticDedupKBalanced(100L) == 10)
      assert(Similarity.semanticDedupKBalanced(101L) == 11)
      assert(Similarity.semanticDedupKBalanced(1000000000000L) == 1000000)
      // N*k == N^2/k at this k (within integer rounding): both cost
      // terms meet at N^1.5 — the brute-assignment optimum
      for (n <- Seq(100L, 10000L, 1000000L)) {
        val k = Similarity.semanticDedupKBalanced(n)
        assert(math.abs(n * k - n * n / k) <= n, s"terms diverge at n=$n, k=$k")
      }
    }

    it("auto path: trained clusters keep sum(|cluster|^2) near N*target on spread data") {
      // 384 deterministic 4-d vectors, well spread; target 32 -> k=12.
      // Balanced bound: sum(|c|^2) = N*target = 12288; assert within 5x
      // to absorb k-means imbalance — the LINEAR-in-N regime, vs the
      // degenerate single-cluster 147456 (= N^2) a fixed k=1 would give.
      val rnd = new scala.util.Random(11)
      val data = (0L until 384L).map(i =>
        (i, Array.fill(4)(rnd.nextDouble() * 2 - 1))).toDF("vec_id", "embedding")
      val n = 384L; val target = 32L
      val k = Similarity.semanticDedupK(n, target)
      assert(k == 12)
      val cents = Similarity.trainCentroids(data, k, iters = 3)
      val sizes = Similarity.assign(data, cents)
        .groupBy("centroid_id").count().select("count").as[Long].collect()
      assert(sizes.sum == n)
      val sumSq = sizes.map(s => s * s).sum
      assert(sumSq <= 5L * n * target, s"sum|c|^2 = $sumSq exceeds 5*N*target = ${5L * n * target}")
      // and the auto entry point runs end-to-end on the same derivation
      // (threshold > 1 is unreachable for cosine -> total, all kept)
      val out = Similarity.semanticDedupAuto(data, threshold = 1.1,
        targetClusterSize = target, iters = 1)
      assert(out.count() == n)
      assert(out.filter(col("kept")).count() == n)
    }
  }

  describe("Similarity.marginMutualPairs") {
    it("mines exactly the mutual-best pairs with exact integer margins") {
      // x1∥y1 and x2∥y3 are perfect matches; y2 sits between them
      val xs = Seq((100L, Array(1.0f, 0.0f)), (101L, Array(0.0f, 1.0f)))
        .toDF("vec_id", "embedding")
      val ys = Seq((200L, Array(1.0f, 0.0f)), (201L, Array(0.6f, 0.8f)),
        (202L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
      val out = Similarity.marginMutualPairs(xs, ys, k = 1, minMarginMicro = 1000000L)
        .select("x_id", "y_id", "simfp", "margin_micro")
        .as[(Long, Long, Long, Long)].collect().toSet
      // sim(x1,y1)=sim(x2,y3)=1.0 exactly; k=1 sums are 10^6 each side →
      // margin = 10^6·2·10^6 / 2·10^6 = 10^6 exactly
      assert(out == Set((100L, 200L, 1000000L, 1000000L),
        (101L, 202L, 1000000L, 1000000L)))
    }

    it("corrects hubness: the raw-cosine best loses to the margin best") {
      // yh is closest to x1 by raw cosine BUT is also near x2 (a hub →
      // large k-NN sum); yd is slightly farther from x1 yet isolated.
      val xs = Seq((1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.0f, 0.0f, 1.0f)))
        .toDF("vec_id", "embedding")
      val ys = Seq((10L, Array(0.98f, 0.0f, 0.199f)),  // yh: the hub
        (11L, Array(0.96f, 0.28f, 0.0f)))              // yd: isolated
        .toDF("vec_id", "embedding")
      val rawBest = Similarity.bruteTopK(ys, xs.filter(col("vec_id") === 1), k = 1)
        .select("neighbor_id").as[Long].head()
      assert(rawBest == 10L) // cosine alone picks the hub
      val mined = Similarity.marginMutualPairs(xs, ys, k = 2, minMarginMicro = 1000000L)
        .select("x_id", "y_id").as[(Long, Long)].collect().toSet
      assert(mined == Set((1L, 11L))) // margin demotes the hub
    }

    it("is invariant under partitioning") {
      val xs = randomCorpus(40, 8, seed = 7).filter(col("vec_id") % 4 === 0)
      val ys = randomCorpus(40, 8, seed = 7).filter(col("vec_id") % 4 =!= 0)
      val a = Similarity.marginMutualPairs(xs, ys, k = 3, minMarginMicro = 0L)
        .select("x_id", "y_id", "margin_micro").as[(Long, Long, Long)].collect().toSet
      val b = Similarity.marginMutualPairs(xs.repartition(13), ys.repartition(7),
          k = 3, minMarginMicro = 0L)
        .select("x_id", "y_id", "margin_micro").as[(Long, Long, Long)].collect().toSet
      assert(a == b && a.nonEmpty)
      // mutual-best: no id appears twice on either side
      assert(a.map(_._1).size == a.size && a.map(_._2).size == a.size)
    }
  }

  describe("Similarity.truncationRecall") {
    it("measures prefix-sliced top-k recall against the full-dim reference (q302)") {
      // full 4-dim: a ≈ 0.993 beats b ≈ 0.196 → top1 = a
      // 2-dim prefix: b = (1,0) scores exact 1.0 and beats a → recall 0
      val corpus = Seq(
        (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // a
        (2L, Array(1.0f, 0.0f, 5.0f, 0.0f)))   // b
        .toDF("vec_id", "embedding")
      val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
        .toDF("vec_id", "embedding")
      val got = Similarity.truncationRecall(corpus, queries, Seq(2, 4), k = 1)
        .as[(Int, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got == Seq((2, 1L, 0L, 0L), (4, 1L, 1L, 1000000L)))
    }
  }

  describe("Similarity.incrementalAssignments") {
    // two well-separated clusters; centroids = vecs 0 and 2
    val current = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),  // centroid A, unchanged
      (1L, Array(0.9f, 0.1f, 0.0f)),  // unchanged
      (2L, Array(0.0f, 0.0f, 1.0f)),  // centroid B, unchanged
      (3L, Array(0.0f, 0.1f, 0.9f)),  // changed since prev (was near A)
      (4L, Array(0.8f, 0.2f, 0.0f)))  // added since prev
      .toDF("vec_id", "embedding")
    val prev = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f)),
      (3L, Array(0.9f, 0.0f, 0.1f)),  // older revision: sat in cluster A
      (9L, Array(0.7f, 0.1f, 0.0f)))  // removed since prev
      .toDF("vec_id", "embedding")
    val cents = current.filter(col("vec_id").isin(0L, 2L))

    it("maintained store ≡ full re-assignment, with exact provenance") {
      val out = Similarity.incrementalAssignments(
        current, Similarity.assignmentStore(prev, cents), cents)
      val full = Similarity.assignmentStore(current, cents)
      val key = Seq(col("vec_id"), col("content_fp"), col("centroid_id"))
      assert(out.select(key: _*).except(full.select(key: _*)).count() == 0)
      assert(out.count() == full.count())
      val src = out.select("vec_id", "src").as[(Long, String)].collect().toMap
      assert(src == Map(0L -> "retained", 1L -> "retained", 2L -> "retained",
        3L -> "computed", 4L -> "computed"))
      // the revision actually re-routed: 3 left cluster A for B
      val c3 = out.filter(col("vec_id") === 3L).select("centroid_id")
        .as[Long].head()
      assert(c3 == 2L)
    }

    it("an unchanged crawl recomputes nothing and drops nothing") {
      val out = Similarity.incrementalAssignments(
        current, Similarity.assignmentStore(current, cents), cents)
      val src = out.select("src").as[String].collect()
      assert(src.length == 5 && src.forall(_ == "retained"))
    }

    it("ivfTopKFromAssignments over the maintained store ≡ ivfTopK from scratch (q295)") {
      val store = Similarity.incrementalAssignments(
        current, Similarity.assignmentStore(prev, cents), cents)
      val queries = current.filter(col("vec_id").isin(1L, 4L))
      val served = Similarity.ivfTopKFromAssignments(
          current, queries, store, cents, k = 2)
        .select(col("query_id"), col("rnk"), col("neighbor_id"))
        .as[(Long, Int, Long)].collect().toSet
      val scratch = Similarity.ivfTopK(current, queries, cents, k = 2)
        .select(col("query_id"), col("rnk"), col("neighbor_id"))
        .as[(Long, Int, Long)].collect().toSet
      assert(served == scratch && served.nonEmpty)
    }

    it("drift→retrain handoff: below threshold keeps maintained buckets, above retrains ≡ from-scratch (q291)") {
      def handoff(thresholdPpm: Long) = {
        val prevStore = Similarity.assignmentStore(prev, cents)
        val store = Similarity.incrementalAssignments(current, prevStore, cents)
        val moved = Similarity.assignmentDrift(prevStore, store)
          .agg(coalesce(sum(col("n_moved_out")), lit(0L))).head.getLong(0)
        val persisted = prevStore.select(col("vec_id"))
          .join(store.select(col("vec_id")), "vec_id").count()
        val ppm = if (persisted == 0L) 0L else moved * 1000000L / persisted
        val next =
          if (ppm >= thresholdPpm)
            Similarity.assign(current, Similarity.trainCentroids(current, 2, 2))
              .select(col("vec_id"), col("centroid_id"))
          else store.select(col("vec_id"), col("centroid_id"))
        (ppm, ppm >= thresholdPpm,
          next.as[(Long, Long)].collect().toSet)
      }
      // churn: vec 3 moved, persisted = {0,1,2,3} → exactly 250000 ppm
      val (ppm, fired, next) = handoff(500000L)
      assert(ppm == 250000L && !fired)
      val maintained = Similarity.incrementalAssignments(
          current, Similarity.assignmentStore(prev, cents), cents)
        .select(col("vec_id"), col("centroid_id"))
        .as[(Long, Long)].collect().toSet
      assert(next == maintained) // quiet gate: old centroids kept verbatim
      val (ppm2, fired2, next2) = handoff(200000L)
      assert(ppm2 == 250000L && fired2)
      val scratch = Similarity.assign(current,
          Similarity.trainCentroids(current, 2, 2))
        .select(col("vec_id"), col("centroid_id"))
        .as[(Long, Long)].collect().toSet
      assert(next2 == scratch) // fired gate: ≡ from-scratch train+assign
    }

    it("upsertAssignments: batch upserts re-score only changed fps, retain the rest (q300)") {
      val store0 = Similarity.assignmentStore(prev, cents)
        .withColumn("src", lit("b0"))
      // batch: vec 3 revised (fp changes → re-score lands in B), vec 1
      // REDELIVERED verbatim (fp unchanged → keeps row AND b0 tag),
      // vec 4 brand new; vecs 0/2/9 absent → retained (no deletes)
      val batch = Seq(
        (1L, Array(0.9f, 0.1f, 0.0f)),
        (3L, Array(0.0f, 0.1f, 0.9f)),
        (4L, Array(0.8f, 0.2f, 0.0f))).toDF("vec_id", "embedding")
      // materialized between applications, as the streaming flow's
      // per-batch parquet store does (also severs the observe node)
      val out = Similarity.upsertAssignments(batch, store0, cents, "b1")
        .localCheckpoint(true)
      val got = out.select("vec_id", "centroid_id", "src")
        .as[(Long, Long, String)].collect().toSet
      assert(got == Set(
        (0L, 0L, "b0"), (1L, 0L, "b0"), (2L, 2L, "b0"), (9L, 0L, "b0"),
        (3L, 2L, "b1"), (4L, 0L, "b1")))
      // idempotent: re-applying the same batch changes nothing
      val again = Similarity.upsertAssignments(batch, out, cents, "b2")
        .select("vec_id", "centroid_id", "src")
        .as[(Long, Long, String)].collect().toSet
      assert(again == got)
    }

    it("upsertAssignments survives a MULTI-ACTION consumer (eager checkpoint contract)") {
      // the operator's shared `changed` stage fans out to the fresh
      // scoring AND the retain anti-join; it is EAGER-checkpointed so a
      // caller that fires several separate actions on one result (the
      // shape that raced lazy checkpoints at the query layer, commit
      // 1b0f643) cannot observe a recomputed — and possibly re-raced —
      // subtree. Pin it: two collects and a count on ONE result agree.
      val store0 = Similarity.assignmentStore(prev, cents)
        .withColumn("src", lit("b0"))
      val batch = Seq(
        (3L, Array(0.0f, 0.1f, 0.9f)),
        (4L, Array(0.8f, 0.2f, 0.0f))).toDF("vec_id", "embedding")
      val out = Similarity.upsertAssignments(batch, store0, cents, "b1")
      def read() = out.select("vec_id", "centroid_id", "src")
        .as[(Long, Long, String)].collect().toSet
      val first = read()
      val n = out.count() // second action
      val second = read() // third action
      assert(first == second && n == first.size.toLong)
      assert(first.map(_._1) == Set(0L, 1L, 2L, 3L, 4L, 9L))
    }

    it("assignmentDrift isolates routing churn from population churn") {
      val prevStore = Similarity.assignmentStore(prev, cents)
      val next = Similarity.incrementalAssignments(current, prevStore, cents)
      val d = Similarity.assignmentDrift(prevStore, next)
        .select("centroid_id", "n_prev", "n_next", "n_moved_in",
          "n_moved_out", "moved_ppm")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      // vec 3 moved A→B; vec 9 departed and vec 4 arrived (not drift)
      assert(d == Set(
        (0L, 4L, 3L, 0L, 1L, 250000L),
        (2L, 1L, 2L, 1L, 0L, 0L)))
    }
  }
}
