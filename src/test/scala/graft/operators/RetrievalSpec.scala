package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // corpus with known tf/df/dl structure: "spark" is rare, "data" common
  private lazy val corpus = Seq(
    (0L, "spark data data data"),
    (1L, "data data data data data data data data"),
    (2L, "spark spark data"),
    (3L, "rows and more rows of data"),
    (4L, "unrelated words entirely here")).toDF("doc_id", "text")

  /** JVM replay of the documented fixed-point scorer. */
  private def score(queryTerms: Set[String],
                    docs: Seq[(Long, String)]): Map[Long, Long] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = docs.size.toLong
    val total = toks.values.map(_.size.toLong).sum
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    (for ((id, ts) <- toks.toSeq) yield id -> (for {
      t <- queryTerms.toSeq
      tf = ts.count(_ == t).toLong if tf > 0
    } yield {
      val df = dfm(t)
      val ratio = ((n + 1) * 1048576L) / (df + 1)
      val e = 63 - java.lang.Long.numberOfLeadingZeros(ratio)
      val widf = e * 1024L + (ratio * 1024L >> e) - 1024L
      val norm1000 = 250L + 750L * ts.size * n / total
      val denom1000 = tf * 1000L + 1200L * norm1000 / 1000L
      widf * (tf * 2200L * 1000L / denom1000)
    }).sum).filter(_._2 > 0).toMap
  }

  describe("Retrieval.bm25TopK") {
    it("ranks by the documented integer fixed-point BM25, ties by doc_id") {
      val qt = Seq((0L, "spark"), (0L, "data"), (1L, "rows")).toDF("query_id", "term")
      val got = Retrieval.bm25TopK(corpus, col("doc_id"), col("text"), qt, k = 10)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Long, Int)].collect()

      val docsSeq = corpus.as[(Long, String)].collect().toSeq
      for (q <- Seq(0L, 1L)) {
        val terms = if (q == 0L) Set("spark", "data") else Set("rows")
        val want = score(terms, docsSeq).toSeq
          .sortBy { case (id, sc) => (-sc, id) }
          .zipWithIndex.map { case ((id, sc), i) => (q, id, sc, i + 1) }
        assert(got.filter(_._1 == q).toSeq == want, s"query $q")
      }
      // rare term outranks common one at same tf profile: doc 2 ("spark"
      // twice, short) must beat doc 1 (only "data") on query 0
      val r0 = got.filter(_._1 == 0L).map(g => g._2 -> g._4).toMap
      assert(r0(2L) < r0(1L))
    }

    it("collapses repeated query terms and cuts at k") {
      val dup = Seq((0L, "data"), (0L, "data")).toDF("query_id", "term")
      val single = Seq((0L, "data")).toDF("query_id", "term")
      val a = Retrieval.bm25TopK(corpus, col("doc_id"), col("text"), dup, k = 2)
        .orderBy("rank").as[(Long, Long, Long, Int)].collect()
      val b = Retrieval.bm25TopK(corpus, col("doc_id"), col("text"), single, k = 2)
        .orderBy("rank").as[(Long, Long, Long, Int)].collect()
      assert(a.toSeq == b.toSeq)
      assert(a.length == 2) // 4 docs contain "data"; k cuts to 2
    }

    it("is invariant to input partitioning") {
      val qt = Seq((0L, "data"), (0L, "rows")).toDF("query_id", "term")
      val one = Retrieval.bm25TopK(corpus.coalesce(1), col("doc_id"), col("text"), qt, k = 10)
        .orderBy("query_id", "rank").collect().toSeq
      val many = Retrieval.bm25TopK(corpus.repartition(7), col("doc_id"), col("text"), qt, k = 10)
        .orderBy("query_id", "rank").collect().toSeq
      assert(one == many)
    }
  }

  describe("Retrieval.incrementalPostings") {
    val current = Seq(
      (1L, "alpha beta alpha"),          // unchanged
      (2L, "one two three two"),         // changed since prev
      (3L, "red green"),                 // added since prev
      (4L, "north south north north"))   // unchanged
      .toDF("doc_id", "text")
    val prev = Seq(
      (1L, "alpha beta alpha"),
      (2L, "one two OLD two"),
      (4L, "north south north north"),
      (9L, "gone gone"))                 // removed since prev
      .toDF("doc_id", "text")

    it("maintained store ≡ full rebuild, with exact provenance") {
      val out = Retrieval.incrementalPostings(current,
        Retrieval.postingsStore(prev, col("doc_id"), col("text")),
        col("doc_id"), col("text"))
      val full = Retrieval.postingsStore(current, col("doc_id"), col("text"))
      val key = Seq(col("doc_id"), col("content_fp"), col("term"),
        col("tf"), col("dl"))
      assert(out.select(key: _*).except(full.select(key: _*)).count() == 0)
      assert(out.count() == full.count())
      val src = out.select("doc_id", "src").distinct()
        .as[(Long, String)].collect().toMap
      assert(src == Map(1L -> "retained", 2L -> "computed",
        3L -> "computed", 4L -> "retained"))
    }

    it("an unchanged crawl re-tokenizes nothing and drops nothing") {
      val out = Retrieval.incrementalPostings(current,
        Retrieval.postingsStore(current, col("doc_id"), col("text")),
        col("doc_id"), col("text"))
      val srcs = out.select("src").as[String].collect()
      assert(srcs.nonEmpty && srcs.forall(_ == "retained"))
    }

    it("upsertPostings: batch upserts retain absent ids, skip redelivered-unchanged docs, tag provenance (q292)") {
      val store0 = Retrieval.postingsStore(prev, col("doc_id"), col("text"))
        .withColumn("src", lit("b0"))
      // batch: doc 2 revised, doc 3 added, doc 1 REDELIVERED verbatim;
      // docs 4 and 9 absent from the batch
      val batch = Seq(
        (2L, "one two three two"),
        (3L, "red green"),
        (1L, "alpha beta alpha"))
        .toDF("doc_id", "text")
      val out = Retrieval.upsertPostings(batch, store0,
        col("doc_id"), col("text"), "b1")
      val src = out.select("doc_id", "src").distinct()
        .as[(Long, String)].collect().toMap
      // redelivered-unchanged 1 keeps b0; absent 4 AND 9 retained (no
      // snapshot semantics - deletes are a separate pipeline)
      assert(src == Map(1L -> "b0", 2L -> "b1", 3L -> "b1",
        4L -> "b0", 9L -> "b0"))
      // content rows for upserted ids == a fresh build of their texts
      val key = Seq(col("doc_id"), col("content_fp"), col("term"),
        col("tf"), col("dl"))
      val fresh = Retrieval.postingsStore(
        Seq((2L, "one two three two"), (3L, "red green")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      assert(out.filter(col("doc_id").isin(2L, 3L)).select(key: _*)
        .except(fresh.select(key: _*)).count() == 0)
      assert(!out.select("term").as[String].collect().contains("OLD"))
    }

    it("bm25FromPostings over the maintained store ≡ bm25TopK from scratch (q293)") {
      val store = Retrieval.incrementalPostings(current,
        Retrieval.postingsStore(prev, col("doc_id"), col("text")),
        col("doc_id"), col("text"))
      val q = Seq((0L, "alpha"), (0L, "two"), (1L, "north"), (1L, "red"))
        .toDF("query_id", "term")
      val served = Retrieval.bm25FromPostings(store, q, k = 3)
        .as[(Long, Long, Long, Int)].collect().toSet
      val scratch = Retrieval.bm25TopK(current, col("doc_id"), col("text"), q, k = 3)
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(served == scratch && served.nonEmpty)
    }

    it("rrfFuse sums integer-ppm reciprocal ranks across legs (q297)") {
      // leg A ranks: (q0: 10→1, 20→2), leg B: (q0: 20→1, 30→2)
      val a = Seq((0L, 10L, 1), (0L, 20L, 2)).toDF("query_id", "id", "rank")
      val b = Seq((0L, 20L, 1), (0L, 30L, 2)).toDF("query_id", "id", "rank")
      val got = Retrieval.rrfFuse(Seq(a, b), k = 3)
        .as[(Long, Long, Long, Long, Int)].collect().toSeq.sortBy(_._5)
      // id 20: 1000000/62 + 1000000/61 = 16129 + 16393 = 32522 (2 legs)
      // id 10: 1000000/61 = 16393; id 30: 1000000/62 = 16129
      assert(got == Seq(
        (0L, 20L, 32522L, 2L, 1),
        (0L, 10L, 16393L, 1L, 2),
        (0L, 30L, 16129L, 1L, 3)))
    }

    it("rankChurn counts membership and exact Kendall order churn (q303)") {
      // prev: docs 1,2,3 at ranks 1,2,3; cur: 2,1,4 at ranks 1,2,3
      // common {1,2}: prev order 1<2, cur order 2<1 → 1 discordant pair
      // doc 4 entered, doc 3 dropped
      val prev = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3))
        .toDF("query_id", "doc_id", "rank")
      val cur = Seq((0L, 2L, 1), (0L, 1L, 2), (0L, 4L, 3))
        .toDF("query_id", "doc_id", "rank")
      val got = Retrieval.rankChurn(prev, cur)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
      assert(got == ((0L, 2L, 1L, 1L, 0L, 1L, -1L, 1L)))
    }

    it("rankChurn: identical rankings are all-concordant, disjoint ones all-churn") {
      val a = Seq((0L, 1L, 1), (0L, 2L, 2)).toDF("query_id", "doc_id", "rank")
      val same = Retrieval.rankChurn(a, a)
        .as[(Long, Long, Long, Long, Long, Long, Option[Long], Option[Long])].head()
      assert(same == ((0L, 2L, 0L, 0L, 1L, 0L, Some(1L), Some(1L))))
      // disjoint top-k: n_common = 0 → Kendall τ undefined → NULL
      // tau_num/tau_den (never a 0/0 rational a consumer could divide)
      val b = Seq((0L, 8L, 1), (0L, 9L, 2)).toDF("query_id", "doc_id", "rank")
      val disj = Retrieval.rankChurn(a, b)
        .as[(Long, Long, Long, Long, Long, Long, Option[Long], Option[Long])].head()
      assert(disj == ((0L, 0L, 2L, 2L, 0L, 0L, None, None)))
    }

    it("rrfFuse ties break by id and respect k") {
      val a = Seq((0L, 5L, 1), (0L, 9L, 2), (1L, 7L, 1)).toDF("query_id", "id", "rank")
      val b = Seq((0L, 9L, 1), (0L, 5L, 2), (1L, 3L, 1)).toDF("query_id", "id", "rank")
      // q0: both ids score 1000000/61 + 1000000/62 — tie → smaller id first
      val got = Retrieval.rrfFuse(Seq(a, b), k = 1)
        .as[(Long, Long, Long, Long, Int)].collect().toSeq.sortBy(_._1)
      assert(got.map(g => (g._1, g._2, g._5)) == Seq((0L, 5L, 1), (1L, 3L, 1)))
    }

    it("BM25 inputs derive from the maintained store exactly") {
      // df / Σdl / N aggregated from the maintained store must equal
      // the from-scratch index — the fact that keeps bm25TopK warm
      val out = Retrieval.incrementalPostings(current,
        Retrieval.postingsStore(prev, col("doc_id"), col("text")),
        col("doc_id"), col("text"))
      val df = out.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .as[(String, Long)].collect().toMap
      assert(df("alpha") == 1L && df("two") == 1L && df("north") == 1L)
      assert(!df.contains("OLD") && !df.contains("gone"))
      val stats = out.select(col("doc_id"), col("dl")).distinct()
        .agg(sum(col("dl")), count(lit(1))).as[(Long, Long)].head()
      assert(stats == ((3L + 4L + 2L + 4L, 4L)))
    }

    it("rankedEval: hand-computed metrics, rank>k ignored, no-rel sentinel") {
      // k = 3 ⇒ rr_den = lcm(1..3) = 6
      // q0: top-3 = d1,d2,d3 + a rank-4 ROW THAT MUST BE IGNORED (d9,
      //     relevant!); qrels {d2,d3,d9} → n_rel=3, hits=2, first=2,
      //     rr = 6/2 = 3, prec = 2e6 div 3 = 666666, recall = 666666
      // q1: one retrieved, nothing relevant → n_rel=0, first=0, rr=0,
      //     recall = −1 sentinel (NOT null — nulls vanish from means)
      // q2: judged but never ranked → NO output row
      val ranking = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3), (0L, 9L, 4),
        (1L, 7L, 1)).toDF("query_id", "doc_id", "rank")
      val qrels = Seq((0L, 2L), (0L, 3L), (0L, 9L), (2L, 5L))
        .toDF("query_id", "doc_id")
      val got = Retrieval.rankedEval(ranking, qrels, k = 3)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
      assert(got == Seq(
        (0L, 3L, 3L, 2L, 2L, 3L, 6L, 666666L, 666666L),
        (1L, 0L, 1L, 0L, 0L, 0L, 6L, 0L, -1L)))
    }

    it("rankedEval: duplicate qrels collapse; perfect ranking scores rr 1") {
      val ranking = Seq((0L, 5L, 1), (0L, 6L, 2)).toDF("query_id", "doc_id", "rank")
      val qrels = Seq((0L, 5L), (0L, 5L), (0L, 6L)).toDF("query_id", "doc_id")
      val got = Retrieval.rankedEval(ranking, qrels, k = 2)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
      // n_rel = 2 (dup collapsed), hits = 2, first = 1, rr = 2/1 = 2/2
      assert(got == ((0L, 2L, 2L, 2L, 1L, 2L, 2L, 1000000L, 1000000L)))
    }

    it("rankedEval: k outside the int64-lcm bound fails fast") {
      val r = Seq((0L, 1L, 1)).toDF("query_id", "doc_id", "rank")
      val e = intercept[IllegalArgumentException] {
        Retrieval.rankedEval(r, r.select(col("query_id"), col("doc_id")), k = 43)
      }
      assert(e.getMessage.contains("lcm"), e.getMessage)
    }
  }
}
