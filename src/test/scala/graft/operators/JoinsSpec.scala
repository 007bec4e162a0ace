package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  describe("Joins.saltedJoin") {
    it("produces exactly the plain join's rows on skewed data") {
      // 1000 rows of one hot key + a long tail
      val left = ((1 to 1000).map(i => (7L, s"hot$i")) ++ (1 to 50).map(i => (i.toLong, s"tail$i")))
        .toDF("k", "payload")
      val right = (1 to 60).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")

      val plain = left.join(right, Seq("k")).select("k", "payload", "attr")
        .as[(Long, String, String)].collect().sorted.toSeq
      val salted = Joins.saltedJoin(left, right, "k", salts = 8)
        .select("k", "payload", "attr")
        .as[(Long, String, String)].collect().sorted.toSeq
      assert(salted == plain)
      assert(salted.count(_._1 == 7L) == 1001) // 1000 hot rows + tail7
    }

    it("degenerates to the plain join at salts=1") {
      val left = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      val right = Seq((1L, "x")).toDF("k", "w")
      val r = Joins.saltedJoin(left, right, "k", salts = 1)
        .as[(Long, String, String)].collect().toSeq
      assert(r == Seq((1L, "a", "x")))
    }
  }

  describe("Joins.rangeJoin") {
    it("matches a brute-force BETWEEN join including bin-edge cases") {
      val points = (0 to 100).map(_.toDouble).toDF("p")
      val intervals = Seq((1L, 0.0, 10.0), (2L, 9.5, 10.5), (3L, 99.9, 200.0), (4L, 50.0, 50.0))
        .toDF("k", "lo", "hi")
      val brute = points.crossJoin(intervals)
        .filter(col("p") >= col("lo") && col("p") <= col("hi"))
        .select("k", "p").as[(Long, Double)].collect().sorted.toSeq
      val binned = Joins.rangeJoin(points, col("p"), intervals, col("lo"), col("hi"), binSize = 7.0)
        .select("k", "p").as[(Long, Double)].collect().sorted.toSeq
      assert(binned == brute)
      assert(binned.contains((4L, 50.0))) // degenerate point interval
    }
  }

  describe("Joins.asofJoin") {
    it("picks the latest right row at-or-before each left row per key") {
      val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"))
        .toDF("k", "ts", "trade")
      val quotes = Seq((1L, 8L, "q8"), (1L, 10L, "q10"), (1L, 15L, "q15"), (2L, 9L, "q9"))
        .toDF("k", "ts", "quote")
      val r = Joins.asofJoin(trades, quotes, "k", "ts", "ts", Seq("quote"))
        .select("trade", "asof_quote").as[(String, Option[String])].collect().toMap
      assert(r("t1").contains("q10")) // equal timestamps match (>=)
      assert(r("t2").contains("q15"))
      assert(r("t3").isEmpty)         // no quote at-or-before ts=5 for key 2
    }

    it("never matches right rows with a NULL timestamp (ASOF semantics)") {
      val trades = Seq((1L, 10L, "t1")).toDF("k", "ts", "trade")
      // NULL-ts quote would sort first under nulls-first asc and leak
      // into the carried-forward payload without the isNotNull guard
      val quotes = Seq((1L, Some(8L), "q8"), (1L, None, "qNULL"))
        .toDF("k", "ts", "quote")
      val r = Joins.asofJoin(trades, quotes, "k", "ts", "ts", Seq("quote"))
        .select("trade", "asof_quote").as[(String, Option[String])].collect().toMap
      assert(r("t1").contains("q8"))
      // and with ONLY null-ts right rows, the match is null
      val onlyNull = Seq((1L, Option.empty[Long], "qNULL")).toDF("k", "ts", "quote")
      val r2 = Joins.asofJoin(trades, onlyNull, "k", "ts", "ts", Seq("quote"))
        .select("trade", "asof_quote").as[(String, Option[String])].collect().toMap
      assert(r2("t1").isEmpty)
    }
  }

  describe("Joins.intervalJoin") {
    val a = Seq(("a1", 0.0, 10.0), ("a2", 25.0, 26.0), ("a3", 5.0, 95.0))
      .toDF("aid", "lo", "hi")
    val b = Seq(("b1", 8.0, 30.0), ("b2", 10.0, 10.0), ("b3", 96.0, 99.0))
      .toDF("bid", "blo", "bhi")

    def pairs(binSize: Double) =
      Joins.intervalJoin(a, col("lo"), col("hi"), b, col("blo"), col("bhi"), binSize)
        .select("aid", "bid").as[(String, String)].collect().toSet

    it("finds exactly the overlapping pairs, closed ends touching included") {
      // a1∩b1 ([8,10]), a1∩b2 (point 10 touches), a2⊂b1, a3∩b1, a3∩b2;
      // b3 starts past a3's end → no pair
      assert(pairs(10.0) == Set(("a1", "b1"), ("a1", "b2"), ("a2", "b1"),
        ("a3", "b1"), ("a3", "b2")))
    }

    it("emits each pair ONCE even when it spans many shared bins (canonical bin, no distinct)") {
      // a3 [5,95] and b1 [8,30] share bins 0,1,2,3 at width 10 — and with
      // tiny bins share dozens — still one row
      val r = Joins.intervalJoin(a, col("lo"), col("hi"), b, col("blo"), col("bhi"), 1.0)
        .filter(col("aid") === "a3" && col("bid") === "b1").count()
      assert(r == 1L)
    }

    it("is invariant to bin width") {
      assert(pairs(1.0) == pairs(10.0) && pairs(10.0) == pairs(1000.0))
    }

    it("plans an equi-join on the bin — no cartesian product") {
      val plan = Joins.intervalJoin(a, col("lo"), col("hi"), b, col("blo"), col("bhi"), 10.0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    }
  }

  describe("Joins.incrementalJoinView") {
    import spark.implicits._
    val aAll = Seq((1L, "a1"), (2L, "a2"), (3L, "a3"), (4L, "a4"))
      .toDF("k", "av")
    val bAll = Seq((1L, "b1"), (1L, "b1x"), (2L, "b2"), (3L, "b3"), (5L, "b5"))
      .toDF("k", "bv")

    it("prev ∪ delta legs ≡ the full join, with every leg populated") {
      // deltas: a row 3 and 4 are new; b rows for keys 2 and 3 are new
      val (aOld, aD) = (aAll.filter(col("k") < 3), aAll.filter(col("k") >= 3))
      val (bOld, bD) = (bAll.filter(col("k") < 2 || col("k") > 3),
        bAll.filter(col("k") === 2 || col("k") === 3))
      val prev = aOld.join(bOld, "k")
      val maintained = Joins.incrementalJoinView(prev, aOld, aD, bOld, bD, "k")
        .as[(Long, String, String)].collect().sorted.toSeq
      val full = aAll.join(bAll, "k")
        .as[(Long, String, String)].collect().sorted.toSeq
      assert(maintained == full) // exact multiset: no row duplicated, none missed
      assert(maintained.size == 4)
    }

    it("empty deltas are the identity") {
      val empty = aAll.filter(lit(false))
      val prev = aAll.join(bAll, "k")
      val out = Joins.incrementalJoinView(prev, aAll, empty, bAll,
          bAll.filter(lit(false)).select(col("k"), col("bv")), "k")
        .as[(Long, String, String)].collect().sorted.toSeq
      assert(out == prev.as[(Long, String, String)].collect().sorted.toSeq)
    }
  }
}
