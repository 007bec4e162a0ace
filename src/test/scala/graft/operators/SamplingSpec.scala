package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1L to 2000L).toDF("id")

  describe("Sampling.deterministicSample") {
    it("selection is identical under any partitioning (the claim df.sample can't make)") {
      def sel(df: org.apache.spark.sql.DataFrame) =
        Sampling.deterministicSample(df, col("id"), 0.3, seed = 1)
          .as[Long].collect().toSet
      val a = sel(ids)
      assert(sel(ids.repartition(13)) == a)
      assert(sel(ids.coalesce(1)) == a)
      // rate lands near the target on a uniform hash
      assert(math.abs(a.size - 600) < 80, s"got ${a.size} of 2000 at 0.3")
    }

    it("seeds give independent selections; fraction 0/1 are exact") {
      val s1 = Sampling.deterministicSample(ids, col("id"), 0.3, seed = 1).as[Long].collect().toSet
      val s2 = Sampling.deterministicSample(ids, col("id"), 0.3, seed = 2).as[Long].collect().toSet
      assert(s1 != s2)
      val overlap = (s1 & s2).size.toDouble
      assert(overlap < 0.3 * 0.3 * 2000 * 2.0, s"seeds correlate: overlap $overlap")
      assert(Sampling.deterministicSample(ids, col("id"), 0.0).count() == 0)
      assert(Sampling.deterministicSample(ids, col("id"), 1.0).count() == 2000)
    }

    it("is a narrow zero-shuffle filter") {
      val plan = Sampling.deterministicSample(ids, col("id"), 0.5)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    }
  }

  describe("Sampling.stratifiedSample") {
    it("applies per-stratum rates with the default for absent strata") {
      val df = ids.withColumn("s",
        when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b").otherwise("c"))
      val out = Sampling.stratifiedSample(df, col("s"), col("id"),
          Map("a" -> 1.0, "b" -> 0.0), defaultFraction = 0.5, seed = 4)
        .groupBy("s").count().as[(String, Long)].collect().toMap
      assert(out("a") == df.filter(col("s") === "a").count()) // kept whole
      assert(!out.contains("b"))                              // dropped whole
      assert(out("c") > 150 && out("c") < 500)                // ~50% of ~667
    }
  }

  describe("Sampling.balancedSample") {
    it("derives min(1, target/n) keep rates from the data: small strata whole, big strata near target") {
      val df = ids.withColumn("s",
        when(col("id") <= 8, lit("tiny")).otherwise((col("id") % 2).cast("string")))
      val out = Sampling.balancedSample(df, col("s"), col("id"),
        targetPerStratum = 100, seed = 4)
      val counts = out.groupBy("s").count().as[(String, Long)].collect().toMap
      assert(counts("tiny") == 8) // n <= target: everything kept
      // ~996 rows per big stratum at rate 100/996: binomial around 100
      assert(math.abs(counts("0") - 100) < 40, s"got ${counts("0")}")
      assert(math.abs(counts("1") - 100) < 40, s"got ${counts("1")}")
    }

    it("selection is deterministic and partitioning-invariant") {
      val df = ids.withColumn("s", (col("id") % 3).cast("string"))
      def sel(d: org.apache.spark.sql.DataFrame) =
        Sampling.balancedSample(d, col("s"), col("id"), targetPerStratum = 50, seed = 9)
          .select("id").as[Long].collect().toSet
      val a = sel(df)
      assert(sel(df.repartition(17)) == a)
      assert(a == sel(df)) // re-run identical
    }

    it("replays the exact rational membership rule hash·n < target·2^60") {
      val df = ids.withColumn("s", lit("one"))
      val kept = Sampling.balancedSample(df, col("s"), col("id"),
        targetPerStratum = 300, seed = 2).select("id").as[Long].collect().toSet
      val expected = (1L to 2000L).filter { id =>
        val h = BigInt(graft.functions.TextFns.hash60Value(s"2:$id"))
        h * 2000 < BigInt(300) * BigInt(Sampling.MaxHash)
      }.toSet
      assert(kept == expected)
    }

    it("rejects reserved __bs_* columns") {
      val e = intercept[IllegalArgumentException] {
        Sampling.balancedSample(ids.withColumn("__bs_n", lit(1)), col("id"), col("id"), 5)
      }
      assert(e.getMessage.contains("__bs_n"))
    }

    it("per-stratum targets: zero excludes, oversubscribed keeps whole, default fills the rest") {
      val df = ids.withColumn("s", (col("id") % 4).cast("string"))
      val counts = Sampling.balancedSampleTargets(df, col("s"), col("id"),
          targets = Map("0" -> 0L, "1" -> 1000000L, "2" -> 50L), defaultTarget = 100L, seed = 6)
        .groupBy("s").count().as[(String, Long)].collect().toMap
      assert(!counts.contains("0")) // target 0: excluded entirely
      assert(counts("1") == 500L) // oversubscribed: whole stratum kept
      assert(math.abs(counts("2") - 50) < 30, s"got ${counts("2")}") // ~target
      assert(math.abs(counts("3") - 100) < 40, s"got ${counts("3")}") // ~default
    }
  }

  describe("Sampling.selectByTokenBudget") {
    it("keeps exactly the maximal order-prefix whose token total fits the budget") {
      val rows = (1L to 100L).map(i => (i, 1L + (i * 7) % 13))
      val df = rows.toDF("id", "tok").repartition(9)
      val budget = 150L
      val got = Sampling.selectByTokenBudget(df, col("id"), col("tok"), budget,
          numRanges = 4)
        .select("id", "cum_tok").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
      // naive reference prefix
      val cums = rows.scanLeft((0L, 0L)) { case ((_, acc), (id, t)) => (id, acc + t) }.drop(1)
      val expected = cums.takeWhile(_._2 <= budget)
      assert(got == expected)
      assert(got.nonEmpty && got.size < 100) // the cut is non-trivial
      // the next doc would have burst the budget (maximality)
      assert(cums(got.size)._2 > budget)
    }
  }

  describe("Sampling.reservoirPerKey") {
    it("rejects an input frame that already carries the reserved __rk column") {
      val df = ids.withColumn("__rk", lit(1))
      val e = intercept[IllegalArgumentException] {
        Sampling.reservoirPerKey(df, col("id") % 2, col("id"), n = 1)
      }
      assert(e.getMessage.contains("__rk"))
      val e2 = intercept[IllegalArgumentException] {
        Sampling.deterministicShuffle(ids.withColumn("__sh_h", lit(1)), col("id"))
      }
      assert(e2.getMessage.contains("__sh_h"))
    }

    it("returns exactly n per stratum, deterministically, fewer when small") {
      val df = ids.withColumn("s", (col("id") % 5).cast("string"))
        .unionByName(Seq((9999L, "tiny")).toDF("id", "s"))
      val out = Sampling.reservoirPerKey(df, col("s"), col("id"), n = 7, seed = 2)
      val counts = out.groupBy("s").count().as[(String, Long)].collect().toMap
      assert((0 to 4).forall(k => counts(k.toString) == 7))
      assert(counts("tiny") == 1)
      // stable across partitioning
      val again = Sampling.reservoirPerKey(df.repartition(11), col("s"), col("id"), n = 7, seed = 2)
      assert(out.select("id").as[Long].collect().toSet ==
        again.select("id").as[Long].collect().toSet)
    }

    it("plans a PARTIAL WindowGroupLimit below the exchange (the scale guarantee)") {
      // the constant rank cut must push a map-side top-n per stratum —
      // without it a hot stratum's full mass hits one reduce-side sort
      val plan = Sampling.reservoirPerKey(
          ids.withColumn("s", col("id") % 3), col("s"), col("id"), n = 5)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"))
      assert(plan.indexOf("Partial") > 0 &&
        plan.indexOf("Exchange") < plan.indexOf("Partial"))
    }
  }

  describe("Sampling.temperatureSample") {
    // 1600 / 320 / 80 rows: α=0.5 quotas flatten the 20:4:1 head-tail
    // ratio to 40:17.9:8.9 (√-proportional)
    val skewed = ids
      .filter(col("id") <= 2000)
      .withColumn("s", when(col("id") <= 1600, "big")
        .when(col("id") <= 1920, "mid").otherwise("rare"))

    it("quotas are sqrt-proportional: the tail is boosted, the head capped") {
      val counts = Sampling.temperatureSample(skewed, col("s"), col("id"), budget = 500)
        .groupBy("s").count().as[(String, Long)].collect().toMap
      val total = counts.values.sum
      assert(total <= 500 && total > 490, s"quota floors only lose slack: $counts")
      // proportional would give big 400/80/20; sqrt gives ~298/133/66
      assert(counts("big") < 320 && counts("rare") > 50, counts.toString)
      // exact: floor(500·s_l / Σ s_l) on s_l = floor(sqrt(n·10^6))
      val s = Map("big" -> 1600L, "mid" -> 320L, "rare" -> 80L)
        .view.mapValues(n => math.sqrt(n.toDouble * 1000000).toLong).toMap
      val tot = s.values.sum
      s.foreach { case (k, sl) => assert(counts(k) == 500 * sl / tot, k) }
    }

    it("selection is deterministic under partitioning and capped at stratum size") {
      val tiny = skewed.filter(col("s") =!= "big") // 400 rows, budget above sizes
      val all = Sampling.temperatureSample(tiny, col("s"), col("id"), budget = 4000)
        .groupBy("s").count().as[(String, Long)].collect().toMap
      assert(all == Map("mid" -> 320L, "rare" -> 80L), s"capped at n: $all")
      val a = Sampling.temperatureSample(skewed, col("s"), col("id"), budget = 500)
        .select("id").as[Long].collect().toSet
      val b = Sampling.temperatureSample(skewed.repartition(13), col("s"), col("id"), budget = 500)
        .select("id").as[Long].collect().toSet
      assert(a == b)
    }

    it("rejects reserved working columns") {
      val e = intercept[IllegalArgumentException] {
        Sampling.temperatureSample(skewed.withColumn("__ts_n", lit(1)),
          col("s"), col("id"), budget = 10)
      }
      assert(e.getMessage.contains("__ts_"))
    }
  }

  describe("Sampling.groupedSplit") {
    val rows = (1L to 3000L).toDF("id").withColumn("grp", col("id") % 97)

    it("no group ever straddles two splits, and rates land near weights") {
      val out = Sampling.groupedSplit(rows, col("grp"),
        Seq("train" -> 8, "val" -> 1, "test" -> 1))
      val perGroup = out.groupBy("grp")
        .agg(countDistinct(col("split")).as("ns"))
        .filter(col("ns") > 1).count()
      assert(perGroup == 0)
      val byLabel = out.groupBy("split").count()
        .as[(String, Long)].collect().toMap
      assert(byLabel.keySet.subsetOf(Set("train", "val", "test")))
      assert(byLabel("train") > 1800, byLabel.toString) // ~80% of 3000
    }

    it("assignment is the documented hash range, stable under growth") {
      val out = Sampling.groupedSplit(rows, col("grp"),
          Seq("train" -> 8, "val" -> 1, "test" -> 1))
        .select("grp", "split").distinct()
        .as[(Long, String)].collect().toMap
      out.foreach { case (g, label) =>
        val b = graft.functions.TextFns.hash60Value(g.toString) % 10
        val want = if (b < 8) "train" else if (b < 9) "val" else "test"
        assert(label == want, s"group $g: $label != $want")
      }
      // adding rows never moves an existing group
      val grown = Sampling.groupedSplit(
          (1L to 6000L).toDF("id").withColumn("grp", col("id") % 97),
          col("grp"), Seq("train" -> 8, "val" -> 1, "test" -> 1))
        .select("grp", "split").distinct()
        .as[(Long, String)].collect().toMap
      assert(grown == out)
    }
  }

  describe("Sampling.epochCappedMixture") {
    // two rows per stratum — the avail side is a real aggregate
    val mix = Seq(
      ("big", 400L, 1L), ("big", 600L, 1L), ("tiny", 4L, 5L),
      ("tiny", 6L, 5L), ("mid", 150L, 2L), ("mid", 50L, 2L))
      .toDF("src", "tok", "w")

    it("clamps at the epoch cap and re-flows surplus, conserving the budget") {
      // budget 1210·2 = 2420; fair shares ∝ (1,5,2) would give tiny
      // 1512 tokens = 151 epochs — the 2.5-epoch cap clamps it to 25,
      // and mid to 500; the rest flows to big (uncapped).
      val out = Sampling.epochCappedMixture(mix, col("src"), col("tok"),
          col("w"), budget = 2420L, maxEpochsMilli = 2500L)
        .as[(String, Long, Long, Boolean, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      assert(out("tiny")._4 && out("tiny")._5 == 25L && out("tiny")._6 == 2500L)
      assert(out("mid")._4 && out("mid")._5 == 500L)
      assert(!out("big")._4 && out("big")._5 == 2420L - 25L - 500L)
      assert(out.values.map(_._5).sum == 2420L)
    }

    it("all-capped mixtures allocate Σcap and report the shortfall via epochs") {
      val out = Sampling.epochCappedMixture(mix, col("src"), col("tok"),
          col("w"), budget = 100000L, maxEpochsMilli = 1000L)
        .as[(String, Long, Long, Boolean, Long, Long)].collect()
      assert(out.forall(_._4))
      assert(out.map(_._5).sum == 1210L) // Σcap = 1.0 epoch each
      assert(out.forall(_._6 == 1000L))
    }

    it("uncapped mixtures are exact largest-remainder proportional shares") {
      val out = Sampling.epochCappedMixture(mix, col("src"), col("tok"),
          col("w"), budget = 10L, maxEpochsMilli = 100000L)
        .as[(String, Long, Long, Boolean, Long, Long)].collect()
        .map(r => r._1 -> r._5).toMap
      // shares ∝ (1,5,2) of 10 → floors (1,6,2) + 1 remainder to the
      // largest fractional part (big: 10/8=1.25 rem 2; tiny: 50/8=6.25
      // rem 2; mid: 20/8=2.5 rem 4) → mid gets the extra
      assert(out == Map("big" -> 1L, "tiny" -> 6L, "mid" -> 3L))
      assert(out.values.sum == 10L)
    }
  }

  describe("Sampling.componentSafeSplit") {
    // chain 1-2-3, pair 10-11, singletons 20 and 21
    val rows = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)

    it("connected rows share a split; singletons hash their own id") {
      val out = Sampling.componentSafeSplit(rows, col("doc_id"), pairs, splits)
        .select("doc_id", "component", "split").as[(Long, Long, String)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(Set(1L, 2L, 3L).map(out(_)).size == 1 && out(1L)._1 == 1L)
      assert(out(10L) == out(11L) && out(10L)._1 == 10L)
      assert(out(20L)._1 == 20L && out(21L)._1 == 21L)
      // the split is groupedSplit's documented hash range on the component
      out.values.foreach { case (comp, split) =>
        val b = graft.functions.TextFns.hash60Value(comp.toString) % 100
        val expect = if (b < 80) "train" else if (b < 90) "val" else "test"
        assert(split == expect, s"component $comp")
      }
    }

    it("assignments are stable when an unrelated component joins the corpus") {
      val before = Sampling.componentSafeSplit(rows, col("doc_id"), pairs, splits)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      val grown = Sampling.componentSafeSplit(
        rows.unionByName(Seq(30L, 31L).toDF("doc_id")),
        col("doc_id"), pairs.unionByName(Seq((30L, 31L)).toDF("doc_a", "doc_b")), splits)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(before.forall { case (id, s) => grown(id) == s })
    }
  }

  describe("Sampling.stratifiedKFold") {
    val rows = (for (st <- Seq("a", "b"); i <- 0 until 13)
      yield (st, s"$st$i")).toDF("stratum", "id")

    it("fold sizes within a stratum differ by at most one, all rows covered") {
      val out = Sampling.stratifiedKFold(rows, col("stratum"), col("id"), 5)
      assert(out.count() == 26)
      val sizes = out.groupBy(col("stratum"), col("fold")).count()
        .groupBy(col("stratum"))
        .agg(max(col("count")).as("mx"), min(col("count")).as("mn"),
          sum(col("count")).as("tot"), count(lit(1)).as("nf"))
        .as[(String, Long, Long, Long, Long)].collect()
      // 13 rows into 5 folds: sizes {3,3,3,2,2} — spread exactly 1,
      // every fold non-empty, totals preserved
      assert(sizes.forall { case (_, mx, mn, tot, nf) =>
        mx - mn == 1 && tot == 13 && nf == 5 })
    }

    it("is deterministic and partitioning-invariant") {
      val a = Sampling.stratifiedKFold(rows, col("stratum"), col("id"), 5)
        .as[(String, String, Int)].collect().toSet
      val b = Sampling.stratifiedKFold(rows.repartition(7), col("stratum"), col("id"), 5)
        .as[(String, String, Int)].collect().toSet
      assert(a == b)
    }

    it("rejects k < 2") {
      intercept[IllegalArgumentException] {
        Sampling.stratifiedKFold(rows, col("stratum"), col("id"), 1)
      }
    }
  }
}
