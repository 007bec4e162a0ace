package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CooccurSpec extends SparkSpec {
  import spark.implicits._

  describe("Cooccur.pairWeights") {
    it("weights pairs 60/d within the window, canonicalized and clipped") {
      val docs = Seq("a b c d").toDF("text")
      val out = Cooccur.pairWeights(docs, col("text"), window = 3)
        .as[(String, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(out == Map(
        ("a", "b") -> (60L, 1L), ("a", "c") -> (30L, 1L), ("a", "d") -> (20L, 1L),
        ("b", "c") -> (60L, 1L), ("b", "d") -> (30L, 1L), ("c", "d") -> (60L, 1L)))
    }

    it("merges symmetric occurrences and drops self-pairs") {
      // "a b a": (a,b) at d=1 twice (orders b-a and a-b), (a,a) dropped
      val out = Cooccur.pairWeights(Seq("a b a").toDF("text"), col("text"), window = 3)
        .as[(String, String, Long, Long)].collect().toSet
      assert(out == Set(("a", "b", 120L, 2L)))
    }

    it("short and empty docs contribute nothing; window=1 is adjacency only") {
      val docs = Seq("solo", "", "x y z").toDF("text")
      val out = Cooccur.pairWeights(docs, col("text"), window = 1)
        .as[(String, String, Long, Long)].collect().toSet
      assert(out == Set(("x", "y", 60L, 1L), ("y", "z", 60L, 1L)))
    }

    it("aggregation is partitioning-invariant and the floor is exact") {
      val docs = (1 to 40).map(i => s"w$i common w${i % 3} common").toDF("text")
      val a = Cooccur.pairWeights(docs, col("text"), window = 2, minWeight60 = 100L)
        .as[(String, String, Long, Long)].collect().toSet
      val b = Cooccur.pairWeights(docs.repartition(7), col("text"), window = 2,
          minWeight60 = 100L)
        .as[(String, String, Long, Long)].collect().toSet
      assert(a == b && a.nonEmpty)
      assert(a.forall(_._3 >= 100L))
    }
  }
}
