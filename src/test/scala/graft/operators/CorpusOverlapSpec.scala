package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusOverlapSpec extends SparkSpec {
  import spark.implicits._

  private val shards = Seq(
    // a and b are identical corpora; c is disjoint from both
    ("a", 1L, "one two three four five six"),
    ("a", 2L, "seven eight nine ten eleven"),
    ("b", 3L, "one two three four five six"),
    ("b", 4L, "seven eight nine ten eleven"),
    ("c", 5L, "red green blue cyan magenta yellow")
  ).toDF("src", "doc_id", "text")

  describe("CorpusOverlap.overlapMatrix") {
    it("identical shards score full signature agreement and jacc 1; disjoint score 0") {
      val m = CorpusOverlap.overlapMatrix(shards, col("src"), col("text"), numPerms = 16)
        .as[(String, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(m(("a", "b")) == ((16L, 1.0)))
      assert(m(("a", "c")) == ((0L, 0.0)))
      assert(m(("b", "c")) == ((0L, 0.0)))
    }

    it("emits every unordered pair exactly once, including zero-overlap pairs") {
      val pairs = CorpusOverlap.overlapMatrix(shards, col("src"), col("text"))
        .select("src_a", "src_b").as[(String, String)].collect().toSet
      assert(pairs == Set(("a", "b"), ("a", "c"), ("b", "c")))
    }

    it("signature matches estimate partial overlap in the right ballpark") {
      // d shares half its docs' shingles with a
      val mixed = shards.union(Seq(
        ("d", 6L, "one two three four five six"),
        ("d", 7L, "gold silver bronze iron lead")).toDF("src", "doc_id", "text"))
      val row = CorpusOverlap.overlapMatrix(mixed, col("src"), col("text"), numPerms = 16)
        .filter(col("src_a") === "a" && col("src_b") === "d")
        .as[(String, String, Long, Double)].head()
      assert(row._4 > 0.2 && row._4 < 0.7, s"exact jacc: $row")
      assert(row._3 > 0 && row._3 < 16, s"sig matches: $row")
    }

    it("the signature is the set-union MinHash: mergeable across doc partitionings") {
      val a = CorpusOverlap.overlapMatrix(shards, col("src"), col("text"))
        .orderBy("src_a", "src_b").collect().toSeq
      val b = CorpusOverlap.overlapMatrix(shards.repartition(7), col("src"), col("text"))
        .orderBy("src_a", "src_b").collect().toSeq
      assert(a == b)
    }
  }
}
