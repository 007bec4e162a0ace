package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sliding-window chunking: hand-computed windows (overlap, disjoint,
  * short tail, single-token doc) and within-doc reassembly. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, window: Int, stride: Int): Seq[(Long, Long, Long, String)] =
    Chunking.slidingWindows(Seq((1L, text)).toDF("id", "text"),
        col("id"), col("text"), window, stride)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("n_tok"), r.getAs[String]("chunk")))
      .toSeq

  describe("Chunking.slidingWindows") {
    it("produces overlapping windows with a short tail") {
      assert(chunksOf("a b c d e", window = 3, stride = 2) == Seq(
        (0L, 0L, 3L, "a b c"),
        (1L, 2L, 3L, "c d e"),
        (2L, 4L, 1L, "e")))
    }

    it("stride == window gives disjoint blocks that reassemble the doc") {
      val got = chunksOf("a b c d e f g", window = 3, stride = 3)
      assert(got.map(_._4).mkString(" ") == "a b c d e f g")
      assert(got.map(_._3) == Seq(3L, 3L, 1L))
    }

    it("a doc shorter than the window yields exactly one full-doc chunk") {
      assert(chunksOf("only", window = 16, stride = 12) == Seq((0L, 0L, 1L, "only")))
    }

    it("is total: a null-text doc behaves like empty text and still yields one chunk") {
      val got = Chunking.slidingWindows(
          Seq((1L, Option.empty[String]), (2L, Some("a b"))).toDF("id", "text"),
          col("id"), col("text"), window = 4, stride = 4)
        .orderBy("doc_id", "chunk_idx").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("chunk")))
      assert(got.toSeq == Seq((1L, ""), (2L, "a b")))
    }
  }
}
