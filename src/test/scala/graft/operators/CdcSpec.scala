package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFns

class CdcSpec extends SparkSpec {
  import spark.implicits._

  /** JVM replay of the boundary rule for expectations. */
  private def boundaries(toks: Seq[String], w: Int, d: Int): Seq[Int] =
    ((w until toks.size).filter { j =>
      TextFns.hash60Value(toks.slice(j - w, j).mkString(" ")) % d == 0
    } :+ toks.size).toSeq

  describe("Cdc.chunks") {
    it("places boundaries exactly where the window-hash rule says") {
      val toks = "a b c d e f g h i j k l".split(" ").toSeq
      val df = Seq((1L, toks.mkString(" "))).toDF("id", "text")
      val got = Cdc.chunks(df, col("id"), col("text"), w = 2, modulus = 2)
        .orderBy("chunk_idx")
        .select("start_tok", "n_tok").as[(Long, Long)].collect().toSeq
      val bs = boundaries(toks, 2, 2)
      val expected = bs.zip(1 +: bs.dropRight(1).map(_ + 1))
        .map { case (e, s) => (s.toLong, (e - s + 1).toLong) }
      assert(bs.size > 1, s"fixture produced no interior boundary: $bs")
      assert(got == expected)
    }

    it("chunks partition the document: contiguous, total, order-preserving") {
      val df = Seq((1L, (1 to 200).map(i => s"t${i % 37}").mkString(" ")))
        .toDF("id", "text")
      val got = Cdc.chunks(df, col("id"), col("text"), w = 3, modulus = 4)
        .orderBy("chunk_idx").select("start_tok", "n_tok")
        .as[(Long, Long)].collect().toSeq
      val rebuilt = got.scanLeft(1L) { case (nxt, (s, n)) =>
        assert(s == nxt, s"gap: chunk starts at $s, expected $nxt"); s + n
      }
      assert(rebuilt.last == 201L) // covers exactly tokens 1..200
    }

    it("is total on short and empty docs (single whole-doc chunk)") {
      val df = Seq((1L, "a b"), (2L, "")).toDF("id", "text")
      val got = Cdc.chunks(df, col("id"), col("text"), w = 4, modulus = 2)
        .select("cdc_id", "chunk_idx", "start_tok", "n_tok")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 1L, 1L, 2L), (2L, 1L, 1L, 1L)))
    }

    it("fingerprints a shared passage identically at different offsets") {
      val block = (1 to 40).map(i => f"blk$i%02d").mkString(" ")
      val a = s"p1 p2 p3 $block tail1"
      val b = s"q1 q2 q3 q4 q5 q6 q7 q8 q9 $block other stuff"
      val df = Seq((1L, a), (2L, b)).toDF("id", "text")
      val shared = Cdc.sharedChunks(Cdc.chunks(df, col("id"), col("text"), w = 3, modulus = 4))
      val dup = shared.filter(col("n_docs") === 2)
      // interior block chunks re-sync despite the 6-token offset shift
      assert(dup.count() >= 2, "expected shared interior chunks")
      // every shared fingerprint appears in BOTH docs
      val perDoc = dup.groupBy("fp").agg(countDistinct("cdc_id").as("nd"))
        .filter(col("nd") =!= 2).count()
      assert(perDoc == 0)
    }
  }
}
