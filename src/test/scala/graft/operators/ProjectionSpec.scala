package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFns

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  describe("Projection.signProject") {
    it("matches a JVM replay of the exact integer arithmetic") {
      val vecs = Seq(
        (1L, Array(0.5f, -1.25f, 2.0f)),
        (2L, Array(0.0f, 0.1f, -0.1f)))
      val out = Projection.signProject(vecs.toDF("vec_id", "embedding"),
          col("vec_id"), col("embedding"), inDim = 3, outDim = 4)
        .select("vec_id", "proj", "norm2")
        .as[(Long, Seq[Long], Long)].collect().map(r => r._1 -> r).toMap
      vecs.foreach { case (id, e) =>
        val fp = e.map(x => math.round(x.toDouble * 1000))
        val expect = (0 until 4).map(j =>
          fp.indices.map(i => Projection.signOf(j, i) * fp(i)).sum)
        assert(out(id)._2 == expect, s"vec $id")
        assert(out(id)._3 == expect.map(p => p * p).sum)
      }
    }

    it("sign matrix is the public hash formula and roughly balanced") {
      val signs = for (j <- 0 until 16; i <- 0 until 64) yield Projection.signOf(j, i)
      assert(signs.forall(s => s == 1L || s == -1L))
      val plus = signs.count(_ == 1L)
      assert(plus > 400 && plus < 624) // ~half of 1024, the JL balance property
      assert(Projection.signOf(0, 0) ==
        (if (TextFns.hash60Value("0:0") % 2 == 0) 1L else -1L))
    }

    it("is partitioning-invariant (zero-shuffle per-row projection)") {
      val df = (0 until 50).map(i =>
        (i.toLong, Array.tabulate(8)(d => ((i * 7 + d) % 13 - 6) / 3.0f)))
        .toDF("vec_id", "embedding")
      val a = Projection.signProject(df, col("vec_id"), col("embedding"), 8, 4)
        .as[(Long, Seq[Long], Long)].collect().toSet
      val b = Projection.signProject(df.repartition(11), col("vec_id"), col("embedding"), 8, 4)
        .as[(Long, Seq[Long], Long)].collect().toSet
      assert(a == b && a.size == 50)
    }
  }
}
