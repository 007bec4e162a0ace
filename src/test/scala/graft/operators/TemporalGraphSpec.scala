package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TemporalGraphSpec extends SparkSpec {
  import spark.implicits._

  describe("TemporalGraph.earliestArrival") {
    it("respects time: a statically-reachable node behind a backward edge is NOT reached") {
      // s(0) -5-> a, a -3-> b: static reach includes b, temporal does not
      // (the a->b edge departs at 3 < arrival-at-a 5); c is reached via a
      // later edge, and d shows a longer-but-time-increasing path winning
      val edges = Seq((0L, 1L, 5L), (1L, 2L, 3L), (1L, 3L, 7L), (3L, 4L, 9L))
        .toDF("src", "dst", "t")
      val out = TemporalGraph.earliestArrival(edges,
          Seq(0L).toDF("node"), maxHops = 4)
        .as[(Long, Long)].collect().toMap
      assert(out == Map(0L -> 0L, 1L -> 5L, 3L -> 7L, 4L -> 9L))
    }

    it("keeps the minimum arrival when multiple time-valid paths reach a node") {
      val edges = Seq((0L, 1L, 2L), (0L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "t")
      val out = TemporalGraph.earliestArrival(edges, Seq(0L).toDF("node"), maxHops = 3)
        .as[(Long, Long)].collect().toMap
      assert(out(1L) == 1L) // via 0->2(t=1)->1(t=1), beating the direct t=2
    }

    it("dominance pruning ≡ brute-force path enumeration on a random graph") {
      val rnd = new scala.util.Random(11)
      val n = 30
      val edgeSeq = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
        rnd.nextInt(20).toLong)).filter(e => e._1 != e._2).distinct
      val hops = 5
      // TRUE brute force: all (node, arrival) pairs of <=hops-edge
      // time-respecting paths (the oracle's level enumeration, unpruned)
      val bySrc = edgeSeq.groupBy(_._1)
      var level = Set(0L -> 0L)
      val all = scala.collection.mutable.Set(0L -> 0L)
      for (_ <- 1 to hops) {
        level = level.flatMap { case (u, arr) =>
          bySrc.getOrElse(u, Nil).collect { case (_, v, t) if t >= arr => v -> t }
        }
        all ++= level
      }
      val reach = all.groupBy(_._1).map { case (v, ps) => v -> ps.map(_._2).min }
      val out = TemporalGraph.earliestArrival(edgeSeq.toDF("src", "dst", "t"),
          Seq(0L).toDF("node"), maxHops = hops)
        .as[(Long, Long)].collect().toMap
      assert(out == reach)
    }
  }
}
