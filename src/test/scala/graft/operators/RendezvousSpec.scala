package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFns

class RendezvousSpec extends SparkSpec {
  import spark.implicits._

  private val shards = Seq("a", "b", "c", "d")

  private def jvmAssign(key: Long, ss: Seq[String]): String =
    ss.map(sh => (TextFns.hash60Value(s"$sh:$key"), sh)).max._2

  describe("Rendezvous.assign") {
    it("matches the JVM argmax replay for every key") {
      val out = (0L until 200L).toDF("k")
        .withColumn("s", Rendezvous.assign(col("k"), shards))
        .as[(Long, String)].collect().toMap
      (0L until 200L).foreach(k => assert(out(k) == jvmAssign(k, shards), s"key $k"))
    }

    it("adding a shard only moves keys ONTO the new shard, ~1/(N+1) of them") {
      val grown = shards :+ "e"
      val moves = (0L until 2000L).map { k =>
        (jvmAssign(k, shards), jvmAssign(k, grown))
      }
      val moved = moves.filter { case (old, nu) => old != nu }
      assert(moved.forall(_._2 == "e")) // minimal disruption: all moves land on e
      assert(moved.size > 250 && moved.size < 550) // ≈ 2000/5 = 400
    }

    it("rejects duplicate or empty shard lists") {
      intercept[IllegalArgumentException](Rendezvous.assign(col("k"), Seq()))
      intercept[IllegalArgumentException](Rendezvous.assign(col("k"), Seq("a", "a")))
    }
  }

  describe("Rendezvous.ringAssign") {
    val V = 4
    /** JVM replay of the clockwise-successor pick. */
    def jvmRing(key: Long, ns: Seq[String]): String = {
      val h = TextFns.hash60Value(key.toString)
      val pts = for (n <- ns; v <- 0 until V)
        yield (TextFns.hash60Value(s"$n#$v"), n)
      val above = pts.filter(_._1 > h)
      (if (above.nonEmpty) above.min else pts.min)._2
    }

    it("matches the JVM clockwise-successor replay for every key") {
      val out = (0L until 200L).toDF("k")
        .withColumn("s", Rendezvous.ringAssign(col("k"), shards, V))
        .as[(Long, String)].collect().toMap
      (0L until 200L).foreach(k => assert(out(k) == jvmRing(k, shards), s"key $k"))
    }

    it("adding a node only moves keys ONTO the new node") {
      val grown = shards :+ "e"
      val moves = (0L until 2000L).map(k => (jvmRing(k, shards), jvmRing(k, grown)))
      val moved = moves.filter { case (old, nu) => old != nu }
      assert(moved.nonEmpty && moved.forall(_._2 == "e"))
      // ring arcs are noisier than HRW at V=4 — only bound loosely
      assert(moved.size < 1200)
    }

    it("rejects bad node lists and vnode counts") {
      intercept[IllegalArgumentException](Rendezvous.ringAssign(col("k"), Seq(), V))
      intercept[IllegalArgumentException](Rendezvous.ringAssign(col("k"), shards, 0))
    }
  }
}
