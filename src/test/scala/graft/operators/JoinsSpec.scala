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
}
