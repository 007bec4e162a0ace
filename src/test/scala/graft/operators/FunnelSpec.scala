package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private val events = Seq(
    // user 1: full funnel in order
    (1L, t(1), "view"), (1L, t(2), "click"), (1L, t(3), "purchase"),
    // user 2: click BEFORE view → funnel stalls at view
    (2L, t(1), "click"), (2L, t(2), "view"),
    // user 3: several candidates → earliest valid ones picked
    (3L, t(1), "view"), (3L, t(2), "view"), (3L, t(3), "click"),
    (3L, t(4), "click"), (3L, t(5), "purchase"),
    // user 4: purchase exactly AT the click ts does not count (strict >)
    (4L, t(1), "view"), (4L, t(2), "click"), (4L, t(2), "purchase"),
    // user 5: never enters the funnel
    (5L, t(1), "error")
  ).toDF("user_id", "ts", "event_type")

  private def run() =
    Funnel.conversion(events, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp], Long)]
      .collect()

  describe("Funnel.conversion") {
    it("orders strictly: a stage only counts after the previous stage's ts") {
      val r = run()
      assert(r(0) == ((1L, Some(t(1)), Some(t(2)), Some(t(3)), 3L)))
      assert(r(1) == ((2L, Some(t(2)), None, None, 1L))) // click@1 < view@2
      assert(r(3) == ((4L, Some(t(1)), Some(t(2)), None, 2L))) // tie is not after
    }

    it("picks the earliest valid event per stage") {
      assert(run()(2) == ((3L, Some(t(1)), Some(t(3)), Some(t(5)), 3L)))
    }

    it("is total over users: depth 0 for users never entering") {
      assert(run()(4) == ((5L, None, None, None, 0L)))
    }

    it("is invariant under repartitioning") {
      val a = run().toSet
      val b = Funnel.conversion(events.repartition(7), col("user_id"), col("ts"),
          col("event_type"), Seq("view", "click", "purchase"))
        .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp], Long)]
        .collect().toSet
      assert(a == b)
    }
  }
}
