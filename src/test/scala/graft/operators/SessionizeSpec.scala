package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  private val events = Seq(
    // user 1: two sessions split by a 30-min boundary gap (>= gap → new)
    (1L, 10L, t("10:00:00")), (1L, 11L, t("10:10:00")),
    (1L, 12L, t("10:40:00")), // exactly 30 min after previous → NEW session
    (1L, 13L, t("10:41:00")),
    // user 2: one long session of chained sub-gap events
    (2L, 20L, t("09:00:00")), (2L, 21L, t("09:29:00")), (2L, 22L, t("09:58:00"))
  ).toDF("user_id", "event_id", "ts")

  describe("Sessionize.assign") {
    it("starts a new session at gaps >= the threshold (streaming session_window rule)") {
      val r = Sessionize.assign(events, col("user_id"), col("ts"), col("event_id"), 1800)
        .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
      assert(r == Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 13L -> 2L,
        20L -> 1L, 21L -> 1L, 22L -> 1L))
    }

    it("keeps one exchange: the flag and running-sum windows share the sort") {
      val plan = Sessionize.assign(events, col("user_id"), col("ts"), col("event_id"), 1800)
        .queryExecution.executedPlan.toString
      assert(plan.split("Exchange").length - 1 == 1, plan)
    }
  }

  describe("Sessionize.stats") {
    it("aggregates per session with correct bounds") {
      val r = Sessionize.stats(events, col("user_id"), col("ts"), col("event_id"), 1800)
        .orderBy("key", "session_seq")
        .as[(Long, Long, Timestamp, Timestamp, Long)].collect()
      assert(r(0) == ((1L, 1L, t("10:00:00"), t("10:10:00"), 2L)))
      assert(r(1) == ((1L, 2L, t("10:40:00"), t("10:41:00"), 2L)))
      assert(r(2) == ((2L, 1L, t("09:00:00"), t("09:58:00"), 3L)))
    }

    it("is invariant under repartitioning") {
      val a = Sessionize.stats(events, col("user_id"), col("ts"), col("event_id"), 1800)
        .collect().map(_.toSeq).toSet
      val b = Sessionize.stats(events.repartition(5), col("user_id"), col("ts"),
        col("event_id"), 1800).collect().map(_.toSeq).toSet
      assert(a == b)
    }
  }
}
