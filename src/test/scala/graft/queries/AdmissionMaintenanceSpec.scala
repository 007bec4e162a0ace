package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-checked edge semantics for the round-10 additions the driver
  * oracle exercises only on organic data: the token-bucket admission
  * recurrence (q223), the EWMA lag algebra (q226), retraction-to-zero
  * group deletion in view maintenance (q224), and BFS level/unreached
  * semantics (q222). Each test writes a synthetic table into a temp
  * dir and drives the REAL query entry point over it.
  */
class AdmissionMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:$s%02d")

  private def writeEvents(dir: java.io.File,
      rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1)
      .write.mode("overwrite").parquet(new java.io.File(dir, "events.parquet").toString)

  describe("StreamingQueries.rateLimiter (q223)") {
    it("admits the burst head, denies past capacity, refills by elapsed time") {
      withTempDir { dir =>
        // user 1: seven events inside one minute — cap 5 admits exactly 5;
        // then one event 10 h later — refill clamps at cap, admitted.
        // user 2: four events exactly 1 h apart — refill covers each, all admitted.
        val u1burst = (0 until 7).map(i =>
          (i.toLong, ts(1, 0, i), 1L, "click", 1.0, "{}"))
        val u1later = Seq((7L, ts(11), 1L, "click", 1.0, "{}"))
        val u2 = (0 until 4).map(i =>
          (100L + i, ts(1 + i), 2L, "view", 1.0, "{}"))
        writeEvents(dir, u1burst ++ u1later ++ u2)
        val full = StreamingQueries.rateLimiter(spark, dir.toString)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        assert(full.toSeq.sortBy(_._1) ==
          Seq((1L, 6L, 2L), (2L, 4L, 0L)))
      }
    }
  }

  describe("Relational.ewmaSmoothing (q226)") {
    it("matches the hand-computed 2^(15-i) lag sum on a short history") {
      withTempDir { dir =>
        // cents 100, 200, 400 in time order: last EWMA =
        // 400·2^15 + 200·2^14 + 100·2^13 (older lags are zero)
        writeEvents(dir, Seq(
          (1L, ts(1), 7L, "click", 1.00, "{}"),
          (2L, ts(2), 7L, "click", 2.00, "{}"),
          (3L, ts(3), 7L, "click", 4.00, "{}")))
        val r = Relational.ewmaSmoothing(spark, dir.toString).collect()
        assert(r.length == 1)
        val expected = 400L * (1L << 15) + 200L * (1L << 14) + 100L * (1L << 13)
        assert(r.head.getLong(0) == 7L)
        assert(r.head.getLong(1) == 3L)
        assert(r.head.getLong(2) == expected)
      }
    }
  }

  describe("Relational.viewMaintenance (q224)") {
    it("drops a group whose rows are all retracted, keeps partial groups") {
      withTempDir { dir =>
        // event_id 3: base (3%10<8) AND deleted (3%7==3) — sole row of
        // its (day, type) group, so the group must VANISH.
        // event_id 4: base, kept. event_id 8: insert delta, kept.
        writeEvents(dir, Seq(
          (3L, ts(1), 1L, "solo_deleted", 1.00, "{}"),
          (4L, ts(1), 1L, "kept", 2.00, "{}"),
          (8L, ts(1), 1L, "kept", 3.00, "{}")))
        val r = Relational.viewMaintenance(spark, dir.toString)
          .select("event_type", "n", "sum_cents")
          .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
        assert(r == Seq(("kept", 2L, 500L)))
      }
    }
  }

  describe("Relational.timezoneBattery (q235)") {
    it("counts EDT vs EST across the DST boundary and the IST half-hour") {
      withTempDir { dir =>
        writeEvents(dir, Seq(
          (1L, Timestamp.valueOf("2024-01-15 12:00:00"), 1L, "click", 1.0, "{}"),
          (2L, Timestamp.valueOf("2024-07-15 12:00:00"), 1L, "click", 1.0, "{}")))
        val r = Relational.timezoneBattery(spark, dir.toString).collect()
        assert(r.length == 1)
        // one EST (−5) winter row, one EDT (−4) summer row, both +5:30 IST
        assert(r.head.getLong(2) == 1L) // n_edt
        assert(r.head.getLong(3) == 1L) // n_est
        assert(r.head.getLong(4) == 2L) // n_ist_530
      }
    }
  }

  describe("Relational.apportionment (q234)") {
    it("breaks remainder ties by stratum key and sums exactly to budget") {
      withTempDir { dir =>
        // three equal strata: base 333 each, one leftover seat — equal
        // remainders, so the FIRST (lang, source) key takes it
        Seq((1L, "t", "aa", "s1", 1L), (2L, "t", "bb", "s2", 1L),
            (3L, "t", "cc", "s3", 1L))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .repartition(1)
          .write.mode("overwrite")
          .parquet(new java.io.File(dir, "documents.parquet").toString)
        val r = Relational.apportionment(spark, dir.toString)
          .collect().map(x => (x.getString(0), x.getLong(3))).toSeq
        assert(r == Seq(("aa", 334L), ("bb", 333L), ("cc", 333L)))
        assert(r.map(_._2).sum == 1000L)
      }
    }
  }

  describe("Relational.pennyAllocation (q244)") {
    it("conserves the odd cent on an equal-weight three-item order") {
      withTempDir { dir =>
        // total 100 cents over weights 1/1/1: floor quota 33 each,
        // leftover cent to line 1 — allocated must equal total exactly
        Seq((1L, 1, 0.01), (1L, 2, 0.01), (1L, 3, 0.01))
          .toDF("l_orderkey", "l_linenumber", "l_extendedprice")
          .repartition(1)
          .write.mode("overwrite")
          .parquet(new java.io.File(dir, "lineitem.parquet").toString)
        Seq((1L, 1.00))
          .toDF("o_orderkey", "o_totalprice")
          .repartition(1)
          .write.mode("overwrite")
          .parquet(new java.io.File(dir, "orders.parquet").toString)
        val r = Relational.pennyAllocation(spark, dir.toString).collect().head
        assert(r.getLong(0) == 1L) // n_orders
        assert(r.getLong(1) == 1L) // n_conserved
        assert(r.getLong(2) == 100L) // sum_allocated
        assert(r.getLong(3) == 100L) // sum_totals
      }
    }
  }

  describe("DataOps.bfsDistances (q222)") {
    it("matches hand-checked levels on the n=5 formula graph") {
      withTempDir { dir =>
        // n=5: j-edges are u → (u+2)%5 and u → (u+4)%5 (j=0 is the
        // dropped self-loop). Seed doc 0 ⇒ dist 0:{0}, 1:{2,4}, 2:{1,3}.
        (0L until 5L).map(i => (i, s"text $i", "en", "src", 6L))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .repartition(1)
          .write.mode("overwrite")
          .parquet(new java.io.File(dir, "documents.parquet").toString)
        val r = DataOps.bfsDistances(spark, dir.toString)
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
        assert(r == Seq((0L, 0L), (1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L)))
      }
    }
  }
}
