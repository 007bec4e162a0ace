package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DeletionSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
    .toDF("id", "payload")
  private val derived = Seq((1L, 10), (1L, 11), (2L, 20), (4L, 40), (4L, 41))
    .toDF("doc", "part")
  // duplicate tombstone entry for 1 must not double-count
  private val tombs = Seq(1L, 1L, 4L, 99L).toDF("del_id")

  describe("Deletion.purge") {
    it("removes exactly the tombstoned rows") {
      val r = Deletion.purge(base, col("id"), tombs, col("del_id"))
        .select("id").as[Long].collect().toSet
      assert(r == Set(2L, 3L))
    }
  }

  describe("Deletion.propagateAudit") {
    it("accounts per artifact and proves zero survivors") {
      val audit = Deletion.propagateAudit(
          Seq(("base", base, col("id")), ("derived", derived, col("doc"))),
          tombs, col("del_id"))
        .orderBy("artifact")
        .as[(String, Long, Long, Long, Long)].collect()
      // base: 4 rows, ids 1 and 4 purged (99 hits nothing)
      assert(audit(0) == (("base", 4L, 2L, 2L, 0L)))
      // derived: 5 rows, doc 1 (2 rows) + doc 4 (2 rows) purged
      assert(audit(1) == (("derived", 5L, 4L, 1L, 0L)))
    }

    it("broadcasts the tombstones: the artifacts never shuffle") {
      val plan = Deletion.propagateAudit(
          Seq(("base", base, col("id"))), tombs, col("del_id"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
    }
  }
}
