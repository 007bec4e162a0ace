package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta")).toDF("id", "text")
  private val newSnap = Seq(
    (1L, "alpha"),            // unchanged
    (2L, "beta prime"),       // changed
    (4L, "delta"),            // unchanged
    (9L, "epsilon")           // added; 3 removed
  ).toDF("id", "text")

  describe("SnapshotDiff") {
    it("classifies every id in either snapshot") {
      val d = SnapshotDiff.diff(oldSnap, newSnap, col("id"), col("text"))
        .select("id", "status").as[(Long, String)].collect().toMap
      assert(d == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
        4L -> "unchanged", 9L -> "added"))
    }

    it("changes drops the unchanged rows and keeps both fingerprints") {
      val c = SnapshotDiff.changes(oldSnap, newSnap, col("id"), col("text"))
      assert(c.columns.toSeq == Seq("id", "status", "old_fp", "new_fp"))
      val rows = c.orderBy("id").as[(Long, String, Option[Long], Option[Long])].collect()
      assert(rows.map(r => (r._1, r._2)).toSeq ==
        Seq((2L, "changed"), (3L, "removed"), (9L, "added")))
      assert(rows(0)._3.isDefined && rows(0)._4.isDefined) // changed: both sides
      assert(rows(1)._4.isEmpty)                           // removed: no new fp
      assert(rows(2)._3.isEmpty)                           // added: no old fp
    }

    it("shuffles fingerprints, not payloads: the join inputs project id+hash only") {
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val join = SnapshotDiff.diff(oldSnap, newSnap, col("id"), col("text"))
        .queryExecution.optimizedPlan.collect { case j: Join => j }.head
      join.children.foreach { side =>
        val names = side.output.map(_.name)
        assert(names.forall(n => n == "id" || n.endsWith("_fp")),
          s"payload column leaked into the join: $names")
      }
    }
  }
}
