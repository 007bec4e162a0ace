package graft.queries

import graft.SparkSpec

/** Hand-checked semantics for the critical-path DAG layering (q253) and
  * the functional-dependency audit (q254), driving the real entry
  * points over tiny synthetic tables where the answers are computable
  * by eye.
  */
class DagProfilingSpec extends SparkSpec {
  import spark.implicits._

  describe("DataOps.criticalPath (q253)") {
    it("layers a hand-built DAG by longest path, roots at level 0") {
      withTempDir { dir =>
        // parts 0..6; lineitem rows induce edges u -> 2u + s%2:
        // 1->2, 1->3, 2->4, 2->5, 3->6. Roots {0,1} (no incoming).
        // Levels: {0,1}->0, {2,3}->1, {4,5,6}->2.
        Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L).toDF("p_partkey")
          .repartition(1).write.mode("overwrite")
          .parquet(new java.io.File(dir, "part.parquet").toString)
        Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L), (3L, 0L))
          .toDF("l_partkey", "l_suppkey")
          .repartition(1).write.mode("overwrite")
          .parquet(new java.io.File(dir, "lineitem.parquet").toString)
        val r = DataOps.criticalPath(spark, dir.toString).collect()
          .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
        assert(r == Seq((0L, 2L, 1L), (1L, 2L, 5L), (2L, 3L, 15L)))
      }
    }
  }

  describe("Relational.fdAudit (q254)") {
    it("counts violations and the exact g3 repair size per candidate FD") {
      withTempDir { dir =>
        Seq((1L, "A", 10L, 100L), (1L, "A", 11L, 100L),
            (2L, "B", 10L, 101L), (2L, "R", 12L, 102L))
          .toDF("l_orderkey", "l_returnflag", "l_partkey", "l_suppkey")
          .repartition(1).write.mode("overwrite")
          .parquet(new java.io.File(dir, "lineitem.parquet").toString)
        Seq((1L, 7L, "1-URGENT"), (2L, 7L, "2-HIGH"), (3L, 8L, "1-URGENT"))
          .toDF("o_orderkey", "o_custkey", "o_orderpriority")
          .repartition(1).write.mode("overwrite")
          .parquet(new java.io.File(dir, "orders.parquet").toString)
        val r = Relational.fdAudit(spark, dir.toString).collect()
          .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
            x.getLong(4), x.getLong(5))).toSeq
        assert(r == Seq(
          ("li_orderkey_to_returnflag", 2L, 1L, 4L, 1L, 250000L),
          ("li_partkey_to_suppkey", 3L, 1L, 4L, 1L, 250000L),
          ("o_custkey_to_priority", 2L, 1L, 3L, 1L, 333333L),
          ("o_orderkey_to_custkey", 3L, 0L, 3L, 0L, 0L)))
      }
    }
  }
}
