package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  describe("SchemaDrift.audit") {
    val oldDf = Seq((1L, Some("a"), 10), (2L, None, 20), (3L, Some("a"), 30))
      .toDF("id", "name", "size")
    val newDf = Seq((1L, "a", 10L, "x"), (2L, "b", 10L, "y"))
      .toDF("id", "name", "size", "tag")

    it("classifies added/removed/common and flags type changes") {
      val out = audit().map(r => r._1 -> r).toMap
      assert(out("tag")._2 == "added" && out("id")._2 == "common")
      assert(out("size")._3, "int -> bigint must flag type_changed")
      assert(!out("id")._3 && !out("tag")._3)
      assert(out("size")._4.contains("int") && out("size")._5.contains("bigint"))
    }

    it("computes exact per-side rows, nulls, and NDV") {
      val out = audit().map(r => r._1 -> r).toMap
      assert(out("name")._6 == (Some(3L), Some(1L), Some(1L))) // old: 3 rows, 1 null, ndv {a}
      assert(out("name")._7 == (Some(2L), Some(0L), Some(2L)))
      assert(out("tag")._6 == (None, None, None)) // absent side is all-NULL
      assert(out("size")._7 == (Some(2L), Some(0L), Some(1L))) // new size ndv {10}
    }

    def audit(): Seq[(String, String, Boolean, Option[String], Option[String],
        (Option[Long], Option[Long], Option[Long]),
        (Option[Long], Option[Long], Option[Long]))] =
      SchemaDrift.audit(oldDf, newDf)
        .as[(String, String, Boolean, Option[String], Option[String],
          Option[Long], Option[Long], Option[Long],
          Option[Long], Option[Long], Option[Long])]
        .collect().toSeq
        .map(r => (r._1, r._2, r._3, r._4, r._5, (r._6, r._7, r._8), (r._9, r._10, r._11)))
  }
}
