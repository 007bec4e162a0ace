package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** Hand-checked arithmetic for the model-evaluation pair: exact AUC via
  * the Mann-Whitney pair statistic with tie correction (q251) and the
  * threshold-sweep confusion matrix with NULL-guarded ratios (q252).
  * Both tests drive the REAL query entry points over synthetic tables.
  */
class MlEvalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  describe("Relational.aucExact (q251)") {
    it("counts concordant and tied pairs exactly on a hand-computed set") {
      withTempDir { dir =>
        // positives (purchase) at cents {3, 3, 5}, negatives (click) at
        // {1, 3}: concordant pos>neg pairs = 4, tied = 2, P=3, N=2 →
        // AUC = (2·4 + 2) / (2·3·2) = 10/12 → 833333 ppm. user_ids copy
        // the cents so all three models see the same distribution.
        val rows = Seq(
          (1L, ts(1), 3L, "purchase", 0.03, "{}"),
          (2L, ts(2), 3L, "purchase", 0.03, "{}"),
          (3L, ts(3), 5L, "purchase", 0.05, "{}"),
          (4L, ts(4), 1L, "click", 0.01, "{}"),
          (5L, ts(5), 3L, "click", 0.03, "{}"))
        rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .repartition(1).write.mode("overwrite")
          .parquet(new java.io.File(dir, "events.parquet").toString)
        val r = Relational.aucExact(spark, dir.toString).collect()
          .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
            x.getLong(4), x.getLong(5)))
        assert(r.toSeq == Seq(
          ("m1_cents997", 3L, 2L, 4L, 2L, 833333L),
          ("m2_cents101", 3L, 2L, 4L, 2L, 833333L),
          ("m3_user31", 3L, 2L, 4L, 2L, 833333L)))
      }
    }
  }

  describe("Relational.classifierEval (q252)") {
    it("sweeps the confusion matrix with floor-divided ppm ratios") {
      withTempDir { dir =>
        // scores (n_chars % 100): en {95, 50}, fr {95, 5}.
        // τ=50: tp=2 fp=1 fn=0 tn=1 → precision 666666, recall 1000000,
        //       f1 = 2·2·1e6 // (4+1+0) = 800000.
        // τ=90: tp=1 fp=1 fn=1 tn=1 → 500000 / 500000 / 500000.
        Seq((1L, "a", "en", "s", 95L), (2L, "b", "en", "s", 50L),
            (3L, "c", "fr", "s", 95L), (4L, "d", "fr", "s", 5L))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .repartition(1).write.mode("overwrite")
          .parquet(new java.io.File(dir, "documents.parquet").toString)
        val r = Relational.classifierEval(spark, dir.toString).collect()
          .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
            x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7))).toSeq
        assert(r.length == 9)
        assert(r.find(_._1 == 50L).get ==
          ((50L, 2L, 1L, 0L, 1L, 666666L, 1000000L, 800000L)))
        assert(r.find(_._1 == 90L).get ==
          ((90L, 1L, 1L, 1L, 1L, 500000L, 500000L, 500000L)))
      }
    }

    it("yields NULL precision (not 0) when nothing is predicted positive") {
      withTempDir { dir =>
        Seq((1L, "a", "en", "s", 5L), (2L, "b", "fr", "s", 7L))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .repartition(1).write.mode("overwrite")
          .parquet(new java.io.File(dir, "documents.parquet").toString)
        val r = Relational.classifierEval(spark, dir.toString)
          .where("tau = 10").collect()
        assert(r.length == 1)
        assert(r.head.isNullAt(5), "precision must be NULL on empty prediction")
        assert(r.head.getLong(6) == 0L, "recall is 0, not NULL: positives exist")
      }
    }
  }
}
