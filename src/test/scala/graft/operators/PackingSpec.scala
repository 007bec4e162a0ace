package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sequence packing: hand-computed spans, boundary behavior, equivalence
  * of the two-phase scalable prefix sum with the naive global-window
  * formulation (under derived AND caller-supplied bucketing), and
  * manifest token conservation.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def offsetsOf(rows: Seq[(Long, Long)], budget: Long,
                        bucket: Option[org.apache.spark.sql.Column] = None,
                        numRanges: Int = 3): Map[Long, (Long, Long, Long, Long, Boolean)] =
    Packing.packOffsets(rows.toDF("id", "tok"), col("id"), col("tok"), budget,
        bucketExpr = bucket, numRanges = numRanges)
      .collect()
      .map(r => r.getAs[Long]("pack_id") ->
        ((r.getAs[Long]("start_off"), r.getAs[Long]("end_off"),
          r.getAs[Long]("first_seq"), r.getAs[Long]("last_seq"),
          r.getAs[Boolean]("split"))))
      .toMap

  describe("Packing.packOffsets") {
    it("assigns concat-and-chunk spans and split flags (hand-computed)") {
      // budget 10: [0,4) [4,10) [10,22)split [22,22)empty [22,29) [29,34)split
      val rows = Seq((1L, 4L), (2L, 6L), (3L, 12L), (4L, 0L), (5L, 7L), (6L, 5L))
      val got = offsetsOf(rows, budget = 10)
      assert(got(1L) == ((0L, 4L, 0L, 0L, false)))
      assert(got(2L) == ((4L, 10L, 0L, 0L, false))) // ends exactly at the cut
      assert(got(3L) == ((10L, 22L, 1L, 2L, true))) // crosses one cut
      assert(got(4L) == ((22L, 22L, 2L, 2L, false))) // zero-token doc: lands, no slot
      assert(got(5L) == ((22L, 29L, 2L, 2L, false)))
      assert(got(6L) == ((29L, 34L, 2L, 3L, true)))
    }

    it("a zero-token doc on an exact cut attaches to the preceding sequence (no phantom)") {
      val rows = Seq((1L, 10L), (2L, 0L))
      val got = offsetsOf(rows, budget = 10)
      // start_off 10 sits exactly on the cut; anchoring at 9 keeps the
      // doc in sequence 0 instead of opening an empty sequence 1
      assert(got(2L) == ((10L, 10L, 0L, 0L, false)))
      val manifest = Packing.packManifest(
        Packing.packOffsets(rows.toDF("id", "tok"), col("id"), col("tok"), budget = 10),
        budget = 10).collect()
      assert(manifest.map(_.getAs[Long]("seq")).toSeq == Seq(0L))
    }

    it("matches the naive global-window formulation with derived range buckets") {
      val rows = (1L to 200L).map(i => (i * 7 % 211, (i * i) % 13)) // shuffled ids, varied toks
      val df = rows.toDF("id", "tok")
      val fast = Packing.packOffsets(df, col("id"), col("tok"), budget = 17, numRanges = 5)
      val naive = Packing.packOffsetsGlobal(df, col("id"), col("tok"), budget = 17)
      assert(fast.orderBy("pack_id").collect().toSeq ==
        naive.orderBy("pack_id").collect().toSeq)
    }

    it("matches the naive formulation with a caller-supplied monotone bucketExpr") {
      val rows = (0L until 150L).map(i => (i, i % 9))
      val df = rows.toDF("id", "tok")
      val fast = Packing.packOffsets(df, col("id"), col("tok"), budget = 23,
        bucketExpr = Some(col("id") / 40)) // monotone coarse buckets
      val naive = Packing.packOffsetsGlobal(df, col("id"), col("tok"), budget = 23)
      assert(fast.orderBy("pack_id").collect().toSeq ==
        naive.orderBy("pack_id").collect().toSeq)
    }
  }

  describe("Packing.globalRowNumber and Sampling.deterministicShuffle") {
    it("assigns the same ranks as a naive global row_number and carries all columns") {
      val rows = (1L to 120L).map(i => (i * 31 % 127, s"payload-$i"))
      val df = rows.toDF("id", "payload").repartition(7) // scrambled physical layout
      val got = Packing.globalRowNumber(df, col("id"), numRanges = 4)
        .orderBy("pos").collect()
      val expected = rows.sortBy(_._1)
      assert(got.map(_.getAs[Long]("pos")).toSeq == (1L to 120L))
      assert(got.map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSeq == expected)
    }

    it("rejects an input frame carrying reserved __gr_* working columns") {
      val df = Seq((1L, 2L)).toDF("id", "__gr_ord")
      val e = intercept[IllegalArgumentException] {
        Packing.globalRowNumber(df, col("id"))
      }
      assert(e.getMessage.contains("__gr_ord"))
    }

    it("rejects an input frame already carrying the output posName") {
      val df = Seq((1L, 9L)).toDF("id", "pos")
      val e = intercept[IllegalArgumentException] {
        Packing.globalRowNumber(df, col("id"))
      }
      assert(e.getMessage.contains("'pos'"))
    }

    it("stratumRowNumber ≡ naive per-stratum window, including a 90%-skewed and a null stratum") {
      // one hot stratum holds ~90% of rows (the scale-killer shape), plus
      // small strata and a NULL stratum — ranks must match the naive
      // PARTITION BY window exactly
      val rows = (1L to 200L).map { i =>
        val st = if (i <= 180) "hot" else if (i <= 190) "cold" else null
        (i, st, i * 37 % 211)
      }
      val df = rows.toDF("id", "st", "ord").repartition(9)
      val got = Packing.stratumRowNumber(df, col("st"),
          struct(col("ord"), col("id")), numRanges = 8)
        .select("id", "pos").as[(Long, Long)].collect().toMap
      val naive = df.withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("st"))
            .orderBy(col("ord"), col("id"))).cast("long"))
        .select("id", "pos").as[(Long, Long)].collect().toMap
      assert(got == naive)
      // the hot stratum genuinely spans multiple range buckets (the
      // whole point — no single-task sort)
      val buckets = df.withColumn("__x", struct(col("ord"), col("id")))
        .repartitionByRange(8, col("st"), col("__x"))
        .withColumn("b", spark_partition_id())
        .filter(col("st") === "hot").select("b").distinct().count()
      assert(buckets > 1)
    }

    it("stratumRowNumber rejects reserved __sr_* columns and a clashing posName") {
      val e1 = intercept[IllegalArgumentException] {
        Packing.stratumRowNumber(Seq((1L, 2L)).toDF("id", "__sr_st"),
          col("id"), col("id"))
      }
      assert(e1.getMessage.contains("__sr_st"))
      val e2 = intercept[IllegalArgumentException] {
        Packing.stratumRowNumber(Seq((1L, 9L)).toDF("id", "pos"),
          col("id"), col("id"))
      }
      assert(e2.getMessage.contains("'pos'"))
    }

    it("deterministicShuffle is a partitioning-invariant permutation in seeded-hash order") {
      val rows = (1L to 80L).map(i => (i, s"doc-$i"))
      def positions(parts: Int): Seq[(Long, Long)] =
        Sampling.deterministicShuffle(rows.toDF("id", "text").repartition(parts),
            col("id"), seed = 7, numRanges = 3)
          .select("id", "shuffle_pos").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
      val a = positions(2)
      assert(a.map(_._2).sorted == (1L to 80L)) // a permutation
      assert(a == positions(13)) // invariant to physical partitioning
      assert(a.map(_._2) != (1L to 80L)) // and not the identity order
    }
  }

  describe("Packing.runningTotal") {
    it("matches a naive global window sum, carries all columns, invariant to partitioning") {
      val rows = (1L to 130L).map(i => (i * 29 % 131, 1L + i % 17, s"p-$i"))
      val df = rows.toDF("id", "v", "payload")
      def totals(parts: Int): Seq[(Long, Long, String, Long)] =
        Packing.runningTotal(df.repartition(parts), col("id"), col("v"),
            totalName = "cum", numRanges = 5)
          .select("id", "v", "payload", "cum").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
          .toSeq.sortBy(_._1)
      val got = totals(7)
      // naive reference: running sum in id order
      val expected = rows.sortBy(_._1)
        .scanLeft((0L, 0L, "", 0L)) { case ((_, _, _, acc), (id, v, p)) => (id, v, p, acc + v) }
        .drop(1)
      assert(got == expected)
      assert(got == totals(2)) // partitioning-invariant
      // explicit monotone bucketExpr path agrees too
      val bucketed = Packing.runningTotal(df, col("id"), col("v"), totalName = "cum",
          bucketExpr = Some(col("id") / 25), numRanges = 5)
        .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
      assert(bucketed == expected.map(e => (e._1, e._4)))
    }

    it("rejects reserved __rt_* columns and a totalName collision") {
      val e = intercept[IllegalArgumentException] {
        Packing.runningTotal(Seq((1L, 2L)).toDF("id", "__rt_val"), col("id"), col("id"))
      }
      assert(e.getMessage.contains("__rt_val"))
      val e2 = intercept[IllegalArgumentException] {
        Packing.runningTotal(Seq((1L, 2L)).toDF("id", "cum"), col("id"), col("id"),
          totalName = "cum")
      }
      assert(e2.getMessage.contains("'cum'"))
    }
  }

  describe("Packing.packManifest") {
    it("conserves tokens across sequences and fills every sequence to budget except the tail") {
      val rows = (1L to 60L).map(i => (i, 1L + (i * 13) % 29))
      val df = rows.toDF("id", "tok")
      val budget = 50L
      val offsets = Packing.packOffsets(df, col("id"), col("tok"), budget, numRanges = 4)
      val manifest = Packing.packManifest(offsets, budget).orderBy("seq").collect()

      val total = rows.map(_._2).sum
      // every sequence 0..last present exactly once
      assert(manifest.map(_.getAs[Long]("seq")).toSeq == (0L to (total - 1) / budget))
      // token conservation, and full budget everywhere but the tail
      assert(manifest.map(_.getAs[Long]("n_tok")).sum == total)
      assert(manifest.dropRight(1).forall(_.getAs[Long]("n_tok") == budget))
      // doc ranges tile in order: first_doc of seq k+1 == last_doc of seq k
      // when a doc is split across the cut, else the next doc
      val pairs = manifest.sliding(2).toSeq
      pairs.foreach { case Array(a, b) =>
        assert(b.getAs[Long]("first_doc") >= a.getAs[Long]("last_doc"))
      }
    }
  }
}
