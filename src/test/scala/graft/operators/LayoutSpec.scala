package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  describe("Layout.writeClustered") {
    it("produces files with DISJOINT key ranges, sorted within, data intact") {
      withTempDir { dir =>
        val out = s"${dir.getAbsolutePath}/clustered"
        // shuffled keys so clustering actually has to move rows
        val df = scala.util.Random.shuffle((1L to 4000L).toList).toDF("k")
          .withColumn("v", col("k") * 2)
        Layout.writeClustered(df, out, Seq("k"), numRanges = 4, maxRecordsPerFile = 1500)
        // ranges from the parquet FOOTERS are pairwise disjoint — the
        // property a stats-aware scan prunes with
        val ranges = Layout.fileRanges(spark, out, "k").sortBy(_._1)
        assert(ranges.size >= 4, s"expected >=4 files, got ${ranges.size}")
        ranges.sliding(2).foreach {
          case Seq((_, aMax), (bMin, _)) =>
            assert(aMax < bMin, s"overlapping file ranges: $ranges")
          case _ =>
        }
        // file size bound held (1500 records max + range split)
        val back = spark.read.parquet(out)
        assert(back.count() == 4000)
        assert(back.agg(sum(col("v"))).head().getLong(0) == (1L to 4000L).map(_ * 2).sum)
        // the point predicate itself is pushed down to the scan (the
        // row-group skip path) — not just the implied IsNotNull
        val plan = back.filter(col("k") === 42L).queryExecution.executedPlan.toString
        assert(plan.contains("EqualTo(k,42)"), plan)
      }
    }

    it("duplicate keys may share a file boundary but ranges never interleave") {
      withTempDir { dir =>
        val out = s"${dir.getAbsolutePath}/dupes"
        // 40 copies of each key: file-size splits land INSIDE key runs
        val df = scala.util.Random.shuffle(
          (1L to 100L).flatMap(k => Seq.fill(40)(k)).toList).toDF("k")
        Layout.writeClustered(df, out, Seq("k"), numRanges = 2, maxRecordsPerFile = 300)
        val ranges = Layout.fileRanges(spark, out, "k").sortBy(r => (r._1, r._2))
        assert(ranges.size > 4)
        ranges.sliding(2).foreach {
          case Seq((_, aMax), (bMin, _)) =>
            assert(aMax <= bMin, s"interleaving file ranges: $ranges")
          case _ =>
        }
        // the boundary-sharing case actually occurs on this corpus
        assert(ranges.sliding(2).exists {
          case Seq((_, aMax), (bMin, _)) => aMax == bMin
          case _ => false
        })
        assert(spark.read.parquet(out).count() == 4000)
      }
    }
  }

  describe("Layout.zOrderValue / writeZOrdered") {
    it("interleaves bits per the Morton contract and clamps out-of-range inputs") {
      val df = Seq(
        (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (255L, 255L),
        (-7L, 3L), (999L, 2L) // negative → clamp 0; ≥2^bits → clamp max
      ).toDF("x", "y")
      val got = df.select(Layout.zOrderValue(col("x"), col("y"), bitsPer = 8).as("z"))
        .as[Long].collect().toSeq
      def morton(x: Long, y: Long): Long = {
        val cx = math.min(math.max(x, 0L), 255L)
        val cy = math.min(math.max(y, 0L), 255L)
        (0 until 8).map(b => (((cx >> b) & 1L) << (2 * b)) | (((cy >> b) & 1L) << (2 * b + 1))).sum
      }
      val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (255L, 255L),
        (-7L, 3L), (999L, 2L)).map { case (x, y) => morton(x, y) }
      assert(got == want)
      // known fixed points of the curve
      assert(morton(3L, 5L) == 39L) // x bits at even, y bits at odd positions
      assert(morton(255L, 255L) == 65535L)
    }

    it("writeZOrdered produces files with DISJOINT zval ranges — 2-D box pruning") {
      withTempDir { dir =>
        val out = s"${dir.getAbsolutePath}/zorder"
        val rnd = new scala.util.Random(7)
        val df = (1 to 8000).map(_ => (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
          .toDF("x", "y").withColumn("v", col("x") + col("y"))
        Layout.writeZOrdered(df, out, "x", "y", numRanges = 4, bitsPer = 8,
          maxRecordsPerFile = 2500)
        // footer ranges over the INTERLEAVED key are pairwise disjoint,
        // so every 2-D box (a contiguous set of z tiles) prunes files
        val ranges = Layout.fileRanges(spark, out, "zval").sortBy(_._1)
        assert(ranges.size >= 4, s"expected >=4 files, got ${ranges.size}")
        ranges.sliding(2).foreach {
          case Seq((_, aMax), (bMin, _)) =>
            assert(aMax <= bMin, s"interleaved file ranges: $ranges")
          case _ =>
        }
        // data intact, zval consistent with the column expression
        val back = spark.read.parquet(out)
        assert(back.count() == 8000)
        assert(back.filter(
          Layout.zOrderValue(col("x"), col("y"), 8) =!= col("zval")).count() == 0)
      }
    }

    it("zOrderValueN interleaves d=3 bits at positions 3b+j and clamps per dim") {
      val df = Seq(
        (0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
        (3L, 5L, 6L), (63L, 63L, 63L), (-2L, 7L, 99L)).toDF("x", "y", "w")
      val got = df.select(
        Layout.zOrderValueN(Seq(col("x"), col("y"), col("w")), bitsPer = 6).as("z"))
        .as[Long].collect().toSeq
      def morton3(x: Long, y: Long, w: Long): Long = {
        def c(v: Long) = math.min(math.max(v, 0L), 63L)
        (0 until 6).map(b =>
          (((c(x) >> b) & 1L) << (3 * b)) |
            (((c(y) >> b) & 1L) << (3 * b + 1)) |
            (((c(w) >> b) & 1L) << (3 * b + 2))).sum
      }
      val want = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
        (3L, 5L, 6L), (63L, 63L, 63L), (-2L, 7L, 99L))
        .map { case (x, y, w) => morton3(x, y, w) }
      assert(got == want)
      // unit bits land at positions 0 / 1 / 2
      assert(want(1) == 1L && want(2) == 2L && want(3) == 4L)
      assert(want(5) == (1L << 18) - 1)
      // d=2 keeps the classic layout byte-identical to zOrderValue
      val two = Seq((3L, 5L)).toDF("x", "y")
      assert(two.select(Layout.zOrderValueN(Seq(col("x"), col("y")), 8)).head().getLong(0)
        == two.select(Layout.zOrderValue(col("x"), col("y"), 8)).head().getLong(0))
    }

    it("writeZOrderedN(d=3) produces files with DISJOINT zval ranges — 3-D box pruning") {
      withTempDir { dir =>
        val out = s"${dir.getAbsolutePath}/zorder3"
        val rnd = new scala.util.Random(11)
        val df = (1 to 8000)
          .map(_ => (rnd.nextInt(64).toLong, rnd.nextInt(64).toLong, rnd.nextInt(64).toLong))
          .toDF("x", "y", "w").withColumn("v", col("x") + col("y") + col("w"))
        Layout.writeZOrderedN(df, out, Seq("x", "y", "w"), numRanges = 4,
          bitsPer = 6, maxRecordsPerFile = 2500)
        val ranges = Layout.fileRanges(spark, out, "zval").sortBy(_._1)
        assert(ranges.size >= 4, s"expected >=4 files, got ${ranges.size}")
        ranges.sliding(2).foreach {
          case Seq((_, aMax), (bMin, _)) =>
            assert(aMax <= bMin, s"interleaved file ranges: $ranges")
          case _ =>
        }
        val back = spark.read.parquet(out)
        assert(back.count() == 8000)
        assert(back.filter(
          Layout.zOrderValueN(Seq(col("x"), col("y"), col("w")), 6) =!= col("zval"))
          .count() == 0)
      }
    }
  }

  describe("Layout.hilbertValue / writeHilbert") {
    it("matches the order-1 curve and is a bijection with ADJACENT consecutive cells") {
      // order-1 goldens: U-shape (0,0)→(0,1)→(1,1)→(1,0)
      val o1 = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
        .select(Layout.hilbertValue(col("x"), col("y"), bitsPer = 1).as("h"))
        .as[Long].collect().toSeq
      assert(o1 == Seq(0L, 1L, 2L, 3L))
      // bits=4: all 256 cells — d is a bijection onto [0, 256) and the
      // DEFINING Hilbert property holds: consecutive indices sit in
      // Manhattan-adjacent cells (Morton fails this at quadrant jumps)
      val cells = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
        .toDF("x", "y")
      val got = cells
        .select(col("x"), col("y"), Layout.hilbertValue(col("x"), col("y"), 4).as("h"))
        .as[(Long, Long, Long)].collect()
      assert(got.map(_._3).sorted.toSeq == (0L until 256L).toSeq)
      val byD = got.sortBy(_._3)
      byD.sliding(2).foreach {
        case Array((x1, y1, _), (x2, y2, _)) =>
          assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
            s"non-adjacent step ($x1,$y1)→($x2,$y2)")
        case _ =>
      }
      // clamping matches the z-order contract
      val cl = Seq((-7L, 3L), (999L, 2L)).toDF("x", "y")
        .select(Layout.hilbertValue(col("x"), col("y"), 8).as("h"))
        .as[Long].collect().toSeq
      val ref = Seq((0L, 3L), (255L, 2L)).toDF("x", "y")
        .select(Layout.hilbertValue(col("x"), col("y"), 8).as("h"))
        .as[Long].collect().toSeq
      assert(cl == ref)
    }

    it("writeHilbert produces files with DISJOINT hval ranges") {
      withTempDir { dir =>
        val out = s"${dir.getAbsolutePath}/hilbert"
        val rnd = new scala.util.Random(11)
        val df = (1 to 8000).map(_ => (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
          .toDF("x", "y").withColumn("v", col("x") + col("y"))
        Layout.writeHilbert(df, out, "x", "y", numRanges = 4, bitsPer = 8,
          maxRecordsPerFile = 2500)
        val ranges = Layout.fileRanges(spark, out, "hval").sortBy(_._1)
        assert(ranges.size >= 4, s"expected >=4 files, got ${ranges.size}")
        ranges.sliding(2).foreach {
          case Seq((_, aMax), (bMin, _)) =>
            assert(aMax <= bMin, s"hilbert file ranges: $ranges")
          case _ =>
        }
        val back = spark.read.parquet(out)
        assert(back.count() == 8000)
        assert(back.filter(
          Layout.hilbertValue(col("x"), col("y"), 8) =!= col("hval")).count() == 0)
      }
    }
  }

  describe("Layout.upsert") {
    val base = Seq((1L, "one", 10), (2L, "two", 20), (3L, "three", 30))
      .toDF("k", "txt", "v")

    it("updates win their key, untouched rows carry over, new keys append") {
      val updates = Seq((2L, "two-v2", 21), (9L, "nine", 90)).toDF("k", "txt", "v")
      val got = Layout.upsert(base, updates, Seq("k"))
        .orderBy("k").as[(Long, String, Int)].collect().toSeq
      assert(got == Seq((1L, "one", 10), (2L, "two-v2", 21),
        (3L, "three", 30), (9L, "nine", 90)))
    }

    it("is the identity on an empty update batch") {
      val empty = base.limit(0)
      assert(Layout.upsert(base, empty, Seq("k")).orderBy("k")
        .as[(Long, String, Int)].collect().toSeq ==
        base.orderBy("k").as[(Long, String, Int)].collect().toSeq)
    }

    it("supports composite keys") {
      val b2 = Seq((1L, "a", 1), (1L, "b", 2)).toDF("k1", "k2", "v")
      val u2 = Seq((1L, "b", 99)).toDF("k1", "k2", "v")
      val got = Layout.upsert(b2, u2, Seq("k1", "k2"))
        .orderBy("k1", "k2").as[(Long, String, Int)].collect().toSeq
      assert(got == Seq((1L, "a", 1), (1L, "b", 99)))
    }

    it("fails the job on a duplicate update key instead of emitting dupes") {
      val dup = Seq((2L, "x", 1), (2L, "y", 2)).toDF("k", "txt", "v")
      val ex = intercept[Exception] {
        Layout.upsert(base, dup, Seq("k")).collect()
      }
      assert(ex.getMessage.contains("duplicate update key") ||
        Option(ex.getCause).exists(_.getMessage.contains("duplicate update key")),
        s"unexpected failure: $ex")
    }
  }

  describe("Layout.upsertPartitioned") {
    it("rewrites ONLY buckets containing update keys; untouched buckets' files are physically identical") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/snap"
        val bucket = pmod(col("k"), lit(8L))
        val base = (0L until 400L).map(k => (k, s"v$k")).toDF("k", "txt")
        Layout.writeBucketed(base, snap, bucket)
        val before = Layout.bucketFileSignatures(spark, snap)
        assert(before.keySet == (0 until 8).toSet)
        // update keys hit buckets {1, 5} only (k mod 8)
        val updates = Seq((9L, "nine-v2"), (13L, "thirteen-v2"), (401L, "new"))
          .toDF("k", "txt")
        val touched = Layout.upsertPartitioned(
          spark, snap, updates, Seq("k"), bucket)
        assert(touched == Seq(1, 5), s"touched $touched")
        val after = Layout.bucketFileSignatures(spark, snap)
        // the 6 untouched buckets: same file names, lengths, mtimes
        (before.keySet -- touched).foreach { b =>
          assert(before(b) == after(b), s"untouched bucket $b rewritten")
        }
        // touched buckets really were rewritten (fresh part files)
        touched.foreach { b =>
          assert(before(b) != after(b), s"touched bucket $b unchanged")
        }
        // content = upsert semantics: replaced keys, carried base, new key
        val got = spark.read.parquet(snap).drop("__bucket")
          .as[(Long, String)].collect().toMap
        assert(got.size == 401)
        assert(got(9L) == "nine-v2" && got(13L) == "thirteen-v2" && got(401L) == "new")
        assert(got(8L) == "v8" && got(0L) == "v0")
      }
    }

    it("an empty update batch touches nothing") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/snap"
        val bucket = pmod(col("k"), lit(4L))
        Layout.writeBucketed((0L until 40L).map(k => (k, k * 2)).toDF("k", "v"), snap, bucket)
        val before = Layout.bucketFileSignatures(spark, snap)
        val touched = Layout.upsertPartitioned(
          spark, snap, Seq.empty[(Long, Long)].toDF("k", "v"), Seq("k"), bucket)
        assert(touched.isEmpty)
        assert(Layout.bucketFileSignatures(spark, snap) == before)
      }
    }

    it("propagates the duplicate-update-key guard") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/snap"
        val bucket = pmod(col("k"), lit(4L))
        Layout.writeBucketed((0L until 40L).map(k => (k, k * 2)).toDF("k", "v"), snap, bucket)
        val dup = Seq((3L, 1L), (3L, 2L)).toDF("k", "v")
        val ex = intercept[Exception] {
          Layout.upsertPartitioned(spark, snap, dup, Seq("k"), bucket)
        }
        assert(ex.getMessage.contains("duplicate update key") ||
          Option(ex.getCause).exists(_.getMessage.contains("duplicate update key")),
          s"unexpected failure: $ex")
      }
    }

    it("the touched-bucket base read prunes at the PARTITION level (no untouched-bucket I/O)") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/snap"
        val bucket = pmod(col("k"), lit(8L))
        Layout.writeBucketed((0L until 400L).map(k => (k, s"v$k")).toDF("k", "txt"), snap, bucket)
        // the exact read shape upsertPartitioned issues for touched {1, 5}
        val q = spark.read.parquet(snap)
          .filter(col("__bucket").isin(Seq(1, 5).map(Integer.valueOf): _*))
        val scan = q.queryExecution.executedPlan
          .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.head
        assert(scan.partitionFilters.nonEmpty, scan.toString)
        assert(scan.metadata("PartitionFilters").contains("__bucket"), scan.metadata)
        assert(scan.selectedPartitions.partitionCount == 2,
          s"read ${scan.selectedPartitions.partitionCount} partitions — untouched buckets were opened")
      }
    }

    it("deletePartitioned purges only tombstoned buckets; a fully-emptied bucket's directory disappears") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/snap"
        val bucket = pmod(col("k"), lit(4L))
        Layout.writeBucketed((0L until 40L).map(k => (k, s"v$k")).toDF("k", "txt"), snap, bucket)
        val before = Layout.bucketFileSignatures(spark, snap)
        // tombstones: ALL of bucket 1 (k ≡ 1 mod 4) + two keys of bucket 2
        val tombs = ((0L until 40L).filter(_ % 4 == 1) ++ Seq(2L, 6L)).toDF("k")
        val touched = Layout.deletePartitioned(spark, snap, tombs, Seq("k"), bucket)
        assert(touched == Seq(1, 2), s"touched $touched")
        val after = Layout.bucketFileSignatures(spark, snap)
        // bucket 1 died entirely: its directory is gone
        assert(!after.contains(1))
        // buckets 0 and 3 physically identical
        Seq(0, 3).foreach(b => assert(before(b) == after(b), s"bucket $b rewritten"))
        val got = spark.read.parquet(snap).drop("__bucket")
          .as[(Long, String)].collect().toMap
        assert(got.size == 28) // 40 − 10 (bucket 1) − 2
        assert(!got.contains(2L) && !got.contains(6L) && !got.contains(1L))
        assert(got(10L) == "v10" && got(0L) == "v0")
      }
    }

    it("recovers a merge that crashed mid-commit: torn swaps complete, never tear the snapshot") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/snap"
        val bucket = pmod(col("k"), lit(4L))
        Layout.writeBucketed((0L until 40L).map(k => (k, s"v$k")).toDF("k", "txt"), snap, bucket)
        // construct the torn state a crash between swaps leaves behind:
        // stage carries NEW generations for buckets {1, 2}, the manifest
        // names both, and bucket 1's swap already happened (its staged
        // dir is gone, the live dir holds the new rows) while bucket 2's
        // did not
        val stage = s"${snap}__upsert_stage"
        val newGen = Seq((1L, "one-v2"), (5L, "five-v2"), (2L, "two-v2"), (6L, "six-v2"))
          .toDF("k", "txt").withColumn("__bucket", bucket.cast("int"))
        newGen.write.partitionBy("__bucket").parquet(stage)
        val fs = new org.apache.hadoop.fs.Path(snap)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // "crash" after bucket 1's swap completed
        fs.delete(new org.apache.hadoop.fs.Path(s"$snap/__bucket=1"), true)
        assert(fs.rename(new org.apache.hadoop.fs.Path(s"$stage/__bucket=1"),
          new org.apache.hadoop.fs.Path(s"$snap/__bucket=1")))
        val mf = new org.apache.hadoop.fs.Path(s"${snap}__upsert_commit")
        val out = fs.create(mf, true)
        try out.write("1\n2".getBytes("UTF-8")) finally out.close()
        // torn right now: bucket 1 is new-generation, bucket 2 still old
        assert(Layout.recoverPendingCommit(spark, snap))
        val got = spark.read.parquet(snap).drop("__bucket")
          .as[(Long, String)].collect().toMap
        // both manifest buckets carry the new generation; the rest intact
        assert(got(1L) == "one-v2" && got(5L) == "five-v2")
        assert(got(2L) == "two-v2" && got(6L) == "six-v2")
        assert(got.size == 24) // buckets 1,2 replaced by 2 rows each; 0,3 keep 10 each
        assert(got(0L) == "v0" && got(3L) == "v3")
        // recovery is terminal: manifest + stage gone, second call a no-op
        assert(!fs.exists(mf))
        assert(!Layout.recoverPendingCommit(spark, snap))
        // and a normal merge on the recovered snapshot behaves
        val touched = Layout.upsertPartitioned(spark, snap,
          Seq((3L, "three-v2")).toDF("k", "txt"), Seq("k"), bucket)
        assert(touched == Seq(3))
      }
    }

    it("a purge that crashed mid-commit completes on recovery: emptied buckets die from the manifest alone (ADVICE r9)") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/snap"
        val bucket = pmod(col("k"), lit(4L))
        Layout.writeBucketed((0L until 40L).map(k => (k, s"v$k")).toDF("k", "txt"), snap, bucket)
        // torn purge state: bucket 2's survivors staged (swap pending),
        // bucket 1 fully emptied — manifest records BOTH, nothing ran yet
        val stage = s"${snap}__upsert_stage"
        Seq((10L, "v10"), (14L, "v14")).toDF("k", "txt")
          .withColumn("__bucket", bucket.cast("int"))
          .write.partitionBy("__bucket").parquet(stage)
        val fs = new org.apache.hadoop.fs.Path(snap)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val mf = new org.apache.hadoop.fs.Path(s"${snap}__upsert_commit")
        val out = fs.create(mf, true)
        try out.write("2\nD1".getBytes("UTF-8")) finally out.close()
        assert(Layout.recoverPendingCommit(spark, snap))
        val after = Layout.bucketFileSignatures(spark, snap)
        assert(!after.contains(1), "emptied bucket survived the crash window")
        val got = spark.read.parquet(snap).drop("__bucket")
          .as[(Long, String)].collect().toMap
        assert(got.size == 22) // 40 − 10 (bucket 1 purged) − 8 (bucket 2 → 2 survivors)
        assert(!got.contains(1L) && !got.contains(2L) && got(10L) == "v10")
        assert(!fs.exists(mf) && !Layout.recoverPendingCommit(spark, snap))
      }
    }

    it("a held merge lock fails a second writer fast; breakLock clears a crashed holder (ADVICE r9)") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/snap"
        val bucket = pmod(col("k"), lit(4L))
        Layout.writeBucketed((0L until 40L).map(k => (k, s"v$k")).toDF("k", "txt"), snap, bucket)
        // simulate a crashed (or live) writer's lock
        val fs = new org.apache.hadoop.fs.Path(snap)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val lock = new org.apache.hadoop.fs.Path(s"${snap}__upsert_lock")
        val out = fs.create(lock, false)
        try out.write("someone-else".getBytes("UTF-8")) finally out.close()
        val upd = Seq((1L, "one-v2")).toDF("k", "txt")
        val ex = intercept[IllegalStateException] {
          Layout.upsertPartitioned(spark, snap, upd, Seq("k"), bucket)
        }
        assert(ex.getMessage.contains("single-writer") &&
          ex.getMessage.contains("someone-else"), ex.getMessage)
        intercept[IllegalStateException] {
          Layout.deletePartitioned(spark, snap, Seq(1L).toDF("k"), Seq("k"), bucket)
        }
        assert(Layout.breakLock(spark, snap))
        assert(Layout.upsertPartitioned(spark, snap, upd, Seq("k"), bucket) == Seq(1))
        // the lock never outlives the merge
        assert(!fs.exists(lock))
      }
    }

    it("default hash bucketing is deterministic and scatter-bounded by the batch key count") {
      val b1 = Layout.bucketOf(Seq("k"), 1024)
      val ids = (0L until 50L).toDF("k").select(b1.as("b"))
      val again = (0L until 50L).toDF("k").select(b1.as("b"))
      assert(ids.collect().map(_.getInt(0)).toSeq == again.collect().map(_.getInt(0)).toSeq)
      // 50 keys can never touch more than 50 of the 1024 buckets
      assert(ids.distinct().count() <= 50)
    }
  }

  describe("Layout.upsertVersioned / readAsOf / vacuumVersions") {
    it("every committed version reads back exactly, with snapshot isolation across later merges") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/vsnap"
        val bucket = pmod(col("k"), lit(4L))
        def readMap(v: Long) = Layout.readAsOf(spark, snap, v)
          .select(col("k"), col("txt")).as[(Long, String)].collect().toMap
        // v1: initialize
        val v1 = Layout.upsertVersioned(spark, snap,
          (0L until 40L).map(k => (k, s"v$k")).toDF("k", "txt"), Seq("k"), bucket)
        assert(v1 == 1L)
        // v2: replace key 5, add key 41 (buckets 1 only)
        val v2 = Layout.upsertVersioned(spark, snap,
          Seq((5L, "five-v2"), (41L, "new")).toDF("k", "txt"), Seq("k"), bucket)
        assert(v2 == 2L)
        val asOf2 = readMap(2L)
        // v3: replace key 5 again
        val v3 = Layout.upsertVersioned(spark, snap,
          Seq((5L, "five-v3")).toDF("k", "txt"), Seq("k"), bucket)
        assert(v3 == 3L && Layout.listVersions(spark, snap) == Seq(1L, 2L, 3L))
        // every version reads back as its own committed snapshot
        val m1 = readMap(1L)
        assert(m1.size == 40 && m1(5L) == "v5" && !m1.contains(41L))
        val m2 = readMap(2L)
        assert(m2.size == 41 && m2(5L) == "five-v2" && m2(41L) == "new")
        assert(m2 == asOf2) // v2's read is unchanged by the v3 commit
        val m3 = readMap(3L)
        assert(m3.size == 41 && m3(5L) == "five-v3" && m3(0L) == "v0")
        // an empty batch commits nothing
        assert(Layout.upsertVersioned(spark, snap,
          Seq.empty[(Long, String)].toDF("k", "txt"), Seq("k"), bucket) == 3L)
        assert(Layout.listVersions(spark, snap) == Seq(1L, 2L, 3L))
      }
    }

    it("vacuumVersions retains the newest versions and deletes unreferenced generations") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/vsnap"
        val bucket = pmod(col("k"), lit(4L))
        Layout.upsertVersioned(spark, snap,
          (0L until 40L).map(k => (k, s"v$k")).toDF("k", "txt"), Seq("k"), bucket)
        Layout.upsertVersioned(spark, snap,
          Seq((5L, "five-v2")).toDF("k", "txt"), Seq("k"), bucket)
        Layout.upsertVersioned(spark, snap,
          Seq((6L, "six-v3")).toDF("k", "txt"), Seq("k"), bucket)
        val deleted = Layout.vacuumVersions(spark, snap, retainLast = 2)
        // v1's manifest goes; bucket 1's generation-1 dir (superseded in
        // v2) and bucket 2's generation... only gens no retained manifest
        // references are deletable — bucket 1 gen 1 is the one v2+v3
        // both superseded
        assert(deleted.contains("v00000001.manifest"))
        assert(deleted.exists(_.matches("g0+1_b1")), deleted.toString)
        // retained versions still read exactly
        val m2 = Layout.readAsOf(spark, snap, 2L)
          .select(col("k"), col("txt")).as[(Long, String)].collect().toMap
        assert(m2(5L) == "five-v2" && m2(6L) == "v6" && m2.size == 40)
        val m3 = Layout.readAsOf(spark, snap, 3L)
          .select(col("k"), col("txt")).as[(Long, String)].collect().toMap
        assert(m3(5L) == "five-v2" && m3(6L) == "six-v3")
        // the vacuumed version is gone, loudly
        val ex = intercept[IllegalArgumentException] {
          Layout.readAsOf(spark, snap, 1L)
        }
        assert(ex.getMessage.contains("vacuumed or never committed"))
      }
    }

    it("negative buckets (signed % bucketExpr) commit, read, AND vacuum") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/vsnap"
        val bucket = col("k") % 4 // signed: k = -3 → bucket -3
        Layout.upsertVersioned(spark, snap,
          Seq((-3L, "neg"), (2L, "pos")).toDF("k", "txt"), Seq("k"), bucket)
        Layout.upsertVersioned(spark, snap,
          Seq((-3L, "neg-v2")).toDF("k", "txt"), Seq("k"), bucket)
        val m2 = Layout.readAsOf(spark, snap, 2L)
          .select(col("k"), col("txt")).as[(Long, String)].collect().toMap
        assert(m2 == Map(-3L -> "neg-v2", 2L -> "pos"))
        // bucket -3's superseded generation 1 must vacuum like any other
        val deleted = Layout.vacuumVersions(spark, snap, retainLast = 1)
        assert(deleted.exists(_.matches("g0+1_b-3")), deleted.toString)
      }
    }

    it("a NULL bucket value fails the contract loudly, not with an opaque NPE") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/vsnap"
        val ex = intercept[IllegalArgumentException] {
          Layout.upsertVersioned(spark, snap,
            Seq((java.lang.Long.valueOf(1L), "a"),
              (null.asInstanceOf[java.lang.Long], "b")).toDF("k", "txt"),
            Seq("k"), col("k") % 4)
        }
        assert(ex.getMessage.contains("NULL bucket"))
      }
    }
  }

  describe("Layout.readChanges (version-range change feed)") {
    it("classifies inserted/updated, suppresses unchanged keys, and reads ONLY moved buckets") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/vsnap"
        val bucket = pmod(col("k"), lit(4L))
        // v1: keys 0..39 over buckets 0..3
        Layout.upsertVersioned(spark, snap,
          (0L until 40L).map(k => (k, s"v$k")).toDF("k", "txt"), Seq("k"), bucket)
        // v2: replace key 5, add key 41 (bucket 1 only)
        Layout.upsertVersioned(spark, snap,
          Seq((5L, "five-v2"), (41L, "new")).toDF("k", "txt"), Seq("k"), bucket)
        // v3: replace key 5 again, add key 42 (buckets 1 and 2)
        Layout.upsertVersioned(spark, snap,
          Seq((5L, "five-v3"), (42L, "fresh")).toDF("k", "txt"), Seq("k"), bucket)

        val feed = Layout.readChanges(spark, snap, 1L, 3L, Seq("k"))
        // untouched-bucket skip, pinned down to the actual scan set:
        // buckets 0 and 3 never moved between v1 and v3
        assert(feed.inputFiles.nonEmpty)
        assert(!feed.inputFiles.exists(f => f.contains("_b0/") || f.contains("_b3/")),
          feed.inputFiles.mkString("\n"))
        val rows = feed
          .select(col("k"), col("change"), col("before.txt"), col("after.txt"))
          .as[(Long, String, Option[String], Option[String])].collect().toSet
        // key 5 updated through two rewrites (before = v1 image, after =
        // LATEST image); 41/42 inserted; the other 38 bucket-1/2 keys
        // were copied forward unchanged — suppressed
        assert(rows == Set(
          (5L, "updated", Some("v5"), Some("five-v3")),
          (41L, "inserted", None, Some("new")),
          (42L, "inserted", None, Some("fresh"))))
        // the narrower range sees only its own delta
        val r12 = Layout.readChanges(spark, snap, 1L, 2L, Seq("k"))
          .select(col("k"), col("change")).as[(Long, String)].collect().toSet
        assert(r12 == Set((5L, "updated"), (41L, "inserted")))
        // degenerate range ordering fails loudly
        val ex = intercept[IllegalArgumentException] {
          Layout.readChanges(spark, snap, 3L, 3L, Seq("k"))
        }
        assert(ex.getMessage.contains("fromV < toV"))
      }
    }

    it("a vacuumed from-version fails loudly, not with a mid-scan FileNotFound") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/vsnap"
        val bucket = pmod(col("k"), lit(4L))
        Layout.upsertVersioned(spark, snap,
          (0L until 8L).map(k => (k, s"v$k")).toDF("k", "txt"), Seq("k"), bucket)
        Layout.upsertVersioned(spark, snap,
          Seq((5L, "five-v2")).toDF("k", "txt"), Seq("k"), bucket)
        Layout.vacuumVersions(spark, snap, retainLast = 1)
        val ex = intercept[IllegalArgumentException] {
          Layout.readChanges(spark, snap, 1L, 2L, Seq("k"))
        }
        assert(ex.getMessage.contains("vacuumed or never committed"))
      }
    }
  }

  describe("Layout.compactVersioned") {
    it("preserves every retained version's read-back, collapses each bucket to one file, and feeds no changes") {
      withTempDir { dir =>
        val snap = s"${dir.getAbsolutePath}/vsnap"
        val bucket = pmod(col("k"), lit(4L))
        def readMap(v: Long) = Layout.readAsOf(spark, snap, v)
          .select(col("k"), col("txt")).as[(Long, String)].collect().toMap
        Layout.upsertVersioned(spark, snap,
          (0L until 40L).map(k => (k, s"v$k")).toDF("k", "txt")
            .repartition(8), // multi-partition stage → multi-file gen dirs
          Seq("k"), bucket)
        Layout.upsertVersioned(spark, snap,
          Seq((5L, "five-v2"), (41L, "new")).toDF("k", "txt"), Seq("k"), bucket)
        val (m1, m2) = (readMap(1L), readMap(2L))
        val preFiles = Layout.readAsOf(spark, snap, 2L).inputFiles.length
        assert(preFiles > 4, s"pre-compaction live files: $preFiles") // genuinely fragmented

        val cv = Layout.compactVersioned(spark, snap)
        assert(cv == 3L)
        // identical read-back at EVERY retained version
        assert(readMap(1L) == m1 && readMap(2L) == m2 && readMap(3L) == m2)
        // exactly one file per bucket in the compacted generation
        assert(Layout.readAsOf(spark, snap, 3L).inputFiles.length == 4)
        // compaction is data-invariant: the change feed across it is
        // EMPTY even though every bucket's generation pointer moved
        assert(Layout.readChanges(spark, snap, 2L, 3L, Seq("k")).isEmpty)
        // vacuum now reclaims the whole pre-compaction history
        val deleted = Layout.vacuumVersions(spark, snap, retainLast = 1)
        assert(deleted.count(_.startsWith("g")) >= 4, deleted.toString)
        assert(readMap(3L) == m2)
      }
    }
  }

  describe("Layout.compact") {
    it("collapses many small files into the target count without losing rows") {
      withTempDir { dir =>
        val small = s"${dir.getAbsolutePath}/small"
        val out = s"${dir.getAbsolutePath}/compacted"
        (1L to 1000L).toDF("k").repartition(50).write.parquet(small)
        val (before, after, rows) = Layout.compact(spark, small, out, targetRecordsPerFile = 500)
        assert(before == 50 && rows == 1000)
        assert(after == 2, s"expected 2 output files, got $after")
        assert(spark.read.parquet(out).as[Long].collect().toSet == (1L to 1000L).toSet)
      }
    }

    it("compacts WITH clustering when cluster columns are given") {
      withTempDir { dir =>
        val small = s"${dir.getAbsolutePath}/small"
        val out = s"${dir.getAbsolutePath}/compacted"
        scala.util.Random.shuffle((1L to 900L).toList).toDF("k").repartition(30).write.parquet(small)
        val (_, after, _) = Layout.compact(spark, small, out,
          targetRecordsPerFile = 300, clusterCols = Seq("k"))
        // sampled range boundaries are approximate: an oversized range
        // splits at the per-file cap, so 3 target files may become a few
        assert(after >= 3 && after <= 6, s"got $after files")
        val ranges = Layout.fileRanges(spark, out, "k").sortBy(_._1)
        ranges.sliding(2).foreach {
          case Seq((_, aMax), (bMin, _)) => assert(aMax < bMin)
          case _ =>
        }
      }
    }
  }
}
