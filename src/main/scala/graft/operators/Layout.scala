package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-side discipline that decides what
  * every later 100 TB scan costs:
  *
  *  - [[writeClustered]]: range-cluster on the query keys + sort within
  *    files + bounded file size. Each output file covers a DISJOINT key
  *    range (spec-verified from the parquet footers), so range/point
  *    predicates skip whole row groups via pushed filters today and
  *    whole files under stats-aware table formats; sorted pages give
  *    the best min/max granularity either way.
  *  - [[compact]]: the small-files compactor — streaming emitters and
  *    per-executor writes leave thousands of KB-sized files whose
  *    per-file open/footer overhead dominates a scan; rewrite to a
  *    bounded file count with layout preserved-or-applied.
  *
  * Both are one-time (or periodic) write-side costs that amortize over
  * every subsequent read, like [[Bucketing]] — bucketing co-locates a
  * JOIN key across tables, clustering orders a FILTER key within one.
  */
object Layout {

  /** Keyed corpus upsert — the maintenance merge a living training
    * corpus needs every refresh cycle (re-crawled pages replace their
    * previous revision, brand-new pages append): rows of `updates` win
    * on key collision, untouched `base` rows carry over, nothing else
    * changes. Equivalently MERGE INTO … WHEN MATCHED UPDATE / WHEN NOT
    * MATCHED INSERT with whole-row semantics.
    *
    * Requires `updates` key-unique (one winner per key must be decided
    * UPSTREAM — e.g. max-version per key — or the output would carry
    * duplicate keys; checked lazily via an in-plan guard that fails the
    * job rather than silently emitting dupes).
    *
    * Scale shape: one key-partitioned LEFT ANTI join (base keys minus
    * updated keys) + a union — no window, no global sort, no driver
    * data. The anti-join's build side is the update batch (small per
    * refresh cycle → AQE broadcasts it; a full-corpus rewrite degrades
    * to a shuffle join and is still one pass). Write the result with
    * [[writeClustered]] to restore layout.
    */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val keys = keyCols.map(col)
    // in-plan uniqueness guard, fused into a kept key column so pruning
    // can't drop it: a duplicated update key fails the job instead of
    // silently emitting duplicate-keyed output. Cost = one window over
    // the UPDATE BATCH only (small per refresh cycle), never the base.
    val kc = count(lit(1))
      .over(org.apache.spark.sql.expressions.Window.partitionBy(keys: _*))
    val guarded = updates.withColumn(keyCols.head,
      when(kc > 1, raise_error(concat(
        lit("upsert: duplicate update key "), concat_ws(",", keys: _*))))
        .otherwise(col(keyCols.head)))
    guarded.unionByName(
      base.join(updates.select(keys: _*).distinct(), keyCols, "left_anti"))
  }

  /** Default bucket assignment for [[upsertPartitioned]] snapshots:
    * `xxhash64(keys) mod numBuckets`, cast to int (partition-directory
    * values are ints on read-back). Deterministic across runs and JVMs
    * (xxhash64 is seed-stable), uniform for arbitrary key types. Use a
    * plain `pmod(key, n)` or a range bucketing instead when updates
    * have KEY LOCALITY — hash scatters an update batch across ≈
    * min(numBuckets, batchKeys) buckets, while a locality-aligned
    * bucketing concentrates it (fewer rewritten bytes per merge).
    */
  def bucketOf(keyCols: Seq[String], numBuckets: Int): Column = {
    require(keyCols.nonEmpty, "bucketOf needs at least one key column")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets.toLong)).cast("int")
  }

  /** Initialize (or fully rebuild) a bucket-partitioned snapshot at
    * `path`: one Hive-style partition directory per value of
    * `bucketExpr` (materialized as column `bucketCol`). This is the
    * base layout [[upsertPartitioned]] merges into — the bucket column
    * is a PARTITION column on read-back, so bucket predicates prune at
    * the directory level (zero I/O for untouched buckets).
    */
  def writeBucketed(df: DataFrame, path: String, bucketExpr: Column,
                    bucketCol: String = "__bucket"): Unit =
    df.withColumn(bucketCol, bucketExpr.cast("int"))
      .write.partitionBy(bucketCol).mode(SaveMode.Overwrite).parquet(path)

  /** Partition-scoped keyed upsert — [[upsert]] at snapshot scale.
    * Merges `updates` into the bucket-partitioned snapshot directory at
    * `basePath` ([[writeBucketed]] layout) rewriting ONLY the buckets
    * that contain update keys; every other bucket's files are left
    * PHYSICALLY untouched (same paths, sizes, mtimes — spec-asserted).
    * This is the copy-on-write discipline that keeps continuous CDC
    * ingestion viable at 100 TB: a full-snapshot rewrite per batch is
    * O(snapshot) I/O regardless of batch size, while this is
    * O(touched buckets) ≈ O(min(numBuckets, batchKeys) · bucketSize) —
    * per-merge cost tracks the UPDATE, not the table, whenever buckets
    * outnumber the batch's keys (size numBuckets ≈ snapshotRows /
    * typicalBatchKeys, or bucket by a locality-aligned expression).
    *
    * Mechanics per merge: (1) the update batch's bucket set is computed
    * from the BATCH alone (≤ numBuckets ints to the driver — bounded by
    * construction); (2) only those partition directories of the base
    * are read (directory-level pruning via the partition column);
    * (3) [[upsert]] semantics merge them (updates win their key,
    * duplicate-update-key guard included); (4) the merged buckets are
    * staged to a sibling directory and committed by per-directory
    * delete+rename — the explicit form of dynamic partition overwrite,
    * chosen because Spark (correctly) refuses a job that overwrites a
    * root it is also reading, and because the swap makes the
    * untouched-bucket invariant a filesystem fact rather than a
    * committer implementation detail. On an object store without atomic
    * rename, a production deployment would commit step (4) through a
    * table format's metadata log (the staged files are already laid out
    * for that); the merge plan — the expensive part — is identical.
    *
    * SINGLE-WRITER per snapshot: the stage directory and manifest are
    * fixed siblings of `basePath`, so concurrent merges would corrupt
    * each other's commit. A lock file (`basePath__upsert_lock`, atomic
    * create-no-overwrite) makes the requirement fail-fast instead of
    * silent (ADVICE r9): a second writer gets an IllegalStateException
    * naming the holder. A crashed writer leaves the lock behind — after
    * confirming no merge is live, clear it with [[breakLock]]; the next
    * merge then replays the crashed commit from its manifest.
    *
    * Returns the touched bucket ids (sorted).
    */
  def upsertPartitioned(spark: SparkSession, basePath: String, updates: DataFrame,
                        keyCols: Seq[String], bucketExpr: Column,
                        bucketCol: String = "__bucket"): Seq[Int] = {
    require(keyCols.nonEmpty, "upsertPartitioned needs at least one key column")
    withMergeLock(spark, basePath) { fs =>
      // a previous merge that died mid-commit left a manifest: finish its
      // swaps FIRST (idempotent) — merging on top of a torn snapshot
      // would read a mix of old and new bucket generations
      recoverLocked(spark, basePath, bucketCol)
      val upd = updates.withColumn(bucketCol, bucketExpr.cast("int"))
      // bucket ids of THIS batch: bounded by numBuckets, never by data
      val touched = upd.select(col(bucketCol)).distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      if (touched.isEmpty) touched
      else {
        val base = spark.read.parquet(basePath)
          .filter(col(bucketCol).isin(touched.map(Integer.valueOf): _*))
        val merged = upsert(base, upd, keyCols)
        val stagePath = basePath + "__upsert_stage"
        merged.write.partitionBy(bucketCol).mode(SaveMode.Overwrite).parquet(stagePath)
        // commit protocol: (1) durable manifest naming the touched buckets,
        // (2) per-bucket delete+rename swaps, (3) stage cleanup, (4) manifest
        // removal. A crash at ANY point recovers on the next call: before
        // the manifest lands nothing moved (the stage is overwritten next
        // merge); after it, recoverPendingCommit replays exactly the swaps
        // whose staged directories still exist (rename is the atomic unit).
        val baseDir = new org.apache.hadoop.fs.Path(basePath)
        val stageDir = new org.apache.hadoop.fs.Path(stagePath)
        writeCommitManifest(fs, basePath, touched, Nil)
        touched.foreach(b => swapBucket(fs, stageDir, baseDir, bucketCol, b))
        fs.delete(stageDir, true)
        fs.delete(manifestPath(basePath), false)
        touched
      }
    }
  }

  /** Partition-scoped keyed DELETE — the right-to-be-forgotten purge at
    * snapshot scale, same economics as [[upsertPartitioned]]: only
    * buckets containing tombstone keys are rewritten (anti-join of the
    * touched buckets against the broadcast-sized key set), untouched
    * buckets stay physically identical, and the commit is the same
    * crash-safe manifest-before-swap protocol. A bucket whose rows ALL
    * die produces no staged directory; its removal is recorded in the
    * manifest as a `D<b>` entry BEFORE any swap or delete happens, so a
    * crash anywhere in the commit window is repaired by
    * [[recoverPendingCommit]] — the purge completes without relying on
    * an operator-initiated retry (ADVICE r9; directory delete is the
    * idempotent replay unit, as rename is for swaps).
    *
    * Single-writer per snapshot, enforced by the same lock as
    * [[upsertPartitioned]].
    *
    * Returns the touched bucket ids (sorted).
    */
  def deletePartitioned(spark: SparkSession, basePath: String, tombstones: DataFrame,
                        keyCols: Seq[String], bucketExpr: Column,
                        bucketCol: String = "__bucket"): Seq[Int] = {
    require(keyCols.nonEmpty, "deletePartitioned needs at least one key column")
    withMergeLock(spark, basePath) { fs =>
      recoverLocked(spark, basePath, bucketCol)
      val keys = tombstones.select(keyCols.map(col): _*).distinct()
        .withColumn(bucketCol, bucketExpr.cast("int"))
        .localCheckpoint(false) // feeds the bucket list AND the anti-join
      val touched = keys.select(col(bucketCol)).distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      if (touched.isEmpty) touched
      else {
        val base = spark.read.parquet(basePath)
          .filter(col(bucketCol).isin(touched.map(Integer.valueOf): _*))
        val survivors = base.join(broadcast(keys.drop(bucketCol)), keyCols, "left_anti")
        val stagePath = basePath + "__upsert_stage"
        survivors.write.partitionBy(bucketCol).mode(SaveMode.Overwrite).parquet(stagePath)
        val baseDir = new org.apache.hadoop.fs.Path(basePath)
        val stageDir = new org.apache.hadoop.fs.Path(stagePath)
        // buckets with survivors swap; fully-emptied buckets delete —
        // BOTH actions are named by the manifest before either runs
        val staged = touched.filter(b =>
          fs.exists(new org.apache.hadoop.fs.Path(stageDir, s"$bucketCol=$b")))
        val emptied = (touched.toSet -- staged).toSeq.sorted
        writeCommitManifest(fs, basePath, staged, emptied)
        staged.foreach(b => swapBucket(fs, stageDir, baseDir, bucketCol, b))
        emptied.foreach(b =>
          fs.delete(new org.apache.hadoop.fs.Path(baseDir, s"$bucketCol=$b"), true))
        fs.delete(stageDir, true)
        fs.delete(manifestPath(basePath), false)
        touched
      }
    }
  }

  private def manifestPath(basePath: String) =
    new org.apache.hadoop.fs.Path(basePath + "__upsert_commit")

  private def lockPath(basePath: String) =
    new org.apache.hadoop.fs.Path(basePath + "__upsert_lock")

  /** Acquire the snapshot's merge lock (atomic create-no-overwrite),
    * run `body`, release. A held lock fails FAST with the holder's
    * identity rather than letting two writers corrupt the shared stage
    * directory and manifest (ADVICE r9). Atomic on HDFS and local
    * filesystems; an object-store deployment would swap this for a
    * conditional put — same protocol. */
  private def withMergeLock[A](spark: SparkSession, basePath: String)
                              (body: org.apache.hadoop.fs.FileSystem => A): A = {
    val lp = lockPath(basePath)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val holder = s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName} " +
      s"thread=${Thread.currentThread().getId} at=${java.time.Instant.now()}"
    try {
      val out = fs.create(lp, false)
      try out.write(holder.getBytes("UTF-8")) finally out.close()
    } catch {
      // Only a create-no-overwrite CONTENTION is "lock held"; a transient
      // FS fault or permission error propagates as-is so an operator is
      // never advised to break a lock that was never contended (ADVICE r10).
      case e: java.io.IOException
          if e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
            fs.exists(lp) =>
        val who = try {
          val in = fs.open(lp)
          try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
          finally in.close()
        } catch { case _: java.io.IOException => "<unreadable>" }
        throw new IllegalStateException(
          s"merge lock for $basePath is held (by $who). Partitioned merges are " +
            "single-writer per snapshot; if the holder crashed, clear the lock " +
            "with Layout.breakLock — the next merge replays any pending commit.", e)
    }
    try body(fs) finally fs.delete(lp, false)
  }

  /** Remove a crashed writer's stale merge lock. Caller asserts no
    * merge is live on `basePath`; the next merge (or
    * [[recoverPendingCommit]]) then finishes any pending commit. */
  def breakLock(spark: SparkSession, basePath: String): Boolean = {
    val lp = lockPath(basePath)
    lp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(lp, false)
  }

  /** Manifest lines: a bare int = swap bucket `b` from the stage; `D<b>`
    * = delete bucket directory `b` (a purge that emptied it). Written
    * atomically (tmp + rename) before any mutation runs. */
  private def writeCommitManifest(fs: org.apache.hadoop.fs.FileSystem,
                                  basePath: String, swaps: Seq[Int],
                                  deletes: Seq[Int]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(basePath + "__upsert_commit.tmp")
    val out = fs.create(tmp, true)
    val body = (swaps.map(_.toString) ++ deletes.map(b => s"D$b")).mkString("\n")
    try out.write(body.getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, manifestPath(basePath)),
      s"upsertPartitioned: could not persist commit manifest for $basePath")
  }

  private def swapBucket(fs: org.apache.hadoop.fs.FileSystem,
                         stageDir: org.apache.hadoop.fs.Path,
                         baseDir: org.apache.hadoop.fs.Path,
                         bucketCol: String, b: Int): Unit = {
    val src = new org.apache.hadoop.fs.Path(stageDir, s"$bucketCol=$b")
    val dst = new org.apache.hadoop.fs.Path(baseDir, s"$bucketCol=$b")
    require(fs.exists(src), s"upsertPartitioned: staged bucket $b missing at $src")
    if (fs.exists(dst)) fs.delete(dst, true)
    require(fs.rename(src, dst), s"upsertPartitioned: commit rename failed for bucket $b")
  }

  /** Complete a merge that crashed mid-commit (manifest present): swap
    * in every manifest swap bucket whose staged directory still exists —
    * already-swapped buckets have no staged dir left, so the replay is
    * idempotent — replay every `D<b>` deletion (directory delete is
    * idempotent too), then clean the stage and the manifest. Returns
    * true when a pending commit was found and finished. Callers that
    * read a snapshot OUTSIDE upsertPartitioned (which recovers
    * automatically) should invoke this first after an unclean shutdown.
    * Takes the merge lock — a live writer makes this fail fast.
    */
  def recoverPendingCommit(spark: SparkSession, basePath: String,
                           bucketCol: String = "__bucket"): Boolean =
    withMergeLock(spark, basePath)(_ => recoverLocked(spark, basePath, bucketCol))

  /** [[recoverPendingCommit]] body, called with the merge lock held. */
  private def recoverLocked(spark: SparkSession, basePath: String,
                            bucketCol: String): Boolean = {
    val baseDir = new org.apache.hadoop.fs.Path(basePath)
    val fs = baseDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = manifestPath(basePath)
    if (!fs.exists(manifest)) return false
    val in = fs.open(manifest)
    val lines =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .split("\n").filter(_.nonEmpty).toSeq
      finally in.close()
    val stageDir = new org.apache.hadoop.fs.Path(basePath + "__upsert_stage")
    lines.foreach {
      case d if d.startsWith("D") =>
        fs.delete(new org.apache.hadoop.fs.Path(baseDir, s"$bucketCol=${d.tail.toInt}"), true)
      case s =>
        val b = s.toInt
        val src = new org.apache.hadoop.fs.Path(stageDir, s"$bucketCol=$b")
        if (fs.exists(src)) swapBucket(fs, stageDir, baseDir, bucketCol, b)
    }
    fs.delete(stageDir, true)
    fs.delete(manifest, false)
    true
  }

  /** (relativePath → (length, mtime)) for every data file under a
    * bucket-partitioned snapshot — the physical signature
    * [[upsertPartitioned]]'s untouched-bucket invariant is audited
    * against (q157 recomputes it across every merge and fails the run
    * if an untouched bucket's files moved). */
  def bucketFileSignatures(spark: SparkSession, basePath: String,
                           bucketCol: String = "__bucket"): Map[Int, Map[String, (Long, Long)]] = {
    val baseDir = new org.apache.hadoop.fs.Path(basePath)
    val fs = baseDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(baseDir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$bucketCol="))
      .map { st =>
        val b = st.getPath.getName.stripPrefix(s"$bucketCol=").toInt
        b -> fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
          .map(f => f.getPath.getName -> ((f.getLen, f.getModificationTime)))
          .toMap
      }.toMap
  }

  // ---- versioned (time-travel) bucketed snapshot -----------------------

  /** Naming for the versioned store: immutable bucket GENERATIONS live
    * as `g<version>_b<bucket>` directories under `basePath` (data files
    * keep the bucket column as a data column, so a generation dir is
    * directly readable), and each committed version is ONE manifest
    * file `_versions/v<version>.manifest` whose lines are
    * `<bucket> <generation>` — the full live bucket→generation map of
    * that snapshot version. */
  private def versionsDir(basePath: String) =
    new org.apache.hadoop.fs.Path(basePath, "_versions")
  private def versionManifest(basePath: String, v: Long) =
    new org.apache.hadoop.fs.Path(versionsDir(basePath), f"v$v%08d.manifest")
  private def genDirName(b: Int, g: Long) = f"g$g%08d_b$b"
  private def genDir(basePath: String, b: Int, g: Long) =
    new org.apache.hadoop.fs.Path(basePath, genDirName(b, g))

  private def listVersionsFs(fs: org.apache.hadoop.fs.FileSystem,
                             basePath: String): Seq[Long] = {
    val vd = versionsDir(basePath)
    if (!fs.exists(vd)) Seq.empty
    else fs.listStatus(vd).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted
  }

  private def readVersionManifest(fs: org.apache.hadoop.fs.FileSystem,
                                  basePath: String, v: Long): Map[Int, Long] = {
    val mp = versionManifest(basePath, v)
    require(fs.exists(mp),
      s"readAsOf: version $v of $basePath does not exist (vacuumed or never committed)")
    val in = fs.open(mp)
    val body =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    body.split("\n").iterator.filter(_.nonEmpty).map { line =>
      val Array(b, g) = line.split(" ")
      b.toInt -> g.toLong
    }.toMap
  }

  /** Committed versions of a versioned snapshot, ascending. */
  def listVersions(spark: SparkSession, basePath: String): Seq[Long] = {
    val fs = new org.apache.hadoop.fs.Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    listVersionsFs(fs, basePath)
  }

  /** [[upsertPartitioned]] with TIME TRAVEL — the table-format design
    * point the CoW swap protocol deliberately traded away: instead of
    * replacing touched bucket directories in place (old generation
    * destroyed at commit), every merge writes touched buckets as NEW
    * immutable generation directories and commits by publishing ONE
    * manifest naming the live generation of every bucket. The manifest
    * rename IS the commit (single atomic unit — strictly simpler than
    * the CoW swap chain): a crash before it leaves only unreferenced
    * generation dirs, which the next attempt at the same version
    * number clobbers; a crash after it is a completed commit. Readers
    * ([[readAsOf]]) resolve any retained version without locking —
    * snapshot isolation for free, since generations are immutable.
    *
    * Same merge economics as [[upsertPartitioned]]: only the batch's
    * touched buckets are read (from their CURRENT generations) and
    * rewritten; untouched buckets carry their generation pointer
    * forward in the manifest — zero I/O. Storage now grows with the
    * touched-bucket history instead of staying O(snapshot);
    * [[vacuumVersions]] is the bounded-retention lever. Single-writer
    * via the same merge lock.
    *
    * @return the committed version (1 + previous; an empty batch
    *         commits nothing and returns the current version)
    */
  def upsertVersioned(spark: SparkSession, basePath: String, updates: DataFrame,
                      keyCols: Seq[String], bucketExpr: Column,
                      bucketCol: String = "__bucket"): Long = {
    require(keyCols.nonEmpty, "upsertVersioned needs at least one key column")
    withMergeLock(spark, basePath) { fs =>
      val versions = listVersionsFs(fs, basePath)
      val cur = versions.lastOption
      val next = cur.getOrElse(0L) + 1L
      val prevEntries = cur.map(readVersionManifest(fs, basePath, _))
        .getOrElse(Map.empty[Int, Long])
      val upd = updates.withColumn(bucketCol, bucketExpr.cast("int"))
      val touched = upd.select(col(bucketCol)).distinct()
        .collect().map { r =>
          require(!r.isNullAt(0), "upsertVersioned: bucketExpr produced a " +
            "NULL bucket — bucket expressions must be total over the batch " +
            "(pmod a non-null key, or coalesce a null-able one)")
          r.getInt(0)
        }.sorted.toSeq
      if (touched.isEmpty) cur.getOrElse(
        throw new IllegalStateException(
          "upsertVersioned: empty first batch — nothing to initialize from"))
      else {
        val gens = touched.flatMap(b => prevEntries.get(b)
          .map(g => genDir(basePath, b, g).toString))
        val base =
          if (gens.nonEmpty) spark.read.parquet(gens: _*) else upd.filter(lit(false))
        val merged = upsert(base, upd, keyCols)
        commitGenerations("upsertVersioned", fs, basePath, merged,
          "__version_stage", touched, bucketCol, next,
          prevEntries ++ touched.map(_ -> next))
        next
      }
    }
  }

  /** The ONE versioned-store commit protocol, shared by
    * [[upsertVersioned]] (touched buckets only) and
    * [[compactVersioned]] (every live bucket) so a future fix to the
    * staging/rename/manifest discipline cannot silently fork between
    * them: stage `df` partitioned by a DUPLICATE of the bucket column
    * (data files must keep the bucket column itself — generation dirs
    * are readable standalone, no partition-discovery root), rename
    * each staged bucket to its version-`next` generation dir
    * (clobbering a crashed PRIOR attempt's unreferenced generation),
    * then commit `entries` as the manifest via tmp-write + atomic
    * rename. Caller holds the merge lock. */
  private def commitGenerations(op: String,
      fs: org.apache.hadoop.fs.FileSystem, basePath: String,
      df: DataFrame, stageSuffix: String, buckets: Seq[Int],
      bucketCol: String, next: Long, entries: Map[Int, Long]): Unit = {
    val stagePath = basePath + stageSuffix
    df.withColumn("__vpart", col(bucketCol))
      .write.partitionBy("__vpart").mode(SaveMode.Overwrite).parquet(stagePath)
    val stageDir = new org.apache.hadoop.fs.Path(stagePath)
    buckets.foreach { b =>
      val src = new org.apache.hadoop.fs.Path(stageDir, s"__vpart=$b")
      val dst = genDir(basePath, b, next)
      require(fs.exists(src), s"$op: staged bucket $b missing at $src")
      if (fs.exists(dst)) fs.delete(dst, true)
      require(fs.rename(src, dst),
        s"$op: generation rename failed for bucket $b")
    }
    fs.delete(stageDir, true)
    fs.mkdirs(versionsDir(basePath))
    val tmp = new org.apache.hadoop.fs.Path(versionsDir(basePath),
      s"v$next.manifest.tmp")
    val out = fs.create(tmp, true)
    val body = entries.toSeq.sortBy(_._1)
      .map { case (b, g) => s"$b $g" }.mkString("\n")
    try out.write(body.getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, versionManifest(basePath, next)),
      s"$op: could not commit manifest for version $next")
  }

  /** Snapshot-isolated read of a versioned snapshot AS OF `version`:
    * resolve the version's manifest to its bucket generations and read
    * exactly those immutable directories. No lock — a concurrent merge
    * only ever ADDS generations and manifests. Fails loudly when the
    * version was vacuumed or never committed, and EAGERLY validates
    * that every referenced generation directory still exists at
    * resolution time (a half-vacuumed version fails here, not as a
    * confusing mid-scan FileNotFound).
    *
    * RETENTION RACE CONTRACT: the returned DataFrame is LAZY — the
    * parquet scan happens at action time. A [[vacuumVersions]] whose
    * retention window lapses past `version` between this call and the
    * action deletes the generation dirs out from under the scan
    * (FileNotFoundException — or silently partial rows if
    * `spark.sql.files.ignoreMissingFiles` is enabled; leave that flag
    * off on versioned stores). Readers that must outlive the retention
    * window materialize first (`.localCheckpoint(true)`, or write out)
    * — the same discipline every lock-free snapshot store (Delta/
    * Iceberg vacuum) imposes; the eager check above narrows the window
    * to resolution→action but only retention sizing closes it. */
  def readAsOf(spark: SparkSession, basePath: String, version: Long): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = readVersionManifest(fs, basePath, version)
    require(entries.nonEmpty, s"readAsOf: version $version of $basePath is empty")
    val dirs = entries.toSeq.sortBy(_._1)
      .map { case (b, g) => genDir(basePath, b, g) }
    val missing = dirs.filterNot(fs.exists)
    require(missing.isEmpty,
      s"readAsOf: version $version of $basePath references vacuumed " +
        s"generation dirs (${missing.map(_.getName).mkString(", ")}) — " +
        "its manifest survived a partial vacuum or retention lapsed mid-read")
    spark.read.parquet(dirs.map(_.toString): _*)
  }

  /** Bounded retention for the versioned snapshot: keep the newest
    * `retainLast` versions' manifests, delete older manifests and
    * every generation directory no retained manifest references.
    * Runs under the merge lock (a concurrent merge could otherwise
    * commit a manifest referencing a generation mid-delete).
    *
    * @return the deleted directory/manifest names (sorted)
    */
  def vacuumVersions(spark: SparkSession, basePath: String,
                     retainLast: Int): Seq[String] = {
    require(retainLast >= 1, s"retainLast must be >= 1, got $retainLast")
    withMergeLock(spark, basePath) { fs =>
      val versions = listVersionsFs(fs, basePath)
      val keep = versions.takeRight(retainLast).toSet
      val referenced = keep.toSeq
        .flatMap(v => readVersionManifest(fs, basePath, v).toSeq)
        .map { case (b, g) => genDirName(b, g) }.toSet
      val baseDir = new org.apache.hadoop.fs.Path(basePath)
      // -? : negative buckets are legal (a signed % bucketExpr) and their
      // superseded generations must vacuum like any other
      val deadGens = fs.listStatus(baseDir).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.matches("g\\d+_b-?\\d+") &&
          !referenced.contains(st.getPath.getName))
        .map(_.getPath)
      val deadManifests = versions.filterNot(keep)
        .map(v => versionManifest(basePath, v))
      (deadGens ++ deadManifests).foreach(p => fs.delete(p, true))
      (deadGens ++ deadManifests).map(_.getName).sorted
    }
  }

  /** Version-range CHANGE FEED over the versioned snapshot — the
    * Delta-CDF analog [[readAsOf]] stops short of: per-key change rows
    * between two committed versions, WITHOUT diffing two full snapshot
    * scans. The manifest chain makes this cheap by construction: a
    * bucket whose generation pointer is IDENTICAL in both manifests
    * cannot contain a changed key (generations are immutable), so only
    * pointer-moved buckets are read — at 100 TB an incremental
    * consumer (the q282 postings / q280 routing maintenance chain)
    * pays O(touched-bucket history), not O(2 · snapshot).
    *
    * Key-stability contract (already the store's): `bucketExpr` is a
    * pure function of the key, so a key never migrates buckets and the
    * per-bucket diff IS the per-key diff. Both sides carry the same
    * bucket-derived layout, so the key-equi-join below shuffles only
    * the touched buckets' rows.
    *
    * Change rows: `inserted` (key absent at `fromV`), `deleted` (key
    * absent at `toV` — unreachable under today's upsert-only writers,
    * kept in the contract for a delete-capable writer), `updated` (both
    * present, any non-key column differs — null-safe compare).
    * Unchanged keys inside a rewritten bucket emit NOTHING (a bucket
    * rewrite copies untouched keys forward; they are not changes).
    *
    * Same eager vacuum validation as [[readAsOf]], same lazy-read
    * retention race contract (materialize before retention can lapse).
    *
    * @return keyCols ++ (change, before, after) — before/after are
    *         structs of every non-key column (null on insert/delete)
    */
  def readChanges(spark: SparkSession, basePath: String,
                  fromV: Long, toV: Long, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "readChanges needs at least one key column")
    require(fromV < toV,
      s"readChanges: need fromV < toV, got $fromV >= $toV")
    val fs = new org.apache.hadoop.fs.Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val eFrom = readVersionManifest(fs, basePath, fromV)
    val eTo = readVersionManifest(fs, basePath, toV)
    val moved = (eFrom.keySet ++ eTo.keySet).toSeq.sorted
      .filter(b => eFrom.get(b) != eTo.get(b))
    def gens(entries: Map[Int, Long]) = moved
      .flatMap(b => entries.get(b).map(g => genDir(basePath, b, g)))
    val (oldDirs, newDirs) = (gens(eFrom), gens(eTo))
    val missing = (oldDirs ++ newDirs).filterNot(fs.exists)
    require(missing.isEmpty,
      s"readChanges: versions $fromV..$toV of $basePath reference vacuumed " +
        s"generation dirs (${missing.map(_.getName).mkString(", ")}) — " +
        "raise vacuum retention above the change-feed consumer's lag")
    // schema donor for the empty-side / no-change cases — preferably a
    // MOVED bucket (read anyway, so the untouched-bucket skip stays
    // strict down to inputFiles); an untouched bucket only when NOTHING
    // moved (then only this limit-0 schema probe is read at all). A
    // moved bucket may live only in eFrom under a delete-capable
    // writer (bucket dropped from toV's manifest — the 'deleted'
    // contract row), so resolve against whichever manifest carries it.
    lazy val donor = {
      val (b, g) = (moved.flatMap(b => eTo.get(b).map(b -> _)) ++
        moved.flatMap(b => eFrom.get(b).map(b -> _)) ++
        (eTo ++ eFrom).toSeq.sortBy(_._1)).head
      spark.read.parquet(genDir(basePath, b, g).toString).limit(0)
    }
    def side(dirs: Seq[org.apache.hadoop.fs.Path], as: String) = {
      val df = if (dirs.nonEmpty) spark.read.parquet(dirs.map(_.toString): _*)
               else donor
      val valueCols = df.columns.filterNot(keyCols.contains)
      require(valueCols.nonEmpty,
        "readChanges: the store has no non-key columns to diff")
      df.select(keyCols.map(col) :+
        struct(valueCols.map(col): _*).as(as): _*)
    }
    side(oldDirs, "before").join(side(newDirs, "after"), keyCols, "full_outer")
      .filter(col("before").isNull || col("after").isNull ||
        !(col("before") <=> col("after")))
      .select(keyCols.map(col) ++ Seq(
        when(col("before").isNull, lit("inserted"))
          .when(col("after").isNull, lit("deleted"))
          .otherwise(lit("updated")).as("change"),
        col("before"), col("after")): _*)
  }

  /** COMPACTION for the versioned snapshot: rewrite every live bucket
    * of the CURRENT version into exactly ONE file in a fresh
    * generation, committed as a new version with identical data. What
    * it buys, and why it is the second half of the retention story
    * ([[vacuumVersions]] being the first): (a) each merge's stage
    * write leaves as many files per generation dir as shuffle
    * partitions carried that bucket's rows — a hot bucket's LIVE
    * generation accretes small files that every subsequent read and
    * merge re-opens; compaction collapses them to one. (b) vacuum can
    * only delete generations no RETAINED manifest references — after
    * compaction the newest manifest references only the compacted
    * generations, so a following `vacuumVersions(retainLast = 1)`
    * reclaims the entire touched-bucket history. Data is unchanged at
    * every retained version: old manifests still resolve to their old
    * (untouched) generations.
    *
    * One shuffle, bucket-keyed: each bucket's rows land in exactly one
    * partition, so `partitionBy` emits exactly one file per bucket.
    * Runs under the merge lock (single-writer, like any merge).
    *
    * @return the committed (compacted) version
    */
  def compactVersioned(spark: SparkSession, basePath: String,
                       bucketCol: String = "__bucket"): Long = {
    withMergeLock(spark, basePath) { fs =>
      val versions = listVersionsFs(fs, basePath)
      require(versions.nonEmpty,
        s"compactVersioned: $basePath has no committed versions")
      val cur = versions.last
      val next = cur + 1L
      val entries = readVersionManifest(fs, basePath, cur)
      val buckets = entries.keySet.toSeq.sorted
      val live = spark.read.parquet(
        buckets.map(b => genDir(basePath, b, entries(b)).toString): _*)
      commitGenerations("compactVersioned", fs, basePath,
        live.repartition(buckets.size, col(bucketCol)),
        "__compact_stage", buckets, bucketCol, next,
        buckets.map(_ -> next).toMap)
      next
    }
  }

  /** Write `df` range-clustered on `clusterCols`: rows are range-
    * partitioned (one task per contiguous key range — partition ranges
    * are disjoint by construction), sorted within each partition, and
    * split into files of at most `maxRecordsPerFile` rows. `numRanges`
    * sizes the parallelism (≈ cluster cores, or
    * total/maxRecordsPerFile for size-driven splits).
    *
    * File-range contract: consecutive files' key ranges never
    * interleave (`aMax <= bMin` under the sorted order); a run of
    * DUPLICATE key values can share the single boundary key across a
    * file-size split (`aMax == bMin`), so point-lookup pruning may read
    * two files for that key — never more.
    */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
                     numRanges: Int, maxRecordsPerFile: Long = 1000000L,
                     format: String = "parquet"): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must not be empty")
    require(numRanges >= 1, s"numRanges must be >= 1, got $numRanges")
    val cols = clusterCols.map(col)
    // format-agnostic: the clustering discipline (disjoint ranges,
    // in-file sort, bounded size) pays off under any columnar sink with
    // min/max statistics — parquet and ORC both prune on it
    df.repartitionByRange(numRanges, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .format(format)
      .save(path)
  }

  /** Morton (Z-order) value of two dimension columns: the low `bitsPer`
    * bits of each, interleaved (x even positions, y odd) into one
    * `2·bitsPer`-bit key. Range-clustering on THIS key gives every
    * 2-D box predicate locality in one layout — the multi-dimension
    * answer where [[writeClustered]] on (x, y) only serves x-leading
    * queries. Negative inputs clamp to 0 and values ≥ 2^bitsPer to the
    * max (totality; normalize dims to comparable ranges upstream for
    * the best interleave). Pure bit arithmetic on built-in expressions:
    * a whole-stage-codegen projection, replayable in any engine —
    * NEVER a UDF.
    */
  def zOrderValue(x: Column, y: Column, bitsPer: Int = 16): Column =
    zOrderValueN(Seq(x, y), bitsPer)

  /** [[zOrderValue]] generalized to d dimensions (real pruning
    * workloads cluster on 3–4 dims — lang × quality-decile × day): bit
    * b of dimension j lands at interleaved position `b·d + j`, so for
    * d=2 this IS the classic (x even, y odd) Morton layout and q116's
    * files stay byte-stable. Same clamp totality per dimension; the
    * product `d·bitsPer` must fit a non-negative long (≤ 63 bits).
    * Still pure built-in bit arithmetic — one whole-stage-codegen
    * projection, replayable in any engine. (The Hilbert layout remains
    * 2-D by design: Hamilton's d-dimensional Gray-code form needs
    * per-axis rotation state that triples the expression tree per extra
    * dim; Morton loses only locality at quadrant jumps, not pruning
    * correctness, so it is the documented d>2 path.)
    */
  def zOrderValueN(dims: Seq[Column], bitsPer: Int): Column = {
    val d = dims.size
    require(d >= 2, s"zOrderValueN needs at least 2 dimensions, got $d")
    require(bitsPer >= 1 && d * bitsPer <= 63,
      s"d*bitsPer must be in [1,63], got $d*$bitsPer")
    val mask = (1L << bitsPer) - 1
    def clamp(c: Column) = least(greatest(c.cast("long"), lit(0L)), lit(mask))
    dims.zipWithIndex.flatMap { case (c, j) =>
      val cc = clamp(c)
      (0 until bitsPer).map(b =>
        shiftleft(shiftright(cc, b).bitwiseAND(lit(1L)), b * d + j))
    }.reduce(_ bitwiseOR _)
  }

  /** Hilbert-curve index of two clamped dimensions — the locality
    * upgrade over [[zOrderValue]]: the Hilbert curve visits every cell
    * of the 2^b × 2^b grid with CONSECUTIVE indices always in ADJACENT
    * cells (Morton jumps across the plane at quadrant boundaries), so
    * equal-count index ranges cover more compact 2-D tiles and a box
    * predicate touches fewer files. Standard xy→d bit algorithm
    * (Hamilton's iterative form, as published): per bit plane s from
    * high to low, `d += s²·((3·rx) xor ry)` then the (rx, ry)
    * reflection/swap rotates the frame. Implemented as the
    * `HilbertIndex` codegen Catalyst expression (a tight per-row Java
    * loop): composed `when`/bitwise columns TRIPLE in tree size per
    * bit plane (≈3^bits nodes — bits=8 hangs analysis; measured), the
    * expression is ~30 instructions/row. Negative reflection
    * intermediates are two's-complement identical on both engines, and
    * the oracle replays the identical arithmetic as a CTE chain.
    */
  def hilbertValue(x: Column, y: Column, bitsPer: Int = 8): Column =
    graft.catalyst.HilbertIndex(x.cast("long"), y.cast("long"), bitsPer)

  /** [[writeClustered]] along the Hilbert curve — same contract as
    * [[writeZOrdered]] with the tighter tiles of [[hilbertValue]]. */
  def writeHilbert(df: DataFrame, path: String, xCol: String, yCol: String,
                   numRanges: Int, bitsPer: Int = 8,
                   maxRecordsPerFile: Long = 1000000L, hCol: String = "hval",
                   format: String = "parquet"): Unit =
    writeClustered(
      df.withColumn(hCol, hilbertValue(col(xCol), col(yCol), bitsPer)),
      path, Seq(hCol), numRanges, maxRecordsPerFile, format)

  /** [[writeClustered]] along the Z-order curve of two dimensions: the
    * interleaved key is materialized as column `zCol` (kept in the
    * files — readers bucket and prune on it) and the write clusters on
    * it, so each output file covers a compact 2-D tile of (x, y) space
    * and a box predicate on either or both dims touches few files.
    * Same one-range-shuffle cost as any clustered write; the z
    * projection is codegen.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    numRanges: Int, bitsPer: Int = 16,
                    maxRecordsPerFile: Long = 1000000L, zCol: String = "zval",
                    format: String = "parquet"): Unit =
    writeZOrderedN(df, path, Seq(xCol, yCol), numRanges, bitsPer,
      maxRecordsPerFile, zCol, format)

  /** [[writeZOrdered]] over d dimension columns ([[zOrderValueN]]):
    * each output file covers a compact d-D tile, so a box predicate on
    * any subset of the dims touches few files. */
  def writeZOrderedN(df: DataFrame, path: String, dimCols: Seq[String],
                     numRanges: Int, bitsPer: Int = 16,
                     maxRecordsPerFile: Long = 1000000L, zCol: String = "zval",
                     format: String = "parquet"): Unit =
    writeClustered(
      df.withColumn(zCol, zOrderValueN(dimCols.map(col), bitsPer)),
      path, Seq(zCol), numRanges, maxRecordsPerFile, format)

  // NOTE: the former `_SUCCESS`-gated ensure wrappers are gone — bare
  // existence reuse silently serves stale layouts after an in-place
  // source regeneration (the VERDICT r7 #2 class). Callers stage
  // through `graft.Staging.ensureFresh(src, stage) { write... }`,
  // which keys reuse on the SOURCE's size+mtime instead.

  /** Rewrite a directory of (typically many small) parquet files into
    * ⌈rows / targetRecordsPerFile⌉ files. One narrow job: the rewrite
    * uses a round-robin repartition (no key shuffle semantics to
    * preserve in a pure compaction); pass `clusterCols` to apply
    * [[writeClustered]] layout while compacting — range boundaries are
    * SAMPLED, so an uneven range may split at `targetRecordsPerFile`
    * and the clustered file count can slightly exceed the target.
    * Returns (filesBefore, filesAfter, rows).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetRecordsPerFile: Long,
              clusterCols: Seq[String] = Nil): (Long, Long, Long) = {
    require(targetRecordsPerFile >= 1, s"targetRecordsPerFile must be >= 1")
    require(inPath != outPath,
      "compact cannot rewrite a directory in place (Spark refuses to overwrite " +
        "a path being read) — write to a sibling path and swap")
    val in = spark.read.parquet(inPath)
    val rows = in.count()
    val filesBefore = parquetFiles(spark, inPath).size.toLong
    val nOut = math.max(1L, (rows + targetRecordsPerFile - 1) / targetRecordsPerFile).toInt
    if (clusterCols.nonEmpty)
      writeClustered(in, outPath, clusterCols, nOut, targetRecordsPerFile)
    else
      in.repartition(nOut)
        .write.mode(SaveMode.Overwrite).parquet(outPath)
    (filesBefore, parquetFiles(spark, outPath).size.toLong, rows)
  }

  /** The data files of a parquet directory (no hidden/_SUCCESS). */
  private[operators] def parquetFiles(spark: SparkSession, path: String): Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_") && !f.getName.startsWith("."))
  }

  /** Per-file (min, max) of a long column, read from the parquet FOOTER
    * statistics — the metadata a stats-aware scan prunes with. Used by
    * specs to verify the disjoint-range layout contract. */
  private[operators] def fileRanges(spark: SparkSession, path: String,
                                    column: String): Seq[(Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    parquetFiles(spark, path).map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val ranges = reader.getFooter.getBlocks.asScala.flatMap { b =>
          b.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .map(c => c.getStatistics)
        }
        require(ranges.nonEmpty,
          s"no footer statistics for column '$column' in $f (wrong column name, " +
            "or a zero-row file)")
        // a stats object with no values (all-null column) would NPE on
        // genericGetMin with no hint of the cause — name it instead
        require(ranges.forall(_.hasNonNullValue),
          s"column '$column' in $f has footer statistics but no values " +
            "(entirely null column) — cannot derive a clustering range")
        (ranges.map(_.genericGetMin.asInstanceOf[Number].longValue).min,
          ranges.map(_.genericGetMax.asInstanceOf[Number].longValue).max)
      } finally reader.close()
    }
  }
}
