package graft.queries

import graft.SparkSpec

/** Plan-snapshot regression battery for the planner-fragile query class
  * — the q190 tripwire (VERDICT r11 #6): the round-10→11 BNLJ regression
  * (a projection-context NOT IN planned as |customer|·|orders|
  * BroadcastNestedLoopJoins) was only caught by BENCH, 11 s late. This
  * suite EXPLAINs the known-fragile queries at sf0.001 and asserts the
  * scale-critical facts of their INITIAL physical plans (pre-AQE — what
  * the planner commits to before runtime stats), so planner drift fails
  * in `sbt test`, not in the bench record.
  *
  * Facts pinned per query: BroadcastNestedLoopJoin count (0 everywhere
  * except the two queries whose BNLJs are provably bounded — q190's one
  * null-aware NOT IN over a BOUNDED value set, q200's single-row scalar
  * broadcasts), BroadcastHashJoin vs SortMergeJoin counts (small dims
  * must broadcast; nothing may silently fall to SMJ), shuffle-Exchange
  * counts (a new shuffle at 100 TB is a new multi-TB stage), q02's
  * no-shuffle TakeOrderedAndProject top-k, and q208's dynamicpruning
  * subquery. Counts are EXACT snapshots of the known-good plans: a
  * deliberate query change updates this table consciously; silent
  * planner drift trips it.
  *
  * (q197's runtime bloom filter only materializes under AQE at runtime
  * — RuntimeFilterSpec pins that separately; q208's partition-count
  * read fact lives in DppPlanSpec.)
  */
class PlanRegressionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** (query, bnlj, bhj, smj, shuffles) expected in the initial plan. */
  private val expected = Seq(
    ("q02_top_orders",        0, 0, 0, 0), // TakeOrderedAndProject, no shuffle
    ("q03_revenue_by_nation", 0, 2, 0, 2), // both dims broadcast
    ("q04_semi_join",         0, 1, 0, 0), // broadcast LeftSemi, zero shuffles
    ("q05_anti_join",         0, 1, 0, 0), // broadcast LeftAnti, zero shuffles
    ("q13_big_join",          0, 1, 0, 2),
    ("q39_range_join",        0, 1, 0, 2), // bucketed range prefilter stays equi
    ("q40_asof_join",         0, 0, 0, 2), // union+window form — NO join node
    ("q47_bucketed_join",     0, 1, 0, 2),
    ("q49_salted_join",       0, 1, 0, 3), // salted side joins broadcast
    ("q131_range_frame",      0, 0, 0, 2), // pure window — NO join node
    ("q184_argmax_battery",   0, 1, 0, 4),
    ("q190_subquery_battery", 1, 7, 0, 3), // exactly ONE bounded-set NAAJ BNLJ
    ("q200_quantile_filter",  2, 0, 0, 6), // two single-row scalar broadcasts
    ("q208_dynamic_pruning",  0, 1, 0, 2),
    ("q304_dgeo_dp_sum",      0, 0, 0, 2), // one hash agg + the orderBy; noise walk is in-projection
    ("q307_pref_length_skew", 1, 2, 0, 4), // exactly ONE bounded 1-row global broadcast (q200's class); pairs join broadcasts
    ("q310_pref_annotator_kappa", 0, 2, 0, 5), // both report-sized marginal frames broadcast (explicit hints — the checkpointed slice hides stats)
    ("q311_unigram_segment",  0, 1, 1, 3), // the Zipf-bounded word→pieces map broadcasts; the ONE SMJ is correct-by-design: the totality left join of two corpus-sized frames (docs × per-doc roll-up) must shuffle
    ("q313_pref_fleiss_kappa", 0, 1, 0, 5), // the |groups|-bounded marginal fold broadcasts (explicit hint); shuffles = the (grp,itm,lbl) count, two per-item/per-label refolds, two group folds, the orderBy
    ("q314_avro_roundtrip",   0, 0, 0, 1), // file-per-task RDD scan + the orderBy — NO join node
    ("q315_unigram_packing",  0, 1, 0, 3), // packOffsets' two-phase prefix sum: range buckets + local windows; the ONE BHJ is the tiny bucket-offset table broadcast — no single-partition global window
    ("q316_kripp_alpha",      0, 1, 0, 6), // the |groups|-bounded marginal fold broadcasts (explicit hint, the q313 lesson); shuffles = per-unit, per-(grp,den), dens-fold, per-(grp,lbl), marg-fold, orderBy — all downstream of the pairable-slice checkpoint
    ("q317_warc_roundtrip",   0, 0, 0, 1)) // file-per-task RDD scan + the orderBy — NO join node (q314's class)
  // (q305/q306 sit behind sortOnce's localCheckpoint, so their executed
  // plan is an RDD scan — their join shapes are pinned at the operator
  // level in PreferenceSpec/DedupSpec instead; q308's output is the
  // driver-local learned table — a LocalTableScan, nothing to pin;
  // q309/q312/q318 end at stream-drain localCheckpoints — merge
  // economics and the change feed's moved-bucket-only scan are pinned
  // in LayoutSpec, down to `inputFiles`.)

  private def occurrences(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  describe("initial-plan facts of the planner-fragile queries") {
    expected.foreach { case (name, bnlj, bhj, smj, shuf) =>
      it(s"$name plans bnlj=$bnlj bhj=$bhj smj=$smj shuffles=$shuf") {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val p = df.queryExecution.executedPlan.toString
        assert(occurrences(p, "BroadcastNestedLoopJoin") == bnlj,
          s"BroadcastNestedLoopJoin drift — the q190-class regression:\n$p")
        assert(occurrences(p, "BroadcastHashJoin") == bhj,
          s"BroadcastHashJoin count drift (a dim stopped broadcasting?):\n$p")
        assert(occurrences(p, "SortMergeJoin") == smj,
          s"SortMergeJoin count drift (a broadcast fell to SMJ?):\n$p")
        val shuffles = Seq("Exchange hashpartitioning",
          "Exchange rangepartitioning", "Exchange SinglePartition")
          .map(occurrences(p, _)).sum
        assert(shuffles == shuf,
          s"shuffle-Exchange count drift ($shuffles != $shuf):\n$p")
      }
    }

    it("q02_top_orders takes its global top-k without a sort shuffle") {
      val p = graft.SparkEntry.queries("q02_top_orders")(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject"), p)
    }

    it("q208_dynamic_pruning keeps its dynamicpruning subquery") {
      val o = graft.SparkEntry.queries("q208_dynamic_pruning")(spark, dir)
        .queryExecution.optimizedPlan.toString
      assert(o.contains("dynamicpruning"), o)
    }
  }
}
