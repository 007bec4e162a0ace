package graft.queries

import graft.{QueryModule, Tables}
import graft.functions.ExactAgg._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator coverage over the driver tables (SURVEY.md §2.2):
  * aggregation, broadcast/shuffle joins, semi/anti joins, windows, top-k,
  * set ops, rollup, string/date/math/array/JSON scalar functions.
  *
  * The reference itself has almost none of these (kinesis-s3 is a fixed
  * ETL dataflow — SURVEY.md §2.2 marks joins/windows/set-ops Absent), but
  * the engine exposes the full Spark SQL surface; these queries pin its
  * semantics against the DuckDB oracle.
  *
  * Scale notes (100 TB): dimension joins (`nation`, `region`) are
  * `broadcast()` so the fact side never shuffles for them; fact-fact joins
  * (lineitem ⋈ orders) shuffle on the join key and rely on AQE for
  * runtime coalescing/skew handling; every aggregate uses partial
  * (map-side) aggregation via built-in hash aggregates; sums are exact
  * decimals so results don't drift with the reduction tree shape.
  */
object Relational extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** TPC-H Q1-style pricing summary: partial-agg heavy scan. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1999-09-01 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumWide(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Top-k: global order + limit with a unique tie-break key. */
  def topOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Star join: fact ⋈ dim ⋈ dim with broadcast dims. */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))
  }

  /** Left-semi join (EXISTS). */
  def customersWithBigOrders(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      
  }

  /** Left-anti join (NOT EXISTS). */
  def customersWithoutUrgent(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_acctbal"))
      
  }

  /** Window functions: ranking + lag over a deterministic unique ordering. */
  def topOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rnk"), col("prev_price"))
      
  }

  /** Set operations: INTERSECT / EXCEPT with distinct semantics. */
  def setOpsUsers(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    def users(tpe: String) =
      e.filter(col("event_type") === tpe).select(col("user_id")).distinct()
    users("purchase").intersect(users("signup")).except(users("error"))
      .orderBy(col("user_id"))
  }

  /** ROLLUP hierarchy totals (null grouping slots coalesced to 'ALL' so
    * both engines agree on representation).
    */
  def acctbalRollup(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_cust"), col("total_bal"))
      .orderBy(col("region_name"), col("nation_name"))
  }

  /** String scalar functions, per-row (deterministic, no agg ordering). */
  def stringFns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("uname"),
      substring(col("p_name"), 1, 5).as("pfx"),
      length(col("p_name")).cast(LongType).as("len"),
      regexp_replace(col("p_name"), "[aeiou]", "").as("novowels"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      split(col("p_name"), " ").getItem(0).as("first_tok"),
      size(split(col("p_name"), " ")).cast(LongType).as("ntok"),
      lpad(col("p_brand"), 12, "#").as("padded"),
      reverse(col("p_name")).as("rev"))
      

  /** Date/time functions: truncation, extraction, arithmetic. */
  def dateFns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        date_trunc("month", col("o_orderdate")).as("order_month"),
        year(col("o_orderdate")).cast(LongType).as("order_year"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("month_revenue"))
      .orderBy(col("order_month"))

  /** JSON extraction from the events `props` column. */
  def jsonFns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        sum(get_json_object(col("props"), "$.k").cast(LongType)).as("sum_k"),
        max(get_json_object(col("props"), "$.k").cast(LongType)).as("max_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Distinct aggregation. */
  def distinctUsers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Fact-fact shuffle join: lineitem ⋈ orders, revenue by priority. */
  def revenueByPriority(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        dsumWide(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  /** The same fact-fact join as q13 through BUCKETED tables: both sides
    * bucketed on the order key ONCE per session (`ensureBucketed` — the
    * amortized write), then the join reads buckets 1:1 — zero Exchange
    * nodes in the join plan (BucketingSpec asserts that). Bench timing
    * therefore reflects the warehouse steady state: the warmup pass
    * pays the one-time write, timed passes measure the Exchange-free
    * join (VERDICT r3 flagged the old conflated number).
    */
  def bucketedRevenue(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bucketing
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val liTable = s"graft_li_bkt_$tag"
    val oTable = s"graft_or_bkt_$tag"
    Bucketing.ensureBucketed(
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      liTable, "l_orderkey", numBuckets = 8)
    Bucketing.ensureBucketed(
      t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
      oTable, "l_orderkey", numBuckets = 8)
    Bucketing.bucketedJoin(s, liTable, oTable, "l_orderkey")
      .groupBy(col("o_orderpriority"))
      .agg(
        dsumWide(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  /** Range-clustered layout round-trip (q62): lineitem staged through
    * `Staging.ensureFresh` + `Layout.writeClustered` — rebuilt only when
    * the SOURCE's size+mtime signature changes, so warmup pays the
    * layout cost and timed passes measure the clustered scan (the q47
    * amortization discipline; a per-call rewrite would re-conflate
    * write and read) — then read back with a pushed-down filter and
    * aggregated. The oracle computes the same aggregate on the ORIGINAL
    * table, proving the layout rewrite changes scan cost, never data.
    */
  def clusteredLayout(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val outP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"clustered_$tag")
    val out = outP.toString
    graft.Staging.ensureFresh(java.nio.file.Paths.get(dir, "lineitem.parquet"), outP) {
      Layout.writeClustered(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity")),
        out, Seq("l_orderkey"), numRanges = 8, maxRecordsPerFile = 100000L)
    }
    s.read.parquet(out)
      .filter(col("l_orderkey") % 10 === 0)
      .groupBy((col("l_orderkey") % 100).as("okey_bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("okey_bucket"))
  }

  /** q88: the q62 clustered-layout round-trip through the ORC sink —
    * the second columnar format (built into Spark, no extra deps).
    * Sharing q62's oracle pins that the layout discipline (disjoint
    * ranges, in-file sort, bounded file size) is format-agnostic: the
    * same data comes back through `spark.read.orc` with ORC's own
    * min/max stripe statistics serving the pruning role parquet
    * footers play in q62.
    */
  def orcLayout(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val outP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"orc_clustered_$tag")
    val out = outP.toString
    graft.Staging.ensureFresh(java.nio.file.Paths.get(dir, "lineitem.parquet"), outP) {
      Layout.writeClustered(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity")),
        out, Seq("l_orderkey"), numRanges = 8, maxRecordsPerFile = 100000L,
        format = "orc")
    }
    s.read.orc(out)
      .filter(col("l_orderkey") % 10 === 0)
      .groupBy((col("l_orderkey") % 100).as("okey_bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("okey_bucket"))
  }

  /** q116: Z-order (Morton-curve) layout round-trip — the 2-D answer
    * where q62's single-key clustering only serves x-leading queries.
    * lineitem is staged through `Staging.ensureFresh` +
    * `Layout.writeZOrdered` on two derived 8-bit dimensions (rebuilt
    * only on a source-signature change, so warmup pays the one-time
    * layout and timed passes measure the tiled scan, as q62/q88), then
    * read back with a 2-D BOX
    * predicate and aggregated per 32×32 tile. The interleaved `zval` is
    * kept in the files and surfaced as min_z/max_z per tile, so the
    * oracle REPLAYS the bit interleave in SQL — a wrong interleave, a
    * dropped row, or a mangled value all hash-mismatch. LayoutSpec
    * separately asserts from the parquet footers that file zval ranges
    * are disjoint — the property a stats-aware scan prunes boxes with.
    */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val outP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"zorder_$tag")
    val out = outP.toString
    // ensure-once keyed on the SOURCE's identity, not bare existence —
    // a testdata regeneration forces the layout rebuild (VERDICT r7 #2)
    graft.Staging.ensureFresh(java.nio.file.Paths.get(dir, "lineitem.parquet"), outP) {
      Layout.writeZOrdered(
        t(s, dir, "lineitem").select(
          (col("l_partkey") % 256).as("x"),
          (col("l_suppkey") % 256).as("y"),
          col("l_quantity")),
        out, "x", "y", numRanges = 8, bitsPer = 8, maxRecordsPerFile = 100000L)
    }
    s.read.parquet(out)
      .filter(col("x").between(32, 95) && col("y").between(64, 127))
      .groupBy(expr("x DIV 32").as("tile_x"), expr("y DIV 32").as("tile_y"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
        min(col("zval")).as("min_z"), max(col("zval")).as("max_z"))
      .orderBy(col("tile_x"), col("tile_y"))
  }

  /** q140: the Hilbert-curve sibling of q116 — same box-predicate tile
    * aggregation over a curve-clustered write, but consecutive indices
    * are always ADJACENT cells (no Morton quadrant jumps), so
    * equal-count index ranges tile more compactly. The oracle replays
    * the xy→d bit loop as an 8-step CTE chain of identical integer
    * arithmetic. */
  def hilbertLayout(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val outP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"hilbert_$tag")
    val out = outP.toString
    graft.Staging.ensureFresh(java.nio.file.Paths.get(dir, "lineitem.parquet"), outP) {
      Layout.writeHilbert(
        t(s, dir, "lineitem").select(
          (col("l_partkey") % 256).as("x"),
          (col("l_suppkey") % 256).as("y"),
          col("l_quantity")),
        out, "x", "y", numRanges = 8, bitsPer = 8, maxRecordsPerFile = 100000L)
    }
    s.read.parquet(out)
      .filter(col("x").between(32, 95) && col("y").between(64, 127))
      .groupBy(expr("x DIV 32").as("tile_x"), expr("y DIV 32").as("tile_y"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
        min(col("hval")).as("min_h"), max(col("hval")).as("max_h"))
      .orderBy(col("tile_x"), col("tile_y"))
  }

  /** q158: 3-dimensional Z-order layout (VERDICT r8 #6) — real pruning
    * workloads cluster on 3–4 dims (lang × quality-decile × day); this
    * pins `Layout.zOrderValueN` at d=3: lineitem staged on three
    * derived 6-bit dimensions (bit b of dim j at position 3b+j, 18-bit
    * zval), read back with a 3-D BOX predicate, aggregated per
    * 16×16×16 tile with min_z/max_z surfaced so the oracle replays the
    * FULL interleave in SQL — a wrong bit position, clamp, or dim order
    * all hash-mismatch. LayoutSpec asserts footer disjointness of the
    * zval ranges (the file-skip property) separately.
    */
  def zorder3Layout(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val outP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"zorder3_$tag")
    val out = outP.toString
    graft.Staging.ensureFresh(java.nio.file.Paths.get(dir, "lineitem.parquet"), outP) {
      Layout.writeZOrderedN(
        t(s, dir, "lineitem").select(
          (col("l_partkey") % 64).as("x"),
          (col("l_suppkey") % 64).as("y"),
          (col("l_orderkey") % 64).as("w"),
          col("l_quantity")),
        out, Seq("x", "y", "w"), numRanges = 8, bitsPer = 6,
        maxRecordsPerFile = 100000L)
    }
    s.read.parquet(out)
      .filter(col("x").between(16, 47) && col("y").between(32, 63) &&
        col("w").between(8, 39))
      .groupBy(expr("x DIV 16").as("tile_x"), expr("y DIV 16").as("tile_y"),
        expr("w DIV 16").as("tile_w"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
        min(col("zval")).as("min_z"), max(col("zval")).as("max_z"))
      .orderBy(col("tile_x"), col("tile_y"), col("tile_w"))
  }

  /** q161: VARIANT semi-structured columns (Spark 4's open-format
    * answer to schema-on-read JSON — parse once to a binary-encoded
    * variant, extract typed paths without re-parsing text per access):
    * a nested JSON document is synthesized per event (`to_json` over
    * structs/arrays so number formatting never forks engines), parsed
    * with `parse_json`, and probed with typed `variant_get` paths —
    * nested object field, array index, and a missing path through
    * `try_variant_get` (null, never an error). The oracle replays the
    * SOURCE arithmetic the JSON was built from, so a wrong extraction,
    * type coercion, or path semantics all hash-mismatch.
    */
  def variantJson(s: SparkSession, dir: String): DataFrame = {
    val doc = to_json(struct(
      col("event_id").as("id"),
      struct(col("event_type").as("type"),
        round(col("value") * 100).cast("long").as("cents")).as("meta"),
      array((col("user_id") % 5).cast("long"),
        (col("user_id") % 3).cast("long")).as("tags")))
    t(s, dir, "events")
      .select(col("event_type"), parse_json(doc).as("v"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("variant_get(v, '$.meta.cents', 'long')")).as("sum_cents"),
        sum(expr("variant_get(v, '$.tags[0]', 'long')")).as("sum_tag0"),
        max(expr("variant_get(v, '$.id', 'long')")).as("max_id"),
        sum(when(expr("try_variant_get(v, '$.missing', 'long')").isNull, 1L)
          .otherwise(0L)).as("n_missing"))
      .orderBy(col("event_type"))
  }

  private val q161Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
      | CAST(SUM(user_id % 5) AS BIGINT) AS sum_tag0,
      | MAX(event_id) AS max_id,
      | COUNT(*) AS n_missing
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q162: SQL pipe syntax (Spark 4 / SQL:2023-style `|>` chains — the
    * linear form of nested SELECTs: FROM → WHERE → AGGREGATE → ORDER
    * reads in execution order). The WHOLE query text is pipe-syntax
    * `spark.sql`, pinning that the parser lowers it to the identical
    * plan classic SQL produces: the oracle is the classic form.
    */
  def pipeSql(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("graft_q162_lineitem")
    s.sql(
      """FROM graft_q162_lineitem
        ||> WHERE l_quantity >= 25
        ||> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        ||> AGGREGATE COUNT(*) AS n,
        |     CAST(SUM(CAST(disc_price AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |   GROUP BY l_returnflag, l_linestatus
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .select(col("l_returnflag"), col("l_linestatus"), col("n"), col("revenue"))
  }

  private val q162Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE)
      |   AS revenue
      |FROM lineitem WHERE l_quantity >= 25
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q163: collated string comparisons (Spark 4 collation support —
    * locale/case semantics attached to the TYPE, so every comparison,
    * predicate, and string function under it is collation-aware instead
    * of wrapped in lower()): per event type, the same strings restyled
    * per row parity (initcap / UPPER) compare equal under UTF8_LCASE,
    * unequal under binary, and a collated startswith matches a
    * mixed-case literal. The oracle replays the semantics with
    * explicit lower() — collation must equal the rewrite it replaces.
    */
  def collationFns(s: SparkSession, dir: String): DataFrame = {
    val styled = when(col("event_id") % 2 === 0, initcap(col("event_type")))
      .otherwise(upper(col("event_type")))
    def lcase(c: Column) = collate(c, "UTF8_LCASE")
    t(s, dir, "events")
      .select(col("event_type"), styled.as("styled"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(lcase(col("styled")) === lcase(col("event_type")), 1L)
          .otherwise(0L)).as("n_ci_eq"),
        sum(when(col("styled") === col("event_type"), 1L).otherwise(0L)).as("n_bin_eq"),
        sum(when(lcase(col("styled")).startsWith(lit("CL")), 1L)
          .otherwise(0L)).as("n_ci_prefix"))
      .orderBy(col("event_type"))
  }

  private val q163Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(CASE WHEN lower(CASE WHEN event_id % 2 = 0
      |     THEN concat(upper(event_type[1]), event_type[2:])
      |     ELSE upper(event_type) END) = lower(event_type)
      |   THEN 1 ELSE 0 END) AS BIGINT) AS n_ci_eq,
      | CAST(SUM(CASE WHEN (CASE WHEN event_id % 2 = 0
      |     THEN concat(upper(event_type[1]), event_type[2:])
      |     ELSE upper(event_type) END) = event_type
      |   THEN 1 ELSE 0 END) AS BIGINT) AS n_bin_eq,
      | CAST(SUM(CASE WHEN lower(event_type) LIKE 'cl%' THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_ci_prefix
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q166: retention cohort matrix — the product-analytics staple no
    * earlier row covers: users cohorted by FIRST-ACTIVITY day, then
    * for each (cohort, day-offset) cell the count of distinct cohort
    * members active that day. Two aggregations: per-user first day
    * (map-side combinable min), then distinct (cohort, offset, user)
    * collapse — no window, no self-join; datediff is exact integer
    * calendar arithmetic both engines share.
    */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    ev.join(cohorts, "user_id")
      .select(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  private val q166Sql: String =
    """WITH ev AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
      |c AS (SELECT user_id, MIN(day) AS cohort FROM ev GROUP BY user_id)
      |SELECT cohort, CAST(date_diff('day', cohort, day) AS INT) AS day_offset,
      |  COUNT(DISTINCT ev.user_id) AS n_users
      |FROM ev JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin

  /** q167: SCD Type-2 dimension build — the lakehouse versioned-
    * dimension shape that completes the CDC story (q143/q157/q164
    * maintain LATEST-wins snapshots; warehouses equally need the full
    * version HISTORY): every change event becomes a validity interval
    * [valid_from, valid_to) via one lead() over the per-key
    * (ts, event_id) total order, the open current version flagged.
    * One key-partitioned window, rows = events — linear, no self-join.
    * Sampled to every 20th user to keep the pin row-bounded.
    */
  def scd2Build(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .filter(col("user_id") % 20 === 0)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"), col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("cents"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  private val q167Sql: String =
    """SELECT user_id, event_id,
      |  CAST(round(value * 100, 0) AS BIGINT) AS cents,
      |  ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    AS is_current
      |FROM events WHERE user_id % 20 = 0
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  /** q203: SCD2 INCREMENTAL apply — the nightly-merge form of q167's
    * from-scratch build: history up to the cut day is the existing
    * dimension; the post-cut slice arrives as a change batch. The
    * apply (1) chains the batch's own versions with one window over the
    * BATCH only, (2) closes each touched user's open row at that user's
    * first batch timestamp via one broadcast-sized (user → first-change)
    * join, (3) unions — the dimension is never rebuilt and never
    * re-windowed, so the nightly cost tracks the CHANGE batch, not the
    * dimension (the q157 copy-on-write economics at the logical level).
    * The oracle is the FULL REBUILD over all data: a green row proves
    * incremental ≡ rebuild, the whole point of the pattern.
    */
  def scd2Apply(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-20").cast(DateType)
    val ev = t(s, dir, "events")
      .filter(col("user_id") % 20 === 0)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"), col("ts"))
    def versions(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      df.withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("cents"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
    }
    val base = versions(ev.filter(to_date(col("ts")) <= cut))
    val batch = ev.filter(to_date(col("ts")) > cut)
    val firstNew = batch.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
    val closed = base.join(broadcast(firstNew), Seq("user_id"), "left")
      .select(col("user_id"), col("event_id"), col("cents"), col("valid_from"),
        when(col("is_current") && col("first_ts").isNotNull, col("first_ts"))
          .otherwise(col("valid_to")).as("valid_to"),
        (col("is_current") && col("first_ts").isNull).as("is_current"))
    closed.unionByName(versions(batch))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  private val q203Sql: String =
    """SELECT user_id, event_id,
      |  CAST(round(value * 100, 0) AS BIGINT) AS cents,
      |  ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    AS is_current
      |FROM events WHERE user_id % 20 = 0
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  /** q168: deterministic bivariate regression stats — corr / covar /
    * least-squares slope+intercept WITHOUT the float-fold trap: the
    * built-in `corr`/`covar_samp` aggregate doubles in partition order
    * (cluster-nondeterministic low bits), so instead the five moments
    * (Σx, Σy, Σxy, Σx², Σy²) are summed EXACTLY as decimals over
    * integer-valued inputs, and the float formulas are applied ONCE at
    * the end to identical exact operands — both engines perform the
    * same int→double roundings and IEEE ops, so even the doubles are
    * bit-identical. The moments themselves are part of the pin.
    */
  def regressionStats(s: SparkSession, dir: String): DataFrame = {
    val x = round(col("value") * 100).cast("long")
    val y = (col("user_id") % 97).cast("long")
    t(s, dir, "events")
      .select(col("event_type"), x.as("x"), y.as("y"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 0))).cast("long").as("sx"),
        sum(col("y").cast(org.apache.spark.sql.types.DecimalType(38, 0))).cast("long").as("sy"),
        sum((col("x") * col("y")).cast(org.apache.spark.sql.types.DecimalType(38, 0))).cast("long").as("sxy"),
        sum((col("x") * col("x")).cast(org.apache.spark.sql.types.DecimalType(38, 0))).cast("long").as("sxx"),
        sum((col("y") * col("y")).cast(org.apache.spark.sql.types.DecimalType(38, 0))).cast("long").as("syy"))
      .select(col("event_type"), col("n"), col("sx"), col("sy"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))).as("corr"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("slope"))
      .orderBy(col("event_type"))
  }

  private val q168Sql: String =
    """WITH m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM (SELECT event_type,
      |          CAST(round(value * 100, 0) AS BIGINT) AS x,
      |          user_id % 97 AS y
      |        FROM events)
      |  GROUP BY event_type)
      |SELECT event_type, n, sx, sy,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
      |    AS corr,
      |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
      |FROM m ORDER BY event_type""".stripMargin

  /** q169: higher-order array-function battery — `transform` / `filter`
    * / `exists` / `aggregate` (fold) / `zip_with` over the token arrays,
    * the lambda surface every array-shaped feature pipeline leans on.
    * Each engine folds INSIDE one row (no cross-row float order), all
    * arithmetic integer. The zip pairs each token length with its
    * mirror (a palindromic dot product) so index arithmetic is pinned
    * too, via a `range` replay on the DuckDB side.
    */
  def hofBattery(s: SparkSession, dir: String): DataFrame = {
    val toks = graft.functions.TextFns.tokens(col("text"))
    t(s, dir, "documents")
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), toks.as("t"))
      .select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_tok"),
        expr("aggregate(t, 0L, (acc, x) -> acc + length(x))").as("sum_len"),
        size(expr("filter(t, x -> length(x) > 4)")).cast("long").as("n_long"),
        expr("exists(t, x -> x = 'the')").as("has_the"),
        expr("aggregate(zip_with(t, reverse(t), (a, b) -> length(a) * length(b)), 0L, (acc, v) -> acc + v)")
          .as("mirror_dot"))
      .orderBy(col("doc_id"))
  }

  private val q169Sql: String =
    """WITH base AS (
      |  SELECT doc_id, string_split(text, ' ') AS t,
      |    list_transform(string_split(text, ' '), x -> len(x)) AS ll
      |  FROM documents WHERE doc_id % 4 = 0)
      |SELECT doc_id,
      |  CAST(len(t) AS BIGINT) AS n_tok,
      |  CAST(list_sum(ll) AS BIGINT) AS sum_len,
      |  CAST(len(list_filter(t, x -> len(x) > 4)) AS BIGINT) AS n_long,
      |  list_contains(t, 'the') AS has_the,
      |  CAST(list_sum(list_transform(range(1, len(t) + 1),
      |    i -> ll[i] * ll[len(t) + 1 - i])) AS BIGINT) AS mirror_dot
      |FROM base ORDER BY doc_id""".stripMargin

  /** q172: ANALYZE-style table statistics — per-column row count, null
    * count, exact NDV, and the HLL++ estimate certified within 5% of
    * truth (the q61 contract; at 100 TB the exact leg drops and the
    * sketch is the statistic). One scan for ALL columns via a single
    * multi-aggregate + `stack` unpivot ([[graft.operators.Analyze
    * .tableStats]]); the props column is nulled on a deterministic
    * slice so the null accounting is non-trivial.
    */
  def tableStats(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analyze.tableStats(
      t(s, dir, "events").select(
        col("event_id"), col("user_id"), col("event_type"),
        when(col("event_id") % 7 =!= 0, col("props")).as("props")),
      Seq(
        "event_id" -> col("event_id"),
        "user_id" -> col("user_id"),
        "event_type" -> col("event_type"),
        "props" -> col("props")))
      .orderBy(col("col_name"))

  private val q172Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |    CASE WHEN event_id % 7 <> 0 THEN props END AS props
      |  FROM events)
      |SELECT 'event_id' AS col_name, COUNT(*) AS n,
      |  CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
      |  COUNT(DISTINCT event_id) AS ndv, TRUE AS hll_ok FROM e
      |UNION ALL
      |SELECT 'event_type', COUNT(*), CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
      |  COUNT(DISTINCT event_type), TRUE FROM e
      |UNION ALL
      |SELECT 'props', COUNT(*), CAST(COUNT(*) - COUNT(props) AS BIGINT),
      |  COUNT(DISTINCT props), TRUE FROM e
      |UNION ALL
      |SELECT 'user_id', COUNT(*), CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
      |  COUNT(DISTINCT user_id), TRUE FROM e
      |ORDER BY col_name""".stripMargin

  /** q173: robust dispersion stats — median, MAD (median absolute
    * deviation), and the 5–95% winsorized mean per event type: the
    * outlier-resistant scale/center estimates numeric-metadata gates
    * use where mean/stddev break under heavy tails. Two passes by
    * definition (deviations need the median); quantiles are Spark's
    * exact interpolated `percentile` ≡ DuckDB `quantile_cont` (the q34
    * precedent), the winsorized mean an exact decimal sum over clipped
    * values with ONE final division.
    */
  def robustStats(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    val base = t(s, dir, "events")
      .select(col("event_type"), cents.as("c"))
    val med = base.groupBy(col("event_type"))
      .agg(expr("percentile(c, 0.5)").as("med"),
        expr("percentile(c, 0.05)").as("p05"),
        expr("percentile(c, 0.95)").as("p95"))
    base.join(broadcast(med), "event_type")
      .select(col("event_type"), col("c"), col("med"), col("p05"), col("p95"),
        abs(col("c") - col("med")).as("dev"),
        least(greatest(col("c").cast("double"), col("p05")), col("p95")).as("w"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        max(col("med")).as("med"),
        expr("percentile(dev, 0.5)").as("mad"),
        (sum(col("w").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .cast("double") / count(lit(1))).as("w_mean"))
      .orderBy(col("event_type"))
  }

  private val q173Sql: String =
    """WITH base AS (
      |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c FROM events),
      |med AS (
      |  SELECT event_type, quantile_cont(c, 0.5) AS med,
      |    quantile_cont(c, 0.05) AS p05, quantile_cont(c, 0.95) AS p95
      |  FROM base GROUP BY event_type)
      |SELECT base.event_type, COUNT(*) AS n, MAX(med.med) AS med,
      |  quantile_cont(abs(base.c - med.med), 0.5) AS mad,
      |  CAST(SUM(CAST(least(greatest(CAST(base.c AS DOUBLE), med.p05), med.p95)
      |    AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS w_mean
      |FROM base JOIN med USING (event_type)
      |GROUP BY base.event_type ORDER BY base.event_type""".stripMargin

  /** q175: partition-scoped DELETE on the CDC snapshot — the
    * right-to-be-forgotten purge with q157's partial-rewrite economics
    * (q146 audits deletion across derived TABLES; this pins deletion
    * inside the bucketed SNAPSHOT itself): a batch latest-wins snapshot
    * is laid out as 15 `user_id mod 15` buckets, tombstones
    * (`user_id % 45 = 0` — all landing in bucket 0 by construction)
    * are purged via `Layout.deletePartitioned`, and the untouched-
    * bucket file signatures are AUDITED IN-PIN: 14 of 15 buckets must
    * be physically identical after the purge or the row goes red.
    */
  def cdcDelete(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    val scratch = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_work",
      s"q175_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val snap = scratch.resolve("snapshot").toString
    val bucketExpr = pmod(col("user_id"), lit(15L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val winners = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    Layout.writeBucketed(winners, snap, bucketExpr)
    val tombs = t(s, dir, "events")
      .filter(col("user_id") % 45 === 0).select(col("user_id")).distinct()
    val before = Layout.bucketFileSignatures(s, snap)
    val touched = Layout.deletePartitioned(
      s, snap, tombs, Seq("user_id"), bucketExpr).toSet
    val after = Layout.bucketFileSignatures(s, snap)
    val untouched = before.keySet.diff(touched)
    require(untouched.size >= 14,
      s"cdcDelete: expected >=14 untouched buckets, got ${untouched.size}")
    untouched.foreach { b =>
      require(before(b) == after(b), s"cdcDelete: untouched bucket $b was rewritten")
    }
    val res = s.read.parquet(snap)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .orderBy(col("user_id"))
      .localCheckpoint(true)
    graft.Staging.deleteRecursively(scratch)
    res
  }

  private val q175Sql: String =
    """WITH rk AS (
      |  SELECT user_id, ts, event_id, value, ROW_NUMBER() OVER (
      |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, ts, event_id, value FROM rk
      |WHERE rn = 1 AND user_id % 45 <> 0
      |ORDER BY user_id""".stripMargin

  /** q176: explode-family NULL/empty semantics battery — the lateral-
    * view parity minefield the q148 NULL battery doesn't reach: for a
    * three-way column (2-element array / empty array / NULL array),
    * inner `explode` drops BOTH empty and NULL inputs while
    * `posexplode_outer` keeps each as ONE null-valued row, and the pos
    * index is 0-based. Both frames reduce per event type and join; the
    * oracle replays the row algebra arithmetically (no unnest needed —
    * the CONTRACT is the row counts and sums, stated in closed form).
    */
  def explodeBattery(s: SparkSession, dir: String): DataFrame = {
    val arr = when(col("user_id") % 3 === 1, lit(null).cast("array<long>"))
      .when(col("user_id") % 3 === 0, array().cast("array<long>"))
      .otherwise(array(col("user_id") % 10, (col("event_id") % 10) + 100))
    val base = t(s, dir, "events").select(col("event_type"), arr.as("a"))
    val outer = base
      .select(col("event_type"), posexplode_outer(col("a")).as(Seq("pos", "v")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_outer"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null_rows"),
        sum(coalesce(col("pos"), lit(0))).cast("long").as("sum_pos"),
        sum(coalesce(col("v"), lit(0L))).as("sum_v"))
    val inner = base
      .select(col("event_type"), explode(col("a")).as("v"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_inner"))
    outer.join(inner, "event_type")
      .select(col("event_type"), col("n_outer"), col("n_inner"),
        col("n_null_rows"), col("sum_pos"), col("sum_v"))
      .orderBy(col("event_type"))
  }

  private val q176Sql: String =
    """WITH e AS (
      |  SELECT event_type, user_id % 3 AS m, user_id % 10 AS v1,
      |    (event_id % 10) + 100 AS v2
      |  FROM events)
      |SELECT event_type,
      |  CAST(SUM(CASE WHEN m = 2 THEN 2 ELSE 1 END) AS BIGINT) AS n_outer,
      |  CAST(SUM(CASE WHEN m = 2 THEN 2 ELSE 0 END) AS BIGINT) AS n_inner,
      |  CAST(SUM(CASE WHEN m = 2 THEN 0 ELSE 1 END) AS BIGINT) AS n_null_rows,
      |  CAST(SUM(CASE WHEN m = 2 THEN 1 ELSE 0 END) AS BIGINT) AS sum_pos,
      |  CAST(SUM(CASE WHEN m = 2 THEN v1 + v2 ELSE 0 END) AS BIGINT) AS sum_v
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q177: try_* error-safe function battery — the ANSI-mode safety
    * valves a shared-cluster deployment runs with (a single bad row
    * must yield NULL, never kill a 100 TB job): `try_divide` on a
    * zero-carrying denominator, `try_add` at the int64 overflow
    * boundary, `try_cast` over a mixed numeric/word column. Double
    * results are pinned via min/max (order-free), never a float sum.
    */
  def tryFns(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    t(s, dir, "events")
      .select(col("event_type"),
        expr(s"try_divide(${"round(value * 100)"}, user_id % 5)").as("d"),
        expr(s"try_add(${Long.MaxValue - 1000}L, cast(round(value * 100) as bigint))").as("ad"),
        when(col("event_id") % 2 === 0, cents.cast("string"))
          .otherwise(col("event_type")).as("mixed"))
      .withColumn("c", expr("try_cast(mixed AS BIGINT)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("d").isNull, 1L).otherwise(0L)).as("n_div_null"),
        min(col("d")).as("min_div"), max(col("d")).as("max_div"),
        sum(when(col("ad").isNull, 1L).otherwise(0L)).as("n_add_null"),
        count(col("c")).as("n_cast_ok"),
        sum(col("c")).as("sum_cast"))
      .orderBy(col("event_type"))
  }

  private val q177Sql: String =
    s"""WITH e AS (
       |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
       |    user_id % 5 AS den, event_id % 2 = 0 AS is_num
       |  FROM events)
       |SELECT event_type, COUNT(*) AS n,
       |  CAST(SUM(CASE WHEN den = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
       |  MIN(CAST(cents AS DOUBLE) / NULLIF(den, 0)) AS min_div,
       |  MAX(CAST(cents AS DOUBLE) / NULLIF(den, 0)) AS max_div,
       |  CAST(SUM(CASE WHEN CAST(${Long.MaxValue - 1000L} AS HUGEINT) + cents
       |      > ${Long.MaxValue} THEN 1 ELSE 0 END) AS BIGINT) AS n_add_null,
       |  CAST(SUM(CASE WHEN is_num THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_ok,
       |  CAST(SUM(CASE WHEN is_num THEN cents END) AS BIGINT) AS sum_cast
       |FROM e
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q178: trailing-window anomaly flags — the ingest-monitoring gate a
    * production pipeline runs on its own daily volumes (a source whose
    * count jumps away from its recent behavior is drift or an outage,
    * q136's KL being the content-side twin): per (type, day), the
    * TRAILING-7-observed-days median and range over a ROWS frame
    * (exclusive of the current day), and the exact integer rule
    * `|c − med7|·2 > range7` flags the day. Median of ≤7 ints is
    * half-integer-exact; everything else integer — no float folds, so
    * the flag is engine- and partitioning-exact (a stddev-based z-score
    * would fork on aggregation algebra). Days without a full 7-day
    * history emit unflagged (warm-up totality).
    */
  def anomalyFlags(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily
      .withColumn("n7", count(col("c")).over(w))
      .withColumn("med7", expr("percentile(c, 0.5)")
        .over(w))
      .withColumn("range7", max(col("c")).over(w) - min(col("c")).over(w))
      .select(col("event_type"), col("day"), col("c"),
        when(col("n7") === 7, col("med7")).as("med7"),
        when(col("n7") === 7, col("range7")).as("range7"),
        (col("n7") === 7 &&
          abs(col("c") - col("med7")) * 2 > col("range7")).as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  private val q178Sql: String =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |win AS (
      |  SELECT event_type, day, c,
      |    COUNT(c) OVER w AS n7,
      |    quantile_cont(c, 0.5) OVER w AS med7,
      |    MAX(c) OVER w - MIN(c) OVER w AS range7
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, day, c,
      |  CASE WHEN n7 = 7 THEN med7 END AS med7,
      |  CASE WHEN n7 = 7 THEN range7 END AS range7,
      |  n7 = 7 AND abs(c - med7) * 2 > range7 AS is_anomaly
      |FROM win ORDER BY event_type, day""".stripMargin

  /** q181: datetime battery — the calendar/zone surface an event
    * pipeline leans on daily: ISO-week truncation, day-of-week, UTC→zone
    * conversion (a whole-hour zone and a +08:45 fractional-offset zone,
    * so the offset arithmetic is pinned beyond "add N hours"), month-end
    * (`last_day`), month arithmetic with end-clamping (`add_months`),
    * epoch-hour bucketing, and day differences. Every output is an
    * integer aggregate or a formatted date string — no engine-local
    * timestamp formatting reaches the compare. Per-row projections +
    * one hash aggregate: codegen, no shuffle beyond the groupBy.
    */
  def datetimeBattery(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"), col("ts"), to_date(col("ts")).as("d"))
      .select(col("event_type"),
        date_trunc("week", col("ts")).as("wk"),
        dayofweek(col("ts")).as("dow"),
        hour(from_utc_timestamp(col("ts"), "America/New_York")).as("ny_h"),
        hour(from_utc_timestamp(col("ts"), "Australia/Eucla")).as("eucla_h"),
        minute(from_utc_timestamp(col("ts"), "Australia/Eucla")).as("eucla_m"),
        last_day(col("d")).as("ld"),
        date_format(add_months(col("d"), 2), "yyyy-MM-dd").as("am"),
        floor(unix_micros(col("ts")) / 3600000000L).as("eh"),
        datediff(lit("2024-12-01").cast(DateType), col("d")).as("dd"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("wk")).as("n_weeks"),
        sum(col("dow").cast(LongType)).as("sum_dow"),
        sum(col("ny_h").cast(LongType)).as("sum_ny_hour"),
        sum(col("eucla_h").cast(LongType)).as("sum_eucla_hour"),
        sum(col("eucla_m").cast(LongType)).as("sum_eucla_min"),
        countDistinct(col("ld")).as("n_month_ends"),
        max(col("am")).as("max_add2m"),
        countDistinct(col("eh")).as("n_epoch_hours"),
        sum(col("dd").cast(LongType)).as("sum_days_to_dec"))
      .orderBy(col("event_type"))

  private val q181Sql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    date_trunc('week', ts) AS wk,
      |    dayofweek(ts) + 1 AS dow,
      |    hour(timezone('America/New_York', timezone('UTC', ts))) AS ny_h,
      |    hour(timezone('Australia/Eucla', timezone('UTC', ts))) AS eucla_h,
      |    minute(timezone('Australia/Eucla', timezone('UTC', ts))) AS eucla_m,
      |    last_day(CAST(ts AS DATE)) AS ld,
      |    strftime(CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE), '%Y-%m-%d') AS am,
      |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS eh,
      |    date_diff('day', CAST(ts AS DATE), DATE '2024-12-01') AS dd
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  COUNT(DISTINCT wk) AS n_weeks,
      |  CAST(SUM(dow) AS BIGINT) AS sum_dow,
      |  CAST(SUM(ny_h) AS BIGINT) AS sum_ny_hour,
      |  CAST(SUM(eucla_h) AS BIGINT) AS sum_eucla_hour,
      |  CAST(SUM(eucla_m) AS BIGINT) AS sum_eucla_min,
      |  COUNT(DISTINCT ld) AS n_month_ends,
      |  MAX(am) AS max_add2m,
      |  COUNT(DISTINCT eh) AS n_epoch_hours,
      |  CAST(SUM(dd) AS BIGINT) AS sum_days_to_dec
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q182: decimal-precision battery — exact fixed-scale arithmetic the
    * financial path depends on: (18,2) sums, full-precision (·,4)
    * product sums compared as STRINGS (so every trailing digit is
    * pinned, not a double approximation), and a round-half-up pin built
    * from a scale-5 product whose low digit is exactly 5 on half the
    * rows — the case where truncation, half-even, and half-up all
    * differ. Decimal aggregation is Tungsten-native (UnsafeRow fixed
    * decimals): partial aggregation everywhere, result independent of
    * the reduction tree.
    */
  def decimalBattery(s: SparkSession, dir: String): DataFrame = {
    val price = col("l_extendedprice").cast(DecimalType(18, 2))
    val qty = col("l_quantity").cast(DecimalType(18, 2))
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), price.as("p"), qty.as("q"),
        round(price * lit("0.005").cast(DecimalType(6, 3)), 2).as("r5"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("p")).cast(DoubleType).as("sum_price"),
        sum(col("p") * col("q")).cast(StringType).as("sum_prod_s"),
        sum((col("r5") * 100).cast(LongType)).as("sum_round_cents"),
        min(col("p")).cast(StringType).as("min_price_s"),
        max(col("p")).cast(StringType).as("max_price_s"))
      .orderBy(col("l_returnflag"))
  }

  private val q182Sql: String =
    """WITH l AS (
      |  SELECT l_returnflag,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS q,
      |    ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST('0.005' AS DECIMAL(6,3)), 2) AS r5
      |  FROM lineitem)
      |SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(p) AS DOUBLE) AS sum_price,
      |  CAST(SUM(p * q) AS VARCHAR) AS sum_prod_s,
      |  CAST(SUM(CAST(r5 * 100 AS BIGINT)) AS BIGINT) AS sum_round_cents,
      |  CAST(MIN(p) AS VARCHAR) AS min_price_s,
      |  CAST(MAX(p) AS VARCHAR) AS max_price_s
      |FROM l GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q183: regexp battery — extraction, extract-all counting,
    * replacement, anchors, and alternation over document text, per
    * language. Patterns stay inside the regex subset Java and RE2
    * execute identically (literal classes, +, alternation, anchors,
    * word boundary; no backrefs, no lookaround), which is also the
    * subset that runs at scan speed at 100 TB — all per-row codegen
    * projections, one hash aggregate.
    */
  def regexpBattery(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"),
        size(expr("regexp_extract_all(text, '[aeiou][aeiou]', 0)")).cast(LongType).as("vp"),
        col("text").rlike("data[a-z ]*join|join[a-z ]*data").cast(LongType).as("dj"),
        length(regexp_replace(col("text"), "[aeiou]+", "V")).cast(LongType).as("rl"),
        regexp_extract(col("text"), "\\b(s[a-z]+)", 1).as("sw"),
        col("text").rlike("^[bw]").cast(LongType).as("bw"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("vp")).as("sum_vowel_pairs"),
        sum(col("dj")).as("n_data_join"),
        sum(col("rl")).as("sum_repl_len"),
        min(when(col("sw") =!= "", col("sw"))).as("first_sword"),
        sum(col("bw")).as("n_bw_start"))
      .orderBy(col("lang"))

  private val q183Sql: String =
    """WITH d AS (
      |  SELECT lang,
      |    len(regexp_extract_all(text, '[aeiou][aeiou]')) AS vp,
      |    CASE WHEN regexp_matches(text, 'data[a-z ]*join|join[a-z ]*data')
      |      THEN 1 ELSE 0 END AS dj,
      |    length(regexp_replace(text, '[aeiou]+', 'V', 'g')) AS rl,
      |    regexp_extract(text, '\b(s[a-z]+)', 1) AS sw,
      |    CASE WHEN regexp_matches(text, '^[bw]') THEN 1 ELSE 0 END AS bw
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(vp) AS BIGINT) AS sum_vowel_pairs,
      |  CAST(SUM(dj) AS BIGINT) AS n_data_join,
      |  CAST(SUM(rl) AS BIGINT) AS sum_repl_len,
      |  MIN(CASE WHEN sw <> '' THEN sw END) AS first_sword,
      |  CAST(SUM(bw) AS BIGINT) AS n_bw_start
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  /** q184: argmax/argmin + per-group top-k battery — `max_by`/`min_by`
    * with a STRUCT ordering key (value, then id — ties impossible by
    * construction, so both engines' "an arbitrary maximal row" freedom
    * never bites; O(1) aggregation state), plus the top-3 ids per group
    * as one ordered string via SALTED two-level selection: top-3 per
    * (group, salt) in 64-way parallel windows, then top-3 of the ≤192
    * survivors per group — aggregation state and window tasks both
    * bounded no matter how large a group grows (a collect-the-group
    * aggregate or a per-group window would wall at 100× on few giant
    * groups).
    */
  def argmaxBattery(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"))
    val aggs = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("max_by(event_id, struct(value, event_id))").as("argmax_eid"),
        expr("min_by(event_id, struct(value, event_id))").as("argmin_eid"),
        max(col("value")).as("max_val"))
    val w1 = Window.partitionBy(col("event_type"), col("salt"))
      .orderBy(col("value").desc, col("event_id").desc)
    val w2 = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").desc)
    val top3 = ev.withColumn("salt", pmod(col("event_id"), lit(64L)))
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= 3)
      .withColumn("r2", row_number().over(w2)).filter(col("r2") <= 3)
      .groupBy(col("event_type"))
      .agg(expr("concat_ws(',', transform(array_sort(collect_list(struct(r2, event_id))), x -> cast(x.event_id as string)))")
        .as("top3"))
    aggs.join(top3, "event_type")
      .select(col("event_type"), col("n"), col("argmax_eid"),
        col("argmin_eid"), col("max_val"), col("top3"))
      .orderBy(col("event_type"))
  }

  private val q184Sql: String =
    """WITH r AS (
      |  SELECT event_type, event_id, value,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value DESC, event_id DESC) AS rmax,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value ASC, event_id ASC) AS rmin
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  MAX(CASE WHEN rmax = 1 THEN event_id END) AS argmax_eid,
      |  MAX(CASE WHEN rmin = 1 THEN event_id END) AS argmin_eid,
      |  MAX(value) AS max_val,
      |  string_agg(CASE WHEN rmax <= 3 THEN CAST(event_id AS VARCHAR) END, ','
      |    ORDER BY rmax) AS top3
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q189: calendar gap-fill + linear interpolation — the time-series
    * repair step before any trend model: per user bucket, daily purchase
    * sums on a FULL calendar spine (q156's sequence() idiom), missing
    * days filled two ways — last-observation-carried-forward, and
    * linear interpolation between the surrounding observed days in
    * integer cents (truncated `div`, identical on both engines, so the
    * interpolated values are bit-exact). Shape: one aggregate, a
    * broadcast spine join, two bounded window passes per bucket — no
    * self-join, no per-gap scan; at 100 TB the spine is |buckets|×|days|
    * which is metadata-sized next to the fact table.
    */
  def gapFillInterpolate(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy((col("user_id") % 40).as("ub"), to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100).cast(LongType)).as("cents"))
    val bounds = daily.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
    val spine = daily.select(col("ub")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("ub"), explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
    val wPrev = Window.partitionBy(col("ub")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(col("ub")).orderBy(col("d"))
      .rowsBetween(0, Window.unboundedFollowing)
    spine.join(daily, Seq("ub", "d"), "left")
      .withColumn("locf_cents", last(col("cents"), ignoreNulls = true).over(wPrev))
      .withColumn("pd", last(when(col("cents").isNotNull, col("d")), ignoreNulls = true).over(wPrev))
      .withColumn("nc", first(col("cents"), ignoreNulls = true).over(wNext))
      .withColumn("nd", first(when(col("cents").isNotNull, col("d")), ignoreNulls = true).over(wNext))
      .select(col("ub"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("cents").isNotNull.as("present"), col("cents"), col("locf_cents"),
        when(col("cents").isNotNull, col("cents"))
          .when(col("locf_cents").isNotNull && col("nc").isNotNull,
            col("locf_cents") + call_function("div",
              (col("nc") - col("locf_cents")) * datediff(col("d"), col("pd")).cast(LongType),
              datediff(col("nd"), col("pd")).cast(LongType)))
          .as("interp_cents"))
      .orderBy(col("ub"), col("day"))
  }

  private val q189Sql: String =
    """WITH daily AS (
      |  SELECT user_id % 40 AS ub, CAST(ts AS DATE) AS d,
      |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
      |spine AS (
      |  SELECT ub, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      |  FROM (SELECT DISTINCT ub FROM daily) CROSS JOIN bounds),
      |f AS (
      |  SELECT s.ub, s.d, daily.cents,
      |    last_value(daily.cents IGNORE NULLS) OVER wp AS locf_cents,
      |    last_value(CASE WHEN daily.cents IS NOT NULL THEN s.d END IGNORE NULLS)
      |      OVER wp AS pd,
      |    first_value(daily.cents IGNORE NULLS) OVER wn AS nc,
      |    first_value(CASE WHEN daily.cents IS NOT NULL THEN s.d END IGNORE NULLS)
      |      OVER wn AS nd
      |  FROM spine s LEFT JOIN daily ON s.ub = daily.ub AND s.d = daily.d
      |  WINDOW wp AS (PARTITION BY s.ub ORDER BY s.d
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wn AS (PARTITION BY s.ub ORDER BY s.d
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT ub, strftime(d, '%Y-%m-%d') AS day,
      |  cents IS NOT NULL AS present, cents, locf_cents,
      |  CASE WHEN cents IS NOT NULL THEN cents
      |       WHEN locf_cents IS NOT NULL AND nc IS NOT NULL THEN
      |         locf_cents + (nc - locf_cents) * date_diff('day', pd, d)
      |                      // date_diff('day', pd, nd)
      |  END AS interp_cents
      |FROM f ORDER BY ub, day""".stripMargin

  /** q190: subquery battery — correlated scalar aggregates, EXISTS /
    * NOT EXISTS, IN, and the three-valued NOT-IN-with-NULLs trap (a set
    * containing NULL makes NOT IN yield NULL-or-false, never true) —
    * pinned through `spark.sql` so the decorrelation path (Catalyst
    * rewrites each correlated subquery to an outer join / aggregate,
    * never a per-row re-execution) is what's measured. At 100 TB every
    * one of these becomes a key-partitioned join — the decorrelated
    * plan IS the scale story.
    *
    * The nullset trap is pinned in WHERE context (survivors of a
    * `NOT IN` filter against the NULL-bearing set — the null-aware
    * anti-join, which evaluates the ANSI three-valued rule: nobody
    * survives). In PROJECTION context Spark's rewrite yields FALSE
    * where ANSI says NULL for a no-match value against a NULL-bearing
    * set — found by the sf1 full-surface sweep, where the first
    * zero-order customer appears (none exist at sf0.01/sf0.01 never saw
    * it); `not_in_nonnull` pins the NULL-free set's NOT IN, where both
    * engines agree in any context and the no-match case IS reachable.
    * The null-bearing set is bounded (`o_orderkey < 2000` — present and
    * NULL-bearing at every SF): Spark executes a NOT IN against a
    * nullable set as a null-aware anti-join, a BroadcastNestedLoopJoin
    * whose cost is |outer|·|set|, and the zero-survivors rule being
    * pinned holds for ANY null-bearing set and any outer slice (both
    * bounds leave the anti-join's verdict — zero survivors — intact),
    * so the bounded plan pins the same rule orders of magnitude
    * cheaper. `not_in_nonnull`'s set is bounded too
    * (`o_custkey < 50`, keeping both the match and no-match cases
    * reachable): Spark plans ANY projection-context NOT IN as the
    * `(= OR isnull(=))` BroadcastNestedLoopJoin — the isnull disjunct
    * is emitted regardless of static nullability (coalesce on both
    * sides was tried; the rewrite ignores it) — so |outer|·|set| evals
    * is the unavoidable plan shape and the set bound is the only
    * lever. Both bounds are semantic identities for the pinned rules.
    */
  def subqueryBattery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer_sq")
    t(s, dir, "orders").createOrReplaceTempView("orders_sq")
    s.sql("""
      SELECT c_custkey,
        (SELECT COUNT(*) FROM orders_sq o
          WHERE o.o_custkey = c.c_custkey) AS n_orders,
        (SELECT MAX(o_totalprice) FROM orders_sq o
          WHERE o.o_custkey = c.c_custkey) AS max_price,
        EXISTS(SELECT 1 FROM orders_sq o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) AS has_big,
        NOT EXISTS(SELECT 1 FROM orders_sq o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT') AS no_urgent,
        c_custkey IN (SELECT o_custkey FROM orders_sq
          WHERE o_orderpriority = '1-URGENT') AS in_urgent,
        c_custkey NOT IN (SELECT o_custkey FROM orders_sq
          WHERE o_orderkey % 97 <> 0 AND o_custkey < 50) AS not_in_nonnull,
        c_custkey IN (SELECT c2.c_custkey FROM customer_sq c2
          WHERE c2.c_custkey < 500
            AND c2.c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 97 = 0
              THEN NULL ELSE o_custkey END FROM orders_sq
            WHERE o_orderkey < 2000)) AS not_in_nullset
      FROM customer_sq c ORDER BY c_custkey""")
  }

  private val q190Sql: String =
    """SELECT c_custkey,
      |  (SELECT COUNT(*) FROM orders o
      |    WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |  (SELECT MAX(o_totalprice) FROM orders o
      |    WHERE o.o_custkey = c.c_custkey) AS max_price,
      |  EXISTS(SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) AS has_big,
      |  NOT EXISTS(SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderpriority = '1-URGENT') AS no_urgent,
      |  c_custkey IN (SELECT o_custkey FROM orders
      |    WHERE o_orderpriority = '1-URGENT') AS in_urgent,
      |  c_custkey NOT IN (SELECT o_custkey FROM orders
      |    WHERE o_orderkey % 97 <> 0 AND o_custkey < 50) AS not_in_nonnull,
      |  c_custkey IN (SELECT c2.c_custkey FROM customer c2
      |    WHERE c2.c_custkey < 500
      |      AND c2.c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 97 = 0
      |        THEN NULL ELSE o_custkey END FROM orders
      |      WHERE o_orderkey < 2000)) AS not_in_nullset
      |FROM customer c ORDER BY c_custkey""".stripMargin

  /** q193: 2-D skyline (Pareto frontier) — the orders no other order
    * dominates on (lower price, earlier date), via
    * [[graft.operators.Skyline.paretoFrontier2d]]: range-partitioned
    * cumulative-min with a broadcast prefix handoff — no
    * single-partition window, no O(n²) self-join. The oracle runs the
    * NOT-EXISTS DEFINITION, so the distributed rewrite is proven
    * equivalent to the quadratic spec, not just to itself.
    */
  def skylineOrders(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast(TimestampType)).as("od"))
    graft.operators.Skyline.paretoFrontier2d(o, "o_totalprice", "od", "o_orderkey")
      .select(col("o_orderkey"), col("o_totalprice"),
        date_format(timestamp_micros(col("od")), "yyyy-MM-dd").as("orderdate"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
  }

  private val q193Sql: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_totalprice, o_orderdate
      |  FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT o_orderkey, o_totalprice,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      |FROM o a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM o b
      |  WHERE (b.o_totalprice, b.o_orderkey) < (a.o_totalprice, a.o_orderkey)
      |    AND b.o_orderdate <= a.o_orderdate)
      |ORDER BY o_totalprice, o_orderkey""".stripMargin

  /** q194: event-transition (Markov) matrix — per user the lag-1
    * event-type bigram, counted into the transition matrix with a
    * row-normalized probability in ×1000 fixed point (truncated div,
    * engine-identical). The clickstream complement of q170's document
    * PMI; one window pass (shuffle on user_id) + one aggregate — the
    * matrix is |types|² rows, broadcast-sized at any corpus scale.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRow = Window.partitionBy(col("src"))
    t(s, dir, "events")
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_mille", call_function("div",
        col("n") * 1000, sum(col("n")).over(wRow)))
      .orderBy(col("src"), col("dst"))
  }

  private val q194Sql: String =
    """WITH b AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS src, event_type AS dst
      |  FROM events),
      |m AS (SELECT src, dst, COUNT(*) AS n FROM b
      |      WHERE src IS NOT NULL GROUP BY 1, 2)
      |SELECT src, dst, n,
      |  n * 1000 // CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS p_mille
      |FROM m ORDER BY src, dst""".stripMargin

  /** q195: time-weighted average (TWAP) — the telemetry/finance
    * aggregate where each observation holds until the next one: per
    * (user, day), Σ valueᵢ·(tᵢ₊₁ − tᵢ) over the day's span in integer
    * (cents × micros), closed at day end, divided by the covered span.
    * lead() + one aggregate, all integer — no numeric drift anywhere.
    * Only the within-day weighting matters, so the window partitions by
    * (user, day): state never crosses the partition key, the exact
    * shape that scales.
    */
  def timeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("us"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast(LongType).as("cents"))
      .withColumn("until", coalesce(lead(col("us"), 1).over(w),
        (to_unix_timestamp(col("day")) + 86400L) * 1000000L))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("cents") * (col("until") - col("us"))).as("wsum"),
        (max(col("until")) - min(col("us"))).as("span_us"))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_obs"), call_function("div", col("wsum"), col("span_us")).as("twap_cents"))
      .orderBy(col("user_id"), col("day"))
  }

  private val q195Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS DATE) AS day,
      |    epoch_us(ts) AS us,
      |    CAST(round(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |x AS (
      |  SELECT user_id, day, us, cents,
      |    COALESCE(lead(us) OVER (PARTITION BY user_id, day
      |        ORDER BY us, event_id),
      |      (CAST(epoch(day) AS BIGINT) + 86400) * 1000000) AS until
      |  FROM e)
      |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, COUNT(*) AS n_obs,
      |  CAST(SUM(cents * (until - us)) AS BIGINT)
      |    // (MAX(until) - MIN(us)) AS twap_cents
      |FROM x GROUP BY user_id, day ORDER BY user_id, day""".stripMargin

  /** q196: boolean / bitwise aggregate battery — `every`/`any`
    * (bool_and/bool_or), count_if, FILTER-clause aggregates, and the
    * bit_and/bit_or/bit_xor reduction family (xor is order-insensitive
    * by associativity+commutativity, so it's partitioning-proof by
    * algebra — the same reason it's the classic distributed checksum).
    */
  def boolBitwiseBattery(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("every(value >= 0)").as("all_nonneg"),
        expr("any(user_id % 50 = 0)").as("any_u50"),
        expr("count_if(value > 50)").as("n_hi"),
        sum(when(col("user_id") % 2 === 0, col("user_id"))).as("sum_even_users"),
        expr("bit_and(user_id)").as("band"),
        expr("bit_or(user_id)").as("bor"),
        expr("bit_xor(event_id)").as("bxor"))
      .orderBy(col("event_type"))

  private val q196Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  bool_and(value >= 0) AS all_nonneg,
      |  bool_or(user_id % 50 = 0) AS any_u50,
      |  CAST(COUNT(*) FILTER (WHERE value > 50) AS BIGINT) AS n_hi,
      |  CAST(SUM(user_id) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS sum_even_users,
      |  bit_and(user_id) AS band,
      |  bit_or(user_id) AS bor,
      |  bit_xor(event_id) AS bxor
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q197: runtime bloom-filter join pruning — Spark's runtime filtering
    * (the Catalyst `InjectRuntimeFilter` rule): a selective dimension
    * filter is turned into a bloom filter BUILT AT RUNTIME from the dim
    * side and pushed into the fact scan, so fact rows that cannot join
    * die at the scan instead of crossing the shuffle — at 100 TB this
    * is often the single biggest join win (it prunes the shuffle, which
    * DPP can't when the fact isn't partitioned on the key). Thresholds
    * are lowered so the rule fires at test scale; RelationalPlanSpec
    * asserts `bloom_filter_agg`/`might_contain` in the physical plan —
    * the RESULT is pinned here (filter semantics must be a no-op on
    * correctness: bloom false positives only pass extra rows to the
    * join, never drop matches).
    */
  /** The conf window q197 runs under: runtime bloom filtering on, size
    * gates opened for test scale, and auto-broadcast OFF — the rule
    * (correctly) skips joins whose build side would broadcast anyway,
    * and the whole point is protecting the SHUFFLE join. Everything is
    * restored on exit; the query itself materializes eagerly inside the
    * window so later queries never see these settings. */
  private[queries] def withBloomConfs[A](s: SparkSession)(body: => A): A = {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "500MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** The raw q197 join, conf-agnostic — the spec optimizes THIS inside
    * [[withBloomConfs]] and asserts the bloom build/probe nodes. */
  private[queries] def runtimeBloomJoinPlan(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderpriority") === "2-HIGH")
      .filter(col("o_totalprice") > 300000.0)
    t(s, dir, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  def runtimeBloomJoin(s: SparkSession, dir: String): DataFrame =
    withBloomConfs(s) {
      // eager: the join runs NOW, under the conf window
      runtimeBloomJoinPlan(s, dir).localCheckpoint()
    }

  private val q197Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '2-HIGH' AND o_totalprice > 300000
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q198: rank-based quantile normalization — the scale-free feature
    * transform (map each value to its rank quantile) done in exact
    * integer arithmetic: per event_type, `q_mille = (rank − 1) · 1000
    * div (n − 1)` with a total (value, event_id) order. The per-group
    * rank does NOT ride a `Window.partitionBy(group)` — a handful of
    * giant groups would each funnel through one task at 100×. Instead
    * the GLOBAL two-phase rank over (group, value, tie)
    * ([[graft.operators.Packing.globalRowNumber]] — range partitions +
    * bounded prefix handoff, every task a contiguous slice) is turned
    * into the within-group rank by subtracting each group's start
    * offset, joined back on the group key. Same answers, no
    * group-parallelism wall.
    */
  def quantileNormalize(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "events")
      .filter(col("user_id") % 10 === 3)
      .select(col("event_id"), col("event_type"), col("value"))
    val ranked = graft.operators.Packing.globalRowNumber(
      base, struct(col("event_type"), col("value"), col("event_id")), "gpos")
    val groups = ranked.groupBy(col("event_type"))
      .agg(min(col("gpos")).as("gstart"), count(lit(1)).as("n"))
    ranked.join(groups, "event_type")
      .select(col("event_id"), col("event_type"),
        call_function("div", (col("gpos") - col("gstart")) * 1000,
          col("n") - 1).as("q_mille"))
      .orderBy(col("event_id"))
  }

  private val q198Sql: String =
    """WITH e AS (
      |  SELECT event_id, event_type, value,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS r,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events WHERE user_id % 10 = 3)
      |SELECT event_id, event_type,
      |  CAST(r - 1 AS BIGINT) * 1000 // CAST(n - 1 AS BIGINT) AS q_mille
      |FROM e ORDER BY event_id""".stripMargin

  /** q199: last-touch attribution — each purchase is credited to the
    * same user's most recent PRECEDING click within a 1-hour lookback
    * (the marketing-attribution shape; also the generic "join each
    * event to the latest earlier state change" pattern q40's as-of join
    * solves across two tables, here within one stream). One running
    * max over a (user)-partitioned window — no self-join, no per-event
    * backscan; the conversion credit is exact integer cents.
    */
  def lastTouchAttribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast(LongType).as("cents"))
      .withColumn("last_click_us",
        max(when(col("event_type") === "click", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("attributed",
        col("last_click_us").isNotNull &&
          col("last_click_us") >= col("us") - 3600000000L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"),
        sum(when(col("attributed"), col("cents"))).as("attributed_cents"))
      .orderBy(col("user_id"))
  }

  private val q199Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    CAST(round(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |x AS (
      |  SELECT *,
      |    MAX(CASE WHEN event_type = 'click' THEN us END) OVER (
      |      PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
      |  FROM e)
      |SELECT user_id, COUNT(*) AS n_purchases,
      |  CAST(SUM(CASE WHEN last_click_us >= us - 3600000000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_attributed,
      |  CAST(SUM(CASE WHEN last_click_us >= us - 3600000000 THEN cents END)
      |    AS BIGINT) AS attributed_cents
      |FROM x WHERE event_type = 'purchase'
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q200: exact global-quantile threshold filter — the two-phase
    * "select everything above the corpus p90" pattern: phase 1 computes
    * the EXACT p90 in integer cents from the value-frequency table (the
    * least c with rank(c) ≥ ⌈0.9·n⌉ — a distribution-sized aggregate,
    * never a global sort of rows), phase 2 broadcasts that one-row
    * threshold back across the fact scan. The quantile is exact-by-
    * definition (no interpolation, no float), so the filter is
    * reproducible across engines — the discipline behind every
    * "top-decile quality cut" in a curation pipeline (q77/q92 consume
    * exactly this shape).
    */
  def globalQuantileFilter(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"), round(col("value") * 100).cast(LongType).as("cents"))
    val freq = ev.groupBy(col("cents")).agg(count(lit(1)).as("c"))
    val wc = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val thr = freq
      .crossJoin(broadcast(freq.agg(sum(col("c")).as("n"))))
      .withColumn("cum", sum(col("c")).over(wc))
      .filter(col("cum") * 10 >= col("n") * 9)
      .agg(min(col("cents")).as("p90_cents"))
    ev.crossJoin(broadcast(thr))
      .filter(col("cents") >= col("p90_cents"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_top"), sum(col("cents")).as("sum_cents"),
        max(col("p90_cents")).as("p90_cents"))
      .orderBy(col("event_type"))
  }

  private val q200Sql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |f AS (SELECT cents, COUNT(*) AS c FROM e GROUP BY 1),
      |r AS (SELECT cents,
      |        SUM(c) OVER (ORDER BY cents
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM f),
      |thr AS (SELECT MIN(cents) AS p90
      |        FROM r WHERE cum * 10 >= (SELECT COUNT(*) FROM e) * 9)
      |SELECT event_type, COUNT(*) AS n_top,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(MAX(thr.p90) AS BIGINT) AS p90_cents
      |FROM e CROSS JOIN thr WHERE cents >= thr.p90
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q201: sliding-window distinct users — 7-day trailing unique-actor
    * counts per day, the DAU/WAU family's hard member (COUNT(DISTINCT)
    * cannot ride a window frame): each (user, day) pair CONTRIBUTES
    * ITSELF to the 7 days it affects (one `sequence` explode — a
    * constant ×7 expansion of the already-deduplicated pairs, which is
    * the canonical exact shape; the sketch path for wider windows is
    * q58's mergeable HLL rollup), then one distinct-count per day.
    */
  def slidingDistinctUsers(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "events")
      .select((col("user_id") % 100).as("u"), to_date(col("ts")).as("d"))
      .distinct()
    val bounds = pairs.agg(max(col("d")).as("maxd"))
    pairs
      .select(col("u"), col("d"),
        explode(expr("sequence(d, d + interval 6 day)")).as("wd"))
      .crossJoin(broadcast(bounds))
      .filter(col("wd") <= col("maxd"))
      .groupBy(col("wd"))
      .agg(countDistinct(col("u")).as("wau"))
      .select(date_format(col("wd"), "yyyy-MM-dd").as("day"), col("wau"))
      .orderBy(col("day"))
  }

  private val q201Sql: String =
    """WITH p AS (
      |  SELECT DISTINCT user_id % 100 AS u, CAST(ts AS DATE) AS d FROM events),
      |b AS (SELECT MAX(d) AS maxd FROM p),
      |x AS (
      |  SELECT u, CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
      |    INTERVAL 1 DAY)) AS DATE) AS wd
      |  FROM p)
      |SELECT strftime(wd, '%Y-%m-%d') AS day, COUNT(DISTINCT u) AS wau
      |FROM x CROSS JOIN b WHERE wd <= b.maxd
      |GROUP BY wd ORDER BY day""".stripMargin

  /** q206: order-independent table checksum — the migration/replication
    * integrity primitive for 100 TB moves: each row folds to a 60-bit
    * integer through a CANONICAL string (explicit field order and
    * separators, integer-exact fields) and md5, and the table signature
    * is the XOR + SUM + COUNT of those row hashes — all three
    * order-independent by algebra, so ANY engine, partitioning, or
    * storage layout that holds the same rows produces the same triple.
    * One scan, one rollup; md5 is the portable choice (both engines
    * compute the identical digest; xxhash64 is Spark-local).
    */
  def tableChecksum(s: SparkSession, dir: String): DataFrame = {
    val canon = concat_ws("|",
      col("event_id"), col("user_id"), col("event_type"),
      round(col("value") * 100).cast(LongType),
      unix_micros(col("ts").cast(TimestampType)))
    val h = conv(substring(md5(canon), 1, 15), 16, 10).cast(LongType)
    t(s, dir, "events")
      .select(col("event_type"), h.as("h"))
      .rollup(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(h)").as("xor_sig"),
        // 60-bit hashes summed over billions of rows overflow int64 —
        // the sum leg is decimal-exact and compared as a string
        sum(col("h").cast(DecimalType(38, 0))).cast(StringType).as("sum_sig"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        col("n"), col("xor_sig"), col("sum_sig"))
      .orderBy(col("event_type"))
  }

  private val q206Sql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(concat('0x', substr(md5(concat_ws('|', event_id, user_id,
      |      event_type, CAST(round(value * 100, 0) AS BIGINT),
      |      epoch_us(ts))), 1, 15)) AS BIGINT) AS h
      |  FROM events)
      |SELECT COALESCE(event_type, 'ALL') AS event_type, COUNT(*) AS n,
      |  bit_xor(h) AS xor_sig,
      |  CAST(CAST(SUM(h) AS HUGEINT) AS VARCHAR) AS sum_sig
      |FROM e GROUP BY ROLLUP (event_type)
      |ORDER BY event_type""".stripMargin

  /** q207: mode (most frequent value) with a DETERMINISTIC tie-break —
    * built-in `mode()` leaves ties implementation-defined in both
    * engines, so the pinned form is the explicit two-level aggregate:
    * count per (group, value), then `max_by(value, (count, -value))` —
    * highest count, smallest value on ties. Two hash aggregates, both
    * map-side-combined; never a sort.
    */
  def deterministicMode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"), (col("user_id") % 25).as("ub"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(expr("max_by(ub, struct(c, -ub))").as("mode_ub"),
        max(col("c")).as("mode_n"))
      .orderBy(col("event_type"))

  private val q207Sql: String =
    """WITH c AS (
      |  SELECT event_type, user_id % 25 AS ub, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, ub, c,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY c DESC, ub ASC) AS rn
      |  FROM c)
      |SELECT event_type, ub AS mode_ub, c AS mode_n
      |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** q211: peak session concurrency — "how many sessions were open at
    * once, per day": gaps-and-islands sessions (q134's operator) become
    * ±1 boundary events, and the running concurrency is their prefix
    * sum under the (instant, delta, key) total order — computed with
    * [[graft.operators.Packing.runningTotal]]'s two-phase distributed
    * prefix sum, NEVER a single-partition window (the classic
    * formulation's wall). End instants sort their −1 before a
    * simultaneous +1 (end-exclusive sessions), ties then break on the
    * session key, so the trajectory — not just the peak — is
    * deterministic. One range shuffle over 2·|sessions| boundary rows.
    */
  def peakConcurrency(s: SparkSession, dir: String): DataFrame = {
    val sess = graft.operators.Sessionize.stats(
      t(s, dir, "events"), col("user_id"), col("ts"), col("event_id"),
      gapSeconds = 1800)
    val bounds = sess.select(col("key"), col("session_seq"),
        unix_micros(col("start_ts").cast(TimestampType)).as("at"), lit(1L).as("delta"))
      .unionByName(sess.select(col("key"), col("session_seq"),
        unix_micros(col("end_ts").cast(TimestampType)).as("at"), lit(-1L).as("delta")))
    val traj = graft.operators.Packing.runningTotal(
      bounds, struct(col("at"), col("delta"), col("key"), col("session_seq")),
      col("delta"), "conc")
    traj
      .groupBy(to_date(timestamp_micros(col("at"))).as("d"))
      .agg(max(col("conc")).as("peak_concurrency"),
        sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_starts"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("peak_concurrency"), col("n_starts"))
      .orderBy(col("day"))
  }

  private val q211Sql: String =
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (SELECT user_id, ts,
      |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM x),
      |sess AS (SELECT user_id, sid, epoch_us(MIN(ts)) AS s, epoch_us(MAX(ts)) AS e
      |         FROM y GROUP BY 1, 2),
      |b AS (
      |  SELECT user_id, sid, s AS at, CAST(1 AS BIGINT) AS delta FROM sess
      |  UNION ALL
      |  SELECT user_id, sid, e, CAST(-1 AS BIGINT) FROM sess),
      |t AS (
      |  SELECT at, delta,
      |    SUM(delta) OVER (ORDER BY at, delta, user_id, sid
      |      ROWS UNBOUNDED PRECEDING) AS conc
      |  FROM b)
      |SELECT strftime(CAST(make_timestamp(at) AS DATE), '%Y-%m-%d') AS day,
      |  CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
      |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
      |FROM t GROUP BY 1 ORDER BY day""".stripMargin

  /** q217: join-type matrix — all six batch join types over ONE keyed
    * pair WITH NULL KEYS on both sides, side by side: a NULL key
    * matches nothing in every type (the SQL rule engines must share),
    * null-keyed left rows still survive left/full outer, and semi/anti
    * are existence tests that never duplicate. One query, one row per
    * type: row count, surviving left-side exact sum, and the
    * unmatched-right count — the compact contract every downstream
    * join in the engine builds on.
    */
  def joinMatrix(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "customer")
      .select(when(col("c_custkey") % 19 === 0, lit(null)).otherwise(col("c_custkey")).as("k"),
        round(col("c_acctbal") * 100).cast(LongType).as("lcents"))
    val r = t(s, dir, "orders").filter(col("o_orderkey") % 3 === 0)
      .select(when(col("o_custkey") % 23 === 0, lit(null)).otherwise(col("o_custkey")).as("rk"),
        col("o_orderkey"))
    def leg(jt: String): DataFrame = {
      val j = l.join(r, col("k") === col("rk"), jt)
      val miss = jt match {
        case "left_semi" | "left_anti" => lit(0L)
        case _ => sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
      }
      j.agg(count(lit(1)).as("n_rows"), sum(col("lcents")).as("sum_left_cents"),
          miss.as("n_right_miss"))
        .withColumn("join_type", lit(jt))
    }
    Seq("inner", "left", "right", "full", "left_semi", "left_anti")
      .map(leg).reduce(_ unionByName _)
      .select(col("join_type"), col("n_rows"), col("sum_left_cents"), col("n_right_miss"))
      .orderBy(col("join_type"))
  }

  private val q217Sql: String =
    """WITH l AS (
      |  SELECT CASE WHEN c_custkey % 19 = 0 THEN NULL ELSE c_custkey END AS k,
      |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS lcents
      |  FROM customer),
      |r AS (
      |  SELECT CASE WHEN o_custkey % 23 = 0 THEN NULL ELSE o_custkey END AS rk,
      |    o_orderkey
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |legs AS (
      |  SELECT 'inner' AS join_type, COUNT(*) AS n_rows,
      |    CAST(SUM(lcents) AS BIGINT) AS sum_left_cents,
      |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_right_miss
      |  FROM l JOIN r ON k = rk
      |  UNION ALL
      |  SELECT 'left', COUNT(*), CAST(SUM(lcents) AS BIGINT),
      |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM l LEFT JOIN r ON k = rk
      |  UNION ALL
      |  SELECT 'right', COUNT(*), CAST(SUM(lcents) AS BIGINT),
      |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM l RIGHT JOIN r ON k = rk
      |  UNION ALL
      |  SELECT 'full', COUNT(*), CAST(SUM(lcents) AS BIGINT),
      |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM l FULL JOIN r ON k = rk
      |  UNION ALL
      |  SELECT 'left_semi', COUNT(*), CAST(SUM(lcents) AS BIGINT), CAST(0 AS BIGINT)
      |  FROM l WHERE EXISTS (SELECT 1 FROM r WHERE r.rk = l.k)
      |  UNION ALL
      |  SELECT 'left_anti', COUNT(*), CAST(SUM(lcents) AS BIGINT), CAST(0 AS BIGINT)
      |  FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.rk = l.k))
      |SELECT join_type, n_rows, sum_left_cents, n_right_miss
      |FROM legs ORDER BY join_type""".stripMargin

  /** q220: data-quality constraint audit — the Deequ-style validation
    * suite every ingest gate runs before data is admitted downstream:
    * key uniqueness, non-null, domain bounds, referential integrity,
    * and a business-rule threshold, each emitted as one audit row
    * (constraint, n_checked, n_violations, pass). Shape: ONE
    * conditional-aggregation pass per table covers all of that table's
    * row-local checks (never a scan per check); uniqueness rides the
    * same pass as count−count(DISTINCT key); the two FK checks are
    * key-projected anti-join counts. At 100 TB that is three scans +
    * two key-only shuffle joins, total — and the audit result is a
    * dozen rows regardless of input size.
    */
  def constraintAudit(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    val c = t(s, dir, "customer")
    def cviol(p: Column): Column = sum(when(p, 1L).otherwise(0L))
    // all row-local orders checks in one pass
    val oAgg = o.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_uniq"),
      cviol(col("o_custkey").isNull).as("v_null"),
      cviol(col("o_totalprice") <= 0).as("v_pos"),
      cviol(col("o_orderdate") < lit("1992-01-01").cast(TimestampType) ||
        col("o_orderdate") >= lit("2002-01-01").cast(TimestampType)).as("v_date"),
      cviol(col("o_totalprice") > 400000.0).as("v_cap"))
    val oChecks = oAgg.selectExpr(
      """stack(5,
        |  'orders.key_unique',        n, v_uniq,
        |  'orders.custkey_not_null',  n, v_null,
        |  'orders.totalprice_positive', n, v_pos,
        |  'orders.date_in_range',     n, v_date,
        |  'orders.totalprice_cap_400k', n, v_cap
        |) AS (check_name, n_checked, n_violations)""".stripMargin)
    val lAgg = l.agg(
      count(lit(1)).as("n"),
      cviol(col("l_quantity") < 1 || col("l_quantity") > 50).as("v_qty"),
      cviol(col("l_discount") < 0 || col("l_discount") > 0.1).as("v_disc"))
    val lChecks = lAgg.selectExpr(
      """stack(2,
        |  'lineitem.quantity_domain', n, v_qty,
        |  'lineitem.discount_domain', n, v_disc
        |) AS (check_name, n_checked, n_violations)""".stripMargin)
    val cChecks = c.agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("c_custkey"))).as("v"))
      .select(lit("customer.key_unique").as("check_name"),
        col("n").as("n_checked"), col("v").as("n_violations"))
    // referential integrity: key-projected anti-join counts
    def fk(name: String, fact: DataFrame, fkCol: String,
        dim: DataFrame, pkCol: String): DataFrame = {
      val keys = fact.select(col(fkCol).as("fk"))
      val orphans = keys
        .join(dim.select(col(pkCol).as("fk")), Seq("fk"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      keys.agg(count(lit(1)).as("n_checked"))
        .crossJoin(orphans)
        .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
    }
    oChecks.unionByName(lChecks).unionByName(cChecks)
      .unionByName(fk("orders.fk_customer", o, "o_custkey", c, "c_custkey"))
      .unionByName(fk("lineitem.fk_orders", l, "l_orderkey", o, "o_orderkey"))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check_name"))
  }

  private val q220Sql: String =
    """WITH oa AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_uniq,
      |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_null,
      |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_pos,
      |    SUM(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
      |      OR o_orderdate >= TIMESTAMP '2002-01-01' THEN 1 ELSE 0 END) AS v_date,
      |    SUM(CASE WHEN o_totalprice > 400000.0 THEN 1 ELSE 0 END) AS v_cap
      |  FROM orders),
      |la AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS v_qty,
      |    SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS v_disc
      |  FROM lineitem),
      |rows_ AS (
      |  SELECT 'orders.key_unique' AS check_name, n AS n_checked, v_uniq AS n_violations FROM oa
      |  UNION ALL SELECT 'orders.custkey_not_null', n, v_null FROM oa
      |  UNION ALL SELECT 'orders.totalprice_positive', n, v_pos FROM oa
      |  UNION ALL SELECT 'orders.date_in_range', n, v_date FROM oa
      |  UNION ALL SELECT 'orders.totalprice_cap_400k', n, v_cap FROM oa
      |  UNION ALL SELECT 'lineitem.quantity_domain', n, v_qty FROM la
      |  UNION ALL SELECT 'lineitem.discount_domain', n, v_disc FROM la
      |  UNION ALL SELECT 'customer.key_unique', COUNT(*),
      |    COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer
      |  UNION ALL SELECT 'orders.fk_customer', (SELECT COUNT(*) FROM orders),
      |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL SELECT 'lineitem.fk_orders', (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem li WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_orderkey = li.l_orderkey)))
      |SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
      |  CAST(n_violations AS BIGINT) AS n_violations,
      |  n_violations = 0 AS pass
      |FROM rows_ ORDER BY check_name""".stripMargin

  /** q221: association-rule mining (a-priori at the pair level) — the
    * market-basket family: baskets are (user, day), items the DISTINCT
    * event types seen that day, and every ordered rule a→b gets exact
    * integer fixed-point support/confidence/lift (×10⁶, floor
    * division — no float in the pipeline, so ranking never drifts).
    * Shape: one distinct-aggregate builds baskets, items per basket
    * collect into a sorted array BOUNDED by the event-type vocabulary
    * (never unbounded), pairs explode in-plan from that array (no
    * basket self-join), and the item-frequency table broadcasts back
    * twice. At 100 TB: one shuffle for baskets, one for pair counts —
    * pair blowup is |items-per-basket|² with a vocabulary-sized cap,
    * the classic a-priori bound.
    */
  def assocRules(s: SparkSession, dir: String): DataFrame = {
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val baskets = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .distinct()
    val arrs = baskets.groupBy(col("user_id"), col("d"))
      .agg(sort_array(collect_set(col("event_type"))).as("items"))
    val pairs = arrs.select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items)),
          |    y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 20)
    val itemFreq = baskets.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
    val nB = arrs.agg(count(lit(1)).as("nb"))
    val joined = pairs
      .join(broadcast(itemFreq.select(col("event_type").as("a"), col("c").as("ca"))), "a")
      .join(broadcast(itemFreq.select(col("event_type").as("b"), col("c").as("cb"))), "b")
      .crossJoin(broadcast(nB))
    // emit both rule directions from the canonical a<b pair
    val fwd = joined.select(col("a").as("antecedent"), col("b").as("consequent"),
      col("c_ab"), col("ca").as("c_ante"), col("cb").as("c_cons"), col("nb"))
    val rev = joined.select(col("b").as("antecedent"), col("a").as("consequent"),
      col("c_ab"), col("cb").as("c_ante"), col("ca").as("c_cons"), col("nb"))
    fwd.unionByName(rev)
      .select(col("antecedent"), col("consequent"), col("c_ab"),
        idiv(col("c_ab") * 1000000L, col("nb")).as("support_fp"),
        idiv(col("c_ab") * 1000000L, col("c_ante")).as("confidence_fp"),
        idiv(col("c_ab") * col("nb") * 1000000L,
          col("c_ante") * col("c_cons")).as("lift_fp"))
      .orderBy(col("antecedent"), col("consequent"))
  }

  private val q221Sql: String =
    """WITH baskets AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
      |  FROM events),
      |nb AS (SELECT COUNT(*) AS nb FROM
      |  (SELECT DISTINCT user_id, d FROM baskets)),
      |freq AS (SELECT event_type, COUNT(*) AS c FROM baskets GROUP BY 1),
      |pairs AS (
      |  SELECT b1.event_type AS a, b2.event_type AS b, COUNT(*) AS c_ab
      |  FROM baskets b1 JOIN baskets b2
      |    ON b1.user_id = b2.user_id AND b1.d = b2.d
      |    AND b1.event_type < b2.event_type
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 20),
      |rules AS (
      |  SELECT a AS antecedent, b AS consequent, c_ab FROM pairs
      |  UNION ALL
      |  SELECT b, a, c_ab FROM pairs)
      |SELECT r.antecedent, r.consequent, r.c_ab,
      |  (r.c_ab * 1000000) // (SELECT nb FROM nb) AS support_fp,
      |  (r.c_ab * 1000000) // fa.c AS confidence_fp,
      |  (r.c_ab * (SELECT nb FROM nb) * 1000000) // (fa.c * fc.c) AS lift_fp
      |FROM rules r
      |JOIN freq fa ON fa.event_type = r.antecedent
      |JOIN freq fc ON fc.event_type = r.consequent
      |ORDER BY antecedent, consequent""".stripMargin

  /** q224: algebraic incremental view maintenance — a materialized
    * (day, type) → (count, exact cent sum) aggregate kept current under
    * INSERT and DELETE deltas by combining AGGREGATES, never rescanning
    * the base: view ⊕ agg(inserts) ⊖ agg(deletes), groups whose count
    * reaches zero dropped. The pin is incremental ≡ full recompute over
    * (base ∖ deletes) ∪ inserts. count/sum are self-maintainable
    * (min/max are not — those need the q164 merge-on-read path); cost
    * per refresh is O(|delta| + |view|), the property that makes a
    * 100 TB base with GB-sized deltas maintainable at all.
    */
  def viewMaintenance(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(
      col("event_id"), to_date(col("ts")).as("d"), col("event_type"),
      round(col("value") * 100).cast(LongType).as("cents"))
    val base = e.filter(col("event_id") % 10 < 8)
    val ins = e.filter(col("event_id") % 10 >= 8)
    val del = base.filter(col("event_id") % 7 === 3)
    def agg(df: DataFrame, sign: Long): DataFrame =
      df.groupBy(col("d"), col("event_type"))
        .agg((count(lit(1)) * sign).as("n"), (sum(col("cents")) * sign).as("sum_cents"))
    agg(base, 1L) // the standing view
      .unionByName(agg(ins, 1L)) // ⊕ insert delta
      .unionByName(agg(del, -1L)) // ⊖ delete delta (retraction)
      .groupBy(col("d"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
      .filter(col("n") > 0)
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_cents"))
      .orderBy(col("day"), col("event_type"))
  }

  private val q224Sql: String =
    """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events
      |WHERE NOT (event_id % 10 < 8 AND event_id % 7 = 3)
      |GROUP BY 1, 2 HAVING COUNT(*) > 0
      |ORDER BY day, event_type""".stripMargin

  /** q225: session path mining — the top event-type TRIGRAM paths
    * users walk inside a session (the clickstream "what flows happen"
    * query): 30-minute-gap sessions (q134's operator semantics), two
    * leads inside each session under the (ts, event_id) total order,
    * count per path. One window pass + one hash aggregate; path
    * cardinality is |types|³-bounded so the result is tiny at any
    * scale. Count ties break on the path string.
    */
  def pathTrigrams(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withSid = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("new_s",
        when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) >=
          1800L * 1000000L || lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("ts"), col("event_id"))
    withSid
      .withColumn("t1", lead(col("event_type"), 1).over(ws))
      .withColumn("t2", lead(col("event_type"), 2).over(ws))
      .filter(col("t2").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t1"), col("t2")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  private val q225Sql: String =
    """WITH x AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (SELECT user_id, ts, event_id, event_type,
      |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM x),
      |z AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER ws AS t1,
      |    lead(event_type, 2) OVER ws AS t2
      |  FROM y WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id))
      |SELECT concat_ws('>', event_type, t1, t2) AS path, COUNT(*) AS n
      |FROM z WHERE t2 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  /** q226: trailing EWMA, integer-exact — exponential smoothing with
    * α = 1/2 truncated at 16 lags, scaled by 2¹⁶ so every weight
    * 2^(15−i) is an integer and the smoothed value is an exact BIGINT
    * on any engine (a float EWMA's low bits depend on summation order;
    * this one cannot). The 16 lag terms ride ONE window pass (shared
    * sort), and each user's final smoothed value comes off a max_by —
    * no second window. The |lags|-term form is the bounded-horizon
    * EWMA streaming scorers use for rate/quality smoothing.
    */
  def ewmaSmoothing(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val v = round(col("value") * 100).cast(LongType)
    val ewma = (0 to 15).map(i =>
        coalesce(lag(v, i).over(w), lit(0L)) * (1L << (15 - i)))
      .reduce(_ + _)
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("ewma_fp", ewma)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("max_by(ewma_fp, struct(ts, event_id))").as("last_ewma_fp"))
      .orderBy(col("user_id"))
  }

  private val q226Sql: String = {
    val terms = (0 to 15).map(i =>
      s"COALESCE(lag(CAST(round(value * 100, 0) AS BIGINT), $i) OVER w, 0) * ${1L << (15 - i)}")
      .mkString(" + ")
    s"""WITH x AS (
       |  SELECT user_id, ts, event_id, $terms AS ewma_fp
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |r AS (
       |  SELECT user_id, ewma_fp,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM x)
       |SELECT x.user_id, CAST(x.n AS BIGINT) AS n_events,
       |  r.ewma_fp AS last_ewma_fp
       |FROM (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1) x
       |JOIN r ON r.user_id = x.user_id AND r.rn = 1
       |ORDER BY x.user_id""".stripMargin
  }

  /** q286: l-diversity audit — the privacy gate k-anonymity (q227)
    * cannot see: a QI group can hold ≥ k records yet expose everyone in
    * it because they all share ONE sensitive value (the homogeneity
    * attack, Machanavajjhala et al. ICDE'06 — public method). Per QI
    * group (event type × ISO week × user bucket) the audit measures
    * distinct-l over a derived sensitive class (value-cents mod 7) and
    * reports, per event type: group count, the WORST group's l, and how
    * many groups/records fall below l = 3 — the release decision next
    * to q227's size gate. Same scale shape: one hash aggregate over the
    * scan + a tiny rollup.
    */
  def lDiversityAudit(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.groupBy(col("event_type"), date_trunc("week", col("ts")),
        col("user_id") % 5)
      .agg(count(lit(1)).as("sz"),
        countDistinct(round(col("value") * 100).cast("long") % 7).as("l"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_groups"), min(col("l")).as("min_l"),
        sum(when(col("l") < 3, 1L).otherwise(0L)).as("weak_groups"),
        sum(when(col("l") < 3, col("sz")).otherwise(0L)).as("weak_records"))
      .orderBy(col("event_type"))
  }

  private val q286Sql: String =
    """WITH g AS (
      |  SELECT event_type, COUNT(*) AS sz,
      |    COUNT(DISTINCT CAST(round(value * 100) AS BIGINT) % 7) AS l
      |  FROM events
      |  GROUP BY event_type, date_trunc('week', ts), user_id % 5)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_groups,
      |  CAST(MIN(l) AS BIGINT) AS min_l,
      |  CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS weak_groups,
      |  CAST(SUM(CASE WHEN l < 3 THEN sz ELSE 0 END) AS BIGINT) AS weak_records
      |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q294: t-CLOSENESS audit — the third leg of the release-privacy
    * trio (q227 k-anonymity: groups big enough; q286 l-diversity:
    * sensitive values varied enough; HERE: the sensitive DISTRIBUTION
    * close enough to the global one that group membership leaks no
    * skew — the attack l-diversity misses when a group's values are
    * distinct but all extreme). Same QI lattice cell as q286
    * (event_type × week × user-bucket); sensitive attribute = the
    * ORDERED 7-bucket value class. Distance is the ordered-attribute
    * Earth-Mover's Distance of Li et al., computed EXACTLY:
    * `EMD = Σ_i |cumP_i − cumQ_i| / (m−1)` over cumulative counts, so
    * `emd_ppm = ⌊10⁶·Σ|ca_i·N − cb_i·n_g| / (6·n_g·N)⌋` — every product
    * in Decimal(38,0) (cum·N reaches n_g·N ≈ 10²⁴ at warehouse scale,
    * far past int64; the CUPED/AbTests guard) and the division a floor
    * both engines replay. One hash aggregate builds per-group
    * CUMULATIVE bucket counts directly (`sens ≤ j` conditional sums —
    * no second pass), the global row derives from the group frame and
    * broadcasts back; weak = EMD > 0.375.
    */
  def tClosenessAudit(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    // canonical non-negative bucket 0..6 (both engines' % keeps the
    // dividend's sign — normalize before using it as an ORDERED class)
    val sens = ((round(col("value") * 100).cast("long") % 7) + 7) % 7
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val cums = (0 to 5).map(j =>
      sum(when(sens <= j, 1L).otherwise(0L)).as(s"ca$j"))
    val groups = e.groupBy(col("event_type"), date_trunc("week", col("ts")),
        (col("user_id") % 5).as("qb"))
      .agg(count(lit(1)).as("n_g"), cums: _*)
      .localCheckpoint(true) // feeds the global row AND the EMD scoring
    val glob = groups.agg(dec(sum(col("n_g"))).as("N"),
      (0 to 5).map(j => dec(sum(col(s"ca$j"))).as(s"cb$j")): _*)
    val sdiff = (0 to 5)
      .map(j => abs(dec(col(s"ca$j")) * col("N") - col(s"cb$j") * dec(col("n_g"))))
      .reduce(_ + _)
    groups.crossJoin(broadcast(glob))
      .withColumn("emd_ppm",
        call_function("div", sdiff * lit(1000000L),
          lit(6L).cast(DecimalType(38, 0)) * dec(col("n_g")) * col("N"))
          .cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_groups"), max(col("emd_ppm")).as("max_emd_ppm"),
        sum(when(col("emd_ppm") > 375000L, 1L).otherwise(0L)).as("weak_groups"),
        sum(when(col("emd_ppm") > 375000L, col("n_g")).otherwise(0L)).as("weak_records"))
      .orderBy(col("event_type"))
  }

  private val q294Sql: String = {
    val ca = (0 to 5).map(j =>
      s"SUM(CASE WHEN s <= $j THEN 1 ELSE 0 END) AS ca$j").mkString(", ")
    val cb = (0 to 5).map(j => s"SUM(ca$j) AS cb$j").mkString(", ")
    val sdiff = (0 to 5).map(j =>
      s"ABS(CAST(ca$j AS HUGEINT) * N - CAST(cb$j AS HUGEINT) * n_g)")
      .mkString(" + ")
    s"""WITH base AS (
       |  SELECT event_type, ts, user_id,
       |    ((CAST(round(value * 100) AS BIGINT) % 7) + 7) % 7 AS s
       |  FROM events),
       |g AS (
       |  SELECT event_type, COUNT(*) AS n_g, $ca
       |  FROM base GROUP BY event_type, date_trunc('week', ts), user_id % 5),
       |t AS (SELECT CAST(SUM(n_g) AS HUGEINT) AS N, $cb FROM g),
       |sc AS (
       |  SELECT event_type, n_g,
       |    CAST(($sdiff) * 1000000
       |      // (6 * CAST(n_g AS HUGEINT) * N) AS BIGINT) AS emd_ppm
       |  FROM g CROSS JOIN t)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_groups,
       |  MAX(emd_ppm) AS max_emd_ppm,
       |  CAST(SUM(CASE WHEN emd_ppm > 375000 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS weak_groups,
       |  CAST(SUM(CASE WHEN emd_ppm > 375000 THEN n_g ELSE 0 END) AS BIGINT)
       |    AS weak_records
       |FROM sc GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** q298: ε-DP randomized-response release — the fourth leg of the
    * release-privacy family, and the first where the RELEASED NUMBER
    * itself is privatized (q227/q286/q294 audit leak risk but release
    * exact counts): per event_type, the count of a sensitive cohort
    * (user_id ≡ 0 mod 3) released through [[graft.operators.Privacy
    * .rrRelease]] — Warner randomized response at flip probability 1/4
    * (ε = ln 3 local DP per record), debiased to the exact integer
    * rational T̂ = (4R − N)/2. The coin is the deterministic
    * hash60-seeded flip, so the oracle replays record-level mechanism,
    * debiasing arithmetic, and ε accounting bit-for-bit — the ε itself
    * is released as the exact rational (eps_num, eps_den) = (3, 1),
    * never a float log (house no-transcendentals discipline). One
    * projection + one hash aggregate; nothing collects.
    */
  def rrDpRelease(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.rrRelease(t(s, dir, "events"),
        col("event_type"), col("user_id") % 3 === 0, col("event_id"))
      .withColumnRenamed("grp", "event_type")
      .orderBy(col("event_type"))

  private val q298Sql: String = {
    val coin = graft.functions.TextFns.hash60Sql(
      "'rr:' || CAST(event_id AS VARCHAR)")
    s"""WITH rr AS (
       |  SELECT event_type,
       |    CASE WHEN (CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END)
       |      <> (CASE WHEN $coin % 4 < 1 THEN 1 ELSE 0 END)
       |      THEN 1 ELSE 0 END AS r
       |  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(r) AS BIGINT) AS n_reported,
       |  CAST(4 * SUM(r) - COUNT(*) AS BIGINT) AS t_hat_num,
       |  CAST(2 AS BIGINT) AS t_hat_den,
       |  CAST(3 AS BIGINT) AS eps_num,
       |  CAST(1 AS BIGINT) AS eps_den
       |FROM rr GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** q304: ε-DP SUM release via the two-sided discrete geometric
    * mechanism — the central-DP magnitude counterpart of q298's local
    * randomized response: per source, the token-mass (`n_chars`) sum
    * over documents, each contribution clamped to [0, 400] (bounding
    * the sum's sensitivity) and BOTH released statistics perturbed by
    * their own integer discrete-Laplace draw at ratio α = 1/2: the
    * clamped sum (seed `dgeo:`) and the group's record count (seed
    * `dgeo_n:`, sensitivity 1 — an exact count under the add/remove
    * adjacency the clamp implies would have unbounded loss), total
    * ε = (400+1)·ln 2 by composition. Each draw is a seeded hash60
    * lattice coin inverted through the EXACT BigInt-quantized CDF
    * ([[graft.operators.Privacy.dgeoThresholds]]) — all integer
    * compares in-plan, no transcendentals, so the oracle replays
    * clamp, sum, count, both coins, inverse-CDF walks, and accounting
    * bit-for-bit. ε is released as (clamp_hi, eps_num, eps_den) =
    * (400, 2, 1) exact integers. One projection + one hash aggregate +
    * two O(B) array scans per GROUP.
    */
  def dgeoDpSumRelease(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.dgeoSumRelease(t(s, dir, "documents"),
        col("source"), col("n_chars"), clampHi = 400)
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))

  private val q304Sql: String = {
    val (b, thr) = graft.operators.Privacy.dgeoThresholds(1, 2)
    val coin = graft.functions.TextFns.hash60Sql(
      "'dgeo:' || CAST(source AS VARCHAR)")
    val coinN = graft.functions.TextFns.hash60Sql(
      "'dgeo_n:' || CAST(source AS VARCHAR)")
    val thrLit = thr.mkString("[", ", ", "]")
    s"""WITH g AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(GREATEST(CAST(0 AS BIGINT),
       |        LEAST(CAST(n_chars AS BIGINT), CAST(400 AS BIGINT)))) AS cs
       |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
       |  GROUP BY source)
       |SELECT source,
       |  CAST(n + len(list_filter($thrLit, t -> t <= $coinN)) - $b AS BIGINT)
       |    AS released_n,
       |  CAST(cs + len(list_filter($thrLit,
       |    t -> t <= $coin)) - $b AS BIGINT) AS released_sum,
       |  CAST(400 AS BIGINT) AS clamp_hi,
       |  CAST(2 AS BIGINT) AS eps_num,
       |  CAST(1 AS BIGINT) AS eps_den
       |FROM g ORDER BY source""".stripMargin
  }

  /** q227: k-anonymity audit across a generalization lattice — the
    * privacy gate a dataset passes before release: at each
    * generalization level the quasi-identifier tuple coarsens
    * (day→week→month, user bucket 10→5→2), and the audit reports how
    * many QI groups and records fall below k=5 (re-identifiable).
    * One hash aggregate per level over the same scan + a tiny rollup —
    * the release decision ("which level first passes") is a three-row
    * report at any scale. date_trunc is ISO-Monday in both engines.
    */
  def kAnonymityAudit(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    def level(name: String, keys: Seq[Column]): DataFrame =
      e.groupBy(keys: _*).agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_groups"),
          min(col("sz")).as("min_size"),
          sum(when(col("sz") < 5, 1L).otherwise(0L)).as("risky_groups"),
          sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("risky_records"))
        .select(lit(name).as("level"), col("n_groups"), col("min_size"),
          col("risky_groups"), col("risky_records"))
    level("L0_day_b10",
        Seq(col("event_type"), to_date(col("ts")), col("user_id") % 10))
      .unionByName(level("L1_week_b5",
        Seq(col("event_type"), date_trunc("week", col("ts")), col("user_id") % 5)))
      .unionByName(level("L2_month_b2",
        Seq(col("event_type"), date_trunc("month", col("ts")), col("user_id") % 2)))
      .orderBy(col("level"))
  }

  private val q227Sql: String =
    """WITH l0 AS (
      |  SELECT COUNT(*) AS sz FROM events
      |  GROUP BY event_type, CAST(ts AS DATE), user_id % 10),
      |l1 AS (
      |  SELECT COUNT(*) AS sz FROM events
      |  GROUP BY event_type, date_trunc('week', ts), user_id % 5),
      |l2 AS (
      |  SELECT COUNT(*) AS sz FROM events
      |  GROUP BY event_type, date_trunc('month', ts), user_id % 2),
      |r AS (
      |  SELECT 'L0_day_b10' AS level, COUNT(*) AS n_groups, MIN(sz) AS min_size,
      |    SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS risky_groups,
      |    SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS risky_records FROM l0
      |  UNION ALL
      |  SELECT 'L1_week_b5', COUNT(*), MIN(sz),
      |    SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END),
      |    SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) FROM l1
      |  UNION ALL
      |  SELECT 'L2_month_b2', COUNT(*), MIN(sz),
      |    SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END),
      |    SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) FROM l2)
      |SELECT level, CAST(n_groups AS BIGINT) AS n_groups,
      |  CAST(min_size AS BIGINT) AS min_size,
      |  CAST(risky_groups AS BIGINT) AS risky_groups,
      |  CAST(risky_records AS BIGINT) AS risky_records
      |FROM r ORDER BY level""".stripMargin

  /** q228: inter-arrival spectrum — each user's consecutive-event gap
    * in whole seconds, bucketed on ⌊log₂(gap+1)⌋ (the MSB position via
    * `length(bin(x))−1`, integer-exact in both engines — float log2
    * forks at power-of-two boundaries) and counted per (event type of
    * the later event, bucket). The latency-profile / burstiness
    * fingerprint: one window pass + one hash aggregate, output bounded
    * by |types|·64 rows at any scale.
    */
  def interarrivalSpectrum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    def idiv(a: Column, b: Long) = call_function("div", a, lit(b))
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("gap_s",
        idiv(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)), 1000000L))
      .filter(col("gap_s").isNotNull)
      .select(col("event_type"),
        (length(bin(col("gap_s") + 1)) - 1).cast(LongType).as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bucket"))
  }

  private val q228Sql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id))) // 1000000 AS gap_s
      |  FROM events)
      |SELECT event_type,
      |  CAST(length(bin(gap_s + 1)) - 1 AS BIGINT) AS bucket,
      |  COUNT(*) AS n
      |FROM g WHERE gap_s IS NOT NULL
      |GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin

  /** q229: binary codec battery — base64 and hex round-trips over real
    * document text plus md5-derived bytes, proving the engine's
    * byte↔text codecs are lossless and RFC 4648-identical across
    * engines (no MIME line-wrapping variant). Per-row codegen scalar
    * functions, zero shuffle before the final three-row-per-nothing
    * aggregate.
    */
  def codecBattery(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        // Spark's base64 emits MIME 76-char CRLF lines; normalize to
        // the RFC 4648 basic form DuckDB produces
        translate(base64(encode(col("text"), "UTF-8")), "\r\n", "").as("b64"),
        upper(md5(encode(col("text"), "UTF-8"))).as("md5hex"))
      .select(
        (decode(unbase64(col("b64")), "UTF-8") === col("text")).as("b64_rt"),
        (upper(hex(unhex(col("md5hex")))) === col("md5hex")).as("hex_rt"),
        length(col("b64")).as("b64_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("b64_rt"), 1L).otherwise(0L)).as("n_b64_ok"),
        sum(when(col("hex_rt"), 1L).otherwise(0L)).as("n_hex_ok"),
        sum(col("b64_len")).as("total_b64_len"))

  private val q229Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN decode(from_base64(base64(encode(text)))) = text
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_b64_ok,
      |  CAST(SUM(CASE WHEN upper(hex(unhex(upper(md5(text))))) = upper(md5(text))
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hex_ok,
      |  CAST(SUM(length(base64(encode(text)))) AS BIGINT) AS total_b64_len
      |FROM documents""".stripMargin

  /** q231: position-based (U-shaped) multi-touch attribution — q199's
    * last-touch generalized to the 40/20/40 split ad-tech actually
    * bills on: every click in the 24 h before a purchase shares the
    * credit — solo 100%, two touches 50/50, otherwise first 40%, last
    * 40%, middle split evenly (integer basis points, floor division,
    * remainder to the LAST touch so every purchase credits EXACTLY 10000).
    * The purchase↔click pairing is the canonical-bin interval join
    * (q39/q141's shape): purchases probe their two covering day bins,
    * so a user's full history is never crossed with their purchases.
    */
  def positionAttribution(s: SparkSession, dir: String): DataFrame = {
    val HB = 86400L * 1000000L
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val e = t(s, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("ct"),
        col("event_id").as("click_id"))
      .withColumn("bin", idiv(col("ct"), lit(HB)))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("pt"),
        col("event_id").as("purchase_id"))
      .withColumn("bin", explode(array(idiv(col("pt"), lit(HB)),
        idiv(col("pt"), lit(HB)) - 1)))
    val touches = purchases.join(clicks, Seq("user_id", "bin"))
      .filter(col("ct") >= col("pt") - HB && col("ct") < col("pt"))
    val wp = Window.partitionBy(col("purchase_id"))
    val wo = wp.orderBy(col("ct"), col("click_id"))
    val credited = touches
      .withColumn("rn", row_number().over(wo))
      .withColumn("k", count(lit(1)).over(wp))
      .withColumn("mid_each",
        when(col("k") >= 3, idiv(lit(2000L), col("k") - 2)).otherwise(lit(0L)))
      .withColumn("bp",
        when(col("k") === 1, 10000L)
          .when(col("k") === 2, 5000L)
          .when(col("rn") === 1, 4000L)
          .when(col("rn") === col("k"),
            lit(4000L) + (lit(2000L) - (col("k") - 2) * col("mid_each")))
          .otherwise(col("mid_each")))
      .withColumn("position",
        when(col("k") === 1, "solo")
          .when(col("rn") === 1, "first")
          .when(col("rn") === col("k"), "last")
          .otherwise("middle"))
    credited.groupBy(col("position"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("bp")).as("sum_bp"),
        countDistinct(col("purchase_id")).as("n_purchases"))
      .orderBy(col("position"))
  }

  private val q231Sql: String =
    """WITH touches AS (
      |  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |    epoch_us(c.ts) AS ct
      |  FROM events p JOIN events c
      |    ON c.user_id = p.user_id
      |    AND c.event_type = 'click' AND p.event_type = 'purchase'
      |    AND epoch_us(c.ts) >= epoch_us(p.ts) - 86400000000
      |    AND epoch_us(c.ts) < epoch_us(p.ts)),
      |ranked AS (
      |  SELECT purchase_id, click_id,
      |    row_number() OVER (PARTITION BY purchase_id
      |      ORDER BY ct, click_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY purchase_id) AS k
      |  FROM touches),
      |credited AS (
      |  SELECT *,
      |    CASE WHEN k >= 3 THEN 2000 // (k - 2) ELSE 0 END AS mid_each,
      |    CASE WHEN k = 1 THEN 10000
      |         WHEN k = 2 THEN 5000
      |         WHEN rn = 1 THEN 4000
      |         WHEN rn = k THEN 4000 + (2000 - (k - 2) * (2000 // (k - 2)))
      |         ELSE 2000 // (k - 2) END AS bp,
      |    CASE WHEN k = 1 THEN 'solo'
      |         WHEN rn = 1 THEN 'first'
      |         WHEN rn = k THEN 'last'
      |         ELSE 'middle' END AS position
      |  FROM ranked)
      |SELECT position, COUNT(*) AS n_touches,
      |  CAST(SUM(bp) AS BIGINT) AS sum_bp,
      |  CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases
      |FROM credited GROUP BY position ORDER BY position""".stripMargin

  /** q232: chi-square independence cells — is event type independent of
    * the user-parity cohort: per-cell observed count, milli-count
    * expectation e_m = (R·C·1000) div N, and the chi-square
    * contribution (dev_m² div e_m, ≈1000·cell term) — ALL integer
    * floor arithmetic, so the A/B-test verdict is engine-exact.
    * One cell aggregate + two vocabulary-sized margin broadcasts.
    * (Magnitudes: dev_m ≤ 10³·N fits int64 through sf1ci; a 100 TB
    * deployment moves the grid to per-million shares — same algebra,
    * one more floor div.)
    */
  def chiSquareCells(s: SparkSession, dir: String): DataFrame = {
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val base = t(s, dir, "events")
      .select(col("event_type"), (col("user_id") % 2).as("cohort"))
    val cells = base.groupBy(col("event_type"), col("cohort"))
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy(col("event_type")).agg(sum(col("o")).as("r"))
    val colTot = cells.groupBy(col("cohort")).agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n"))
    cells
      .join(broadcast(rowTot), "event_type")
      .join(broadcast(colTot), "cohort")
      .crossJoin(broadcast(n))
      .withColumn("e_m", idiv(col("r") * col("c") * 1000L, col("n")))
      .withColumn("dev_m", col("o") * 1000L - col("e_m"))
      .select(col("event_type"), col("cohort"), col("o"), col("e_m"),
        idiv(col("dev_m") * col("dev_m"), col("e_m")).as("chi2_cell_m"))
      .orderBy(col("event_type"), col("cohort"))
  }

  private val q232Sql: String =
    """WITH cells AS (
      |  SELECT event_type, user_id % 2 AS cohort, COUNT(*) AS o
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      |c AS (SELECT cohort, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
      |SELECT cells.event_type, cells.cohort, cells.o,
      |  (r.r * c.c * 1000) // (SELECT n FROM n) AS e_m,
      |  ((cells.o * 1000 - (r.r * c.c * 1000) // (SELECT n FROM n))
      |   * (cells.o * 1000 - (r.r * c.c * 1000) // (SELECT n FROM n)))
      |    // ((r.r * c.c * 1000) // (SELECT n FROM n)) AS chi2_cell_m
      |FROM cells
      |JOIN r ON r.event_type = cells.event_type
      |JOIN c ON c.cohort = cells.cohort
      |ORDER BY cells.event_type, cells.cohort""".stripMargin

  /** q233: Benford first-digit audit — the fraud/synthetic-data
    * screen: the leading significant digit of every line item's cent
    * price against Benford's log₁₀(1+1/d) law. Digit shares in ppm by
    * floor division; the nine Benford constants are fixed public
    * literals on BOTH sides (no runtime log10 — libm low bits differ).
    * One scan, digit extraction per-row codegen, 9-row output.
    */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val benford = typedLit(Map(
      1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
      6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L))
    val cents = round(col("l_extendedprice") * 100).cast(LongType)
    val digits = t(s, dir, "lineitem")
      .select(substring(cents.cast(StringType), 1, 1).cast(IntegerType).as("digit"))
      .filter(col("digit") >= 1)
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    digits
      .crossJoin(broadcast(digits.agg(sum(col("n")).as("total"))))
      .select(col("digit").cast(LongType).as("digit"), col("n"),
        idiv(col("n") * 1000000L, col("total")).as("share_ppm"),
        element_at(benford, col("digit")).as("benford_ppm"))
      .withColumn("dev_ppm", abs(col("share_ppm") - col("benford_ppm")))
      .orderBy(col("digit"))
  }

  private val q233Sql: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |    AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM lineitem),
      |h AS (SELECT digit, COUNT(*) AS n FROM d WHERE digit >= 1 GROUP BY 1),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h),
      |b AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
      |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
      |  (9, 45757)) AS v(digit, benford_ppm))
      |SELECT CAST(h.digit AS BIGINT) AS digit, h.n,
      |  (h.n * 1000000) // (SELECT total FROM t) AS share_ppm,
      |  CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
      |  abs((h.n * 1000000) // (SELECT total FROM t) - b.benford_ppm) AS dev_ppm
      |FROM h JOIN b ON b.digit = h.digit
      |ORDER BY digit""".stripMargin

  /** q234: largest-remainder apportionment — allocate an EXACT sample
    * budget of 1000 across (lang, source) strata proportionally (the
    * Hare-quota method elections and exact-budget curation mixes use):
    * floor quota per stratum, then the leftover seats go to the
    * largest remainders (ties by stratum key). Allocations always sum
    * to exactly 1000 — the property q93's proportional mix only
    * approximates. The stratum table is vocabulary-bounded, so the
    * remainder-ranking window is over a tiny frame; the only
    * data-sized work is the one stratum-count aggregate.
    */
  def apportionment(s: SparkSession, dir: String): DataFrame = {
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val K = 1000L
    val strata = t(s, dir, "documents")
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n_docs"))
    val withBase = strata.crossJoin(broadcast(
        strata.agg(sum(col("n_docs")).cast(LongType).as("total"))))
      .withColumn("base", idiv(lit(K) * col("n_docs"), col("total")))
      .withColumn("rem", lit(K) * col("n_docs") - col("base") * col("total"))
    val leftover = withBase.agg((lit(K) - sum(col("base"))).cast(LongType).as("l"))
    withBase.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("lang"), col("source"))))
      .select(col("lang"), col("source"), col("n_docs"),
        (col("base") + when(col("rk") <= col("l"), 1L).otherwise(0L)).as("alloc"))
      .orderBy(col("lang"), col("source"))
  }

  private val q234Sql: String =
    """WITH strata AS (
      |  SELECT lang, source, COUNT(*) AS n_docs FROM documents GROUP BY 1, 2),
      |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM strata),
      |base AS (
      |  SELECT lang, source, n_docs,
      |    (1000 * n_docs) // (SELECT total FROM tot) AS base,
      |    1000 * n_docs - ((1000 * n_docs) // (SELECT total FROM tot))
      |      * (SELECT total FROM tot) AS rem
      |  FROM strata),
      |l AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS l FROM base),
      |rk AS (
      |  SELECT *, row_number() OVER (ORDER BY rem DESC, lang, source) AS rk
      |  FROM base)
      |SELECT lang, source, n_docs,
      |  CAST(base + CASE WHEN rk <= (SELECT l FROM l) THEN 1 ELSE 0 END
      |    AS BIGINT) AS alloc
      |FROM rk ORDER BY lang, source""".stripMargin

  /** q235: timezone battery — the IANA/DST semantics every
    * multi-region pipeline leans on: UTC event instants rendered as
    * America/New_York wall time (offset −4 h in EDT, −5 h in EST, both
    * counted — the driver window is winter-only so EDT legitimately
    * counts 0 there; the spec supplies the summer case) and
    * Asia/Kolkata (+5:30 — the half-hour-offset class), plus the NY
    * local-date count per type. The offset is derived as
    * wall-epoch − utc-epoch in whole hours/minutes — pure integer —
    * and both engines resolve zones from IANA tzdata.
    */
  def timezoneBattery(s: SparkSession, dir: String): DataFrame = {
    def idiv(a: Column, b: Long) = call_function("div", a, lit(b))
    val e = t(s, dir, "events")
    val ny = from_utc_timestamp(col("ts"), "America/New_York")
    val ist = from_utc_timestamp(col("ts"), "Asia/Kolkata")
    e.select(col("event_type"),
        idiv(unix_micros(ny) - unix_micros(col("ts")), 3600000000L).as("ny_off_h"),
        idiv(unix_micros(ist) - unix_micros(col("ts")), 60000000L).as("ist_off_m"),
        to_date(ny).as("ny_date"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ny_off_h") === -4, 1L).otherwise(0L)).as("n_edt"),
        sum(when(col("ny_off_h") === -5, 1L).otherwise(0L)).as("n_est"),
        sum(when(col("ist_off_m") === 330, 1L).otherwise(0L)).as("n_ist_530"),
        countDistinct(col("ny_date")).as("n_ny_days"))
      .orderBy(col("event_type"))
  }

  private val q235Sql: String =
    """WITH x AS (
      |  SELECT event_type,
      |    (epoch_us((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York')
      |      - epoch_us(ts)) // 3600000000 AS ny_off_h,
      |    (epoch_us((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Kolkata')
      |      - epoch_us(ts)) // 60000000 AS ist_off_m,
      |    CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS DATE)
      |      AS ny_date
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN ny_off_h = -4 THEN 1 ELSE 0 END) AS BIGINT) AS n_edt,
      |  CAST(SUM(CASE WHEN ny_off_h = -5 THEN 1 ELSE 0 END) AS BIGINT) AS n_est,
      |  CAST(SUM(CASE WHEN ist_off_m = 330 THEN 1 ELSE 0 END) AS BIGINT) AS n_ist_530,
      |  CAST(COUNT(DISTINCT ny_date) AS BIGINT) AS n_ny_days
      |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q236: MIN/MAX view maintenance with delete-scoped recompute —
    * the non-self-maintainable complement to q224: max is algebraic
    * under INSERTS (combine) but a delete can remove the maximum, so
    * groups TOUCHED by the delete delta recompute from base∖del∪ins
    * (a semi-join-scoped scan) while untouched groups stay on the
    * O(|view|) combine path. Each row reports which path produced it
    * — and the whole table is pinned ≡ the full recompute. At 100 TB
    * the recompute leg reads only the touched groups' partitions
    * (q147/q208's pruning), which is the entire point.
    */
  def minmaxMaintenance(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(
      col("event_id"), to_date(col("ts")).as("d"), col("event_type"),
      round(col("value") * 100).cast(LongType).as("cents"))
    val base = e.filter(col("event_id") % 10 < 8)
    val ins = e.filter(col("event_id") % 10 >= 8)
    val del = base.filter(col("event_id") % 7 === 3)
    val touched = del.select(col("d"), col("event_type")).distinct()
    def agg(df: DataFrame): DataFrame =
      df.groupBy(col("d"), col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("cents")).as("max_cents"))
    // algebraic combine for groups the delete never touched
    val algebraic = agg(base).unionByName(agg(ins))
      .groupBy(col("d"), col("event_type"))
      .agg(sum(col("n")).as("n"), max(col("max_cents")).as("max_cents"))
      .join(touched, Seq("d", "event_type"), "left_anti")
      .withColumn("path", lit("algebraic"))
    // scoped recompute for touched groups only
    val recomputed = agg(
        base.join(del.select(col("event_id")), Seq("event_id"), "left_anti")
          .unionByName(ins)
          .join(touched, Seq("d", "event_type"), "left_semi"))
      .withColumn("path", lit("recomputed"))
    algebraic.unionByName(recomputed)
      .filter(col("n") > 0)
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("max_cents"), col("path"))
      .orderBy(col("day"), col("event_type"))
  }

  private val q236Sql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(ts AS DATE) AS d, event_type,
      |    CAST(round(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |touched AS (
      |  SELECT DISTINCT d, event_type FROM e
      |  WHERE event_id % 10 < 8 AND event_id % 7 = 3),
      |survivors AS (
      |  SELECT * FROM e WHERE NOT (event_id % 10 < 8 AND event_id % 7 = 3)),
      |v AS (
      |  SELECT d, event_type, COUNT(*) AS n, MAX(cents) AS max_cents
      |  FROM survivors GROUP BY 1, 2 HAVING COUNT(*) > 0)
      |SELECT strftime(v.d, '%Y-%m-%d') AS day, v.event_type, v.n, v.max_cents,
      |  CASE WHEN t.d IS NOT NULL THEN 'recomputed' ELSE 'algebraic' END AS path
      |FROM v LEFT JOIN touched t
      |  ON t.d = v.d AND t.event_type = v.event_type
      |ORDER BY day, v.event_type""".stripMargin

  /** q237: smoothed target encoding — the ML feature-engineering
    * staple (category → Laplace-smoothed mean target): enc =
    * (Σy + α·μ)/(n + α) with α=20, all in integer milli-cents — the
    * global mean enters as a broadcast scalar, one category aggregate
    * does the rest, and the floor arithmetic makes encodings
    * bit-identical across engines (a float encoder's low bits depend
    * on the reduction tree — poison for cached feature reproducibility).
    */
  def targetEncoding(s: SparkSession, dir: String): DataFrame = {
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val e = t(s, dir, "events").select(col("event_type"),
      (col("user_id") % 5).as("cohort"),
      round(col("value") * 100).cast(LongType).as("cents"))
    val cats = e.groupBy(col("event_type"), col("cohort"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    val glob = cats.agg(
      idiv(sum(col("sum_cents")) * 1000L, sum(col("n"))).as("gmean_mc"))
    cats.crossJoin(broadcast(glob))
      .select(col("event_type"), col("cohort"), col("n"),
        idiv(col("sum_cents") * 1000L + lit(20L) * col("gmean_mc"),
          col("n") + 20L).as("enc_mc"))
      .orderBy(col("event_type"), col("cohort"))
  }

  private val q237Sql: String =
    """WITH cats AS (
      |  SELECT event_type, user_id % 5 AS cohort, COUNT(*) AS n,
      |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
      |  FROM events GROUP BY 1, 2),
      |g AS (SELECT CAST(SUM(sum_cents) * 1000 AS BIGINT)
      |        // CAST(SUM(n) AS BIGINT) AS gmean_mc FROM cats)
      |SELECT event_type, cohort, n,
      |  (sum_cents * 1000 + 20 * (SELECT gmean_mc FROM g)) // (n + 20) AS enc_mc
      |FROM cats ORDER BY event_type, cohort""".stripMargin

  /** q238: capped dwell-time accounting — "how long did users stay on
    * each step": the gap to the SAME user's next event, capped at
    * 30 min (the standard abandonment convention — an overnight gap is
    * not a 9-hour page view), summed per event type in whole seconds.
    * One lead() window pass + one aggregate; the cap count is emitted
    * so the convention's effect is visible, and last events (no next)
    * are excluded rather than imputed.
    */
  def dwellTimes(s: SparkSession, dir: String): DataFrame = {
    def idiv(a: Column, b: Long) = call_function("div", a, lit(b))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("gap_s",
        idiv(unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")), 1000000L))
      .filter(col("gap_s").isNotNull)
      .withColumn("dwell_s", least(col("gap_s"), lit(1800L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("dwell_s")).as("total_dwell_s"),
        sum(when(col("gap_s") > 1800L, 1L).otherwise(0L)).as("n_capped"))
      .orderBy(col("event_type"))
  }

  private val q238Sql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |      - epoch_us(ts)) // 1000000 AS gap_s
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(LEAST(gap_s, 1800)) AS BIGINT) AS total_dwell_s,
      |  CAST(SUM(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_capped
      |FROM g WHERE gap_s IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q239: experiment exposure accounting (intent-to-treat) — the A/B
    * bookkeeping every growth team runs: deterministic arm assignment
    * (user parity — in production a salted hash, same shape), exposure
    * = the user's FIRST view event, and only purchases strictly AFTER
    * exposure count as conversions. Per arm: exposed users,
    * converters, conversions, conversion ppm (floor). One min-
    * aggregate for exposures + one user-keyed join of purchases —
    * never purchases × full history. Feeds q232's chi-square cells.
    */
  def abExposure(s: SparkSession, dir: String): DataFrame = {
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val e = t(s, dir, "events")
    val exposure = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("exp_ts"))
      .withColumn("arm", col("user_id") % 2)
    val conv = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .join(exposure, "user_id")
      .filter(col("ts") > col("exp_ts"))
      .groupBy(col("arm"))
      .agg(countDistinct(col("user_id")).as("n_converters"),
        count(lit(1)).as("n_conversions"))
    exposure.groupBy(col("arm")).agg(count(lit(1)).as("n_exposed"))
      .join(conv, Seq("arm"), "left")
      .select(col("arm"), col("n_exposed"),
        coalesce(col("n_converters"), lit(0L)).as("n_converters"),
        coalesce(col("n_conversions"), lit(0L)).as("n_conversions"))
      .withColumn("conv_ppm",
        idiv(col("n_converters") * 1000000L, col("n_exposed")))
      .orderBy(col("arm"))
  }

  private val q239Sql: String =
    """WITH exposure AS (
      |  SELECT user_id, user_id % 2 AS arm, MIN(ts) AS exp_ts
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |conv AS (
      |  SELECT x.arm, COUNT(DISTINCT p.user_id) AS n_converters,
      |    COUNT(*) AS n_conversions
      |  FROM events p JOIN exposure x ON x.user_id = p.user_id
      |  WHERE p.event_type = 'purchase' AND p.ts > x.exp_ts
      |  GROUP BY 1),
      |exp2 AS (SELECT arm, COUNT(*) AS n_exposed FROM exposure GROUP BY 1)
      |SELECT exp2.arm, exp2.n_exposed,
      |  CAST(COALESCE(conv.n_converters, 0) AS BIGINT) AS n_converters,
      |  CAST(COALESCE(conv.n_conversions, 0) AS BIGINT) AS n_conversions,
      |  (CAST(COALESCE(conv.n_converters, 0) AS BIGINT) * 1000000)
      |    // exp2.n_exposed AS conv_ppm
      |FROM exp2 LEFT JOIN conv ON conv.arm = exp2.arm
      |ORDER BY exp2.arm""".stripMargin

  /** q240: clamped running balance — the recurrence
    * b_t = max(0, b_{t−1} + x_t) (wallet balances, inventory stock,
    * token credits) looks driver-sequential, but has the closed form
    * b_t = S_t − min(0, min_{j≤t} S_j) over the plain prefix sum S —
    * so it runs as TWO window functions on ONE window spec (one sort,
    * one pass), fully distributed, where the naive formulation
    * collects each key's history. Deltas are integer cents (purchases
    * debit, everything else credits); per user the final balance and
    * how often the floor was hit.
    */
  def clampedBalance(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val delta = when(col("event_type") === "purchase",
      -round(col("value") * 100).cast(LongType))
      .otherwise(round(col("value") * 100).cast(LongType))
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), delta.as("x"))
      .withColumn("s", sum(col("x")).over(w))
      .withColumn("m", least(lit(0L), min(col("s")).over(w)))
      .withColumn("b", col("s") - col("m"))
      .groupBy(col("user_id"))
      .agg(expr("max_by(b, struct(ts, event_id))").as("final_balance"),
        sum(when(col("b") === 0L, 1L).otherwise(0L)).as("n_floor_hits"))
      .orderBy(col("user_id"))
  }

  private val q240Sql: String =
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN event_type = 'purchase'
      |      THEN -CAST(round(value * 100, 0) AS BIGINT)
      |      ELSE CAST(round(value * 100, 0) AS BIGINT) END AS x
      |  FROM events),
      |ps AS (
      |  SELECT user_id, ts, event_id,
      |    SUM(x) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS s
      |  FROM x),
      |p AS (
      |  SELECT user_id, ts, event_id, s,
      |    LEAST(0, MIN(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING)) AS m
      |  FROM ps),
      |b AS (
      |  SELECT user_id, ts, event_id, s - m AS b,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM p)
      |SELECT user_id,
      |  CAST(MAX(CASE WHEN rn = 1 THEN b END) AS BIGINT) AS final_balance,
      |  CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_floor_hits
      |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q242: hierarchical share-of-parent rollup — revenue contribution
    * at two levels of the region→nation hierarchy in exact ppm (floor):
    * each nation's share of its region and each region's share of the
    * total, computed from ONE fact aggregate with the dimension-sized
    * parent totals broadcast back. The drill-down dashboard shape: the
    * fact table is scanned once no matter how deep the hierarchy.
    */
  def hierarchyShares(s: SparkSession, dir: String): DataFrame = {
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    val natRev = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(round(col("o_totalprice") * 100).cast(LongType)).as("rev_cents"))
    val regRev = natRev.groupBy(col("r_name"))
      .agg(sum(col("rev_cents")).as("reg_cents"))
    val totRev = regRev.agg(sum(col("reg_cents")).as("tot_cents"))
    natRev
      .join(broadcast(regRev), "r_name")
      .crossJoin(broadcast(totRev))
      .select(col("r_name"), col("n_name"), col("rev_cents"),
        idiv(col("rev_cents") * 1000000L, col("reg_cents")).as("nation_share_ppm"),
        idiv(col("reg_cents") * 1000000L, col("tot_cents")).as("region_share_ppm"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q242Sql: String =
    """WITH nat AS (
      |  SELECT r_name, n_name,
      |    CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
      |      AS rev_cents
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |reg AS (SELECT r_name, CAST(SUM(rev_cents) AS BIGINT) AS reg_cents
      |        FROM nat GROUP BY 1),
      |tot AS (SELECT CAST(SUM(reg_cents) AS BIGINT) AS tot_cents FROM reg)
      |SELECT nat.r_name, nat.n_name, nat.rev_cents,
      |  (nat.rev_cents * 1000000) // reg.reg_cents AS nation_share_ppm,
      |  (reg.reg_cents * 1000000) // (SELECT tot_cents FROM tot)
      |    AS region_share_ppm
      |FROM nat JOIN reg ON reg.r_name = nat.r_name
      |ORDER BY nat.r_name, nat.n_name""".stripMargin

  /** q243: weighted exact quantiles — the p50/p90 of l_quantity where
    * each value counts by its revenue WEIGHT (cents), from the
    * value-frequency table: the least value whose cumulative weight
    * crosses k/10 of the total, tested as 10·cum ≥ k·total so no
    * division ever happens. q200's exact-quantile discipline extended
    * to weights — the "median basket size by spend" family. One
    * aggregate over values + one tiny cumulative window.
    */
  def weightedQuantiles(s: SparkSession, dir: String): DataFrame = {
    val freq = t(s, dir, "lineitem")
      .groupBy(col("l_quantity").cast(LongType).as("v"))
      .agg(sum(round(col("l_extendedprice") * 100).cast(LongType)).as("w"))
    val wcum = freq
      .withColumn("cum", sum(col("w")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(freq.agg(sum(col("w")).as("total"))))
    def pick(k: Int): DataFrame = wcum
      .filter(col("cum") * 10 >= col("total") * k)
      .agg(min(col("v")).as("value"))
      .select(lit(s"wp$k").as("stat"), col("value"))
    pick(5).unionByName(pick(9)).orderBy(col("stat"))
  }

  private val q243Sql: String =
    """WITH freq AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS v,
      |    CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1),
      |wcum AS (
      |  SELECT v, SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
      |    (SELECT CAST(SUM(w) AS BIGINT) FROM freq) AS total
      |  FROM freq)
      |SELECT 'wp5' AS stat, CAST(MIN(v) AS BIGINT) AS value
      |FROM wcum WHERE cum * 10 >= total * 5
      |UNION ALL
      |SELECT 'wp9', CAST(MIN(v) AS BIGINT)
      |FROM wcum WHERE cum * 10 >= total * 9
      |ORDER BY stat""".stripMargin

  /** q244: exact penny allocation — split each order's total across its
    * line items proportionally to extended price WITHOUT losing a cent
    * (the fintech invariant naive rounding breaks): floor quotas per
    * item, then the order's leftover cents go to the largest
    * remainders (line-number tie-break) — q234's Hare quota at
    * per-order granularity, the window frame bounded by items-per-
    * order (≤7 in TPC-H shape). The pin aggregates the per-order
    * conservation check: allocated ≡ total for EVERY order.
    */
  def pennyAllocation(s: SparkSession, dir: String): DataFrame = {
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val li = t(s, dir, "lineitem").select(col("l_orderkey"),
      col("l_linenumber"),
      round(col("l_extendedprice") * 100).cast(LongType).as("w"))
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      round(col("o_totalprice") * 100).cast(LongType).as("total"))
    val wo = Window.partitionBy(col("l_orderkey"))
    val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("wsum", sum(col("w")).over(wo))
      .withColumn("base", idiv(col("total") * col("w"), col("wsum")))
      .withColumn("rem", col("total") * col("w") - col("base") * col("wsum"))
      .withColumn("rk", row_number().over(
        wo.orderBy(col("rem").desc, col("l_linenumber"))))
      .withColumn("leftover", col("total") - sum(col("base")).over(wo))
      .withColumn("alloc",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
    j.groupBy(col("l_orderkey"), col("total"))
      .agg(sum(col("alloc")).as("allocated"), count(lit(1)).as("n_items"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("allocated") === col("total"), 1L).otherwise(0L))
          .as("n_conserved"),
        sum(col("allocated")).as("sum_allocated"),
        sum(col("total")).as("sum_totals"),
        max(col("n_items")).as("max_items"))
  }

  private val q244Sql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS w
      |  FROM lineitem),
      |o AS (
      |  SELECT o_orderkey, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total
      |  FROM orders),
      |j AS (
      |  SELECT li.l_orderkey, li.l_linenumber, li.w, o.total,
      |    SUM(li.w) OVER (PARTITION BY li.l_orderkey) AS wsum
      |  FROM li JOIN o ON o.o_orderkey = li.l_orderkey),
      |q AS (
      |  SELECT *, (total * w) // wsum AS base,
      |    total * w - ((total * w) // wsum) * wsum AS rem
      |  FROM j),
      |r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY rem DESC, l_linenumber) AS rk,
      |    total - SUM(base) OVER (PARTITION BY l_orderkey) AS leftover
      |  FROM q),
      |a AS (
      |  SELECT l_orderkey, total,
      |    CAST(SUM(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS BIGINT)
      |      AS allocated,
      |    COUNT(*) AS n_items
      |  FROM r GROUP BY 1, 2)
      |SELECT COUNT(*) AS n_orders,
      |  CAST(SUM(CASE WHEN allocated = total THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_conserved,
      |  CAST(SUM(allocated) AS BIGINT) AS sum_allocated,
      |  CAST(SUM(total) AS BIGINT) AS sum_totals,
      |  CAST(MAX(n_items) AS BIGINT) AS max_items
      |FROM a""".stripMargin

  /** q245: event-order protocol audit — do user timelines respect the
    * expected partial order (signup precedes first purchase, a view
    * precedes the first click): per-user first-occurrence timestamps
    * per type from ONE conditional-aggregation pass, then counted
    * violations per rule. The sequence-constraint sibling of q220's
    * value constraints — a protocol regression (SDK fires purchase
    * before signup) surfaces as a nonzero audit row, engine-exactly.
    */
  def protocolAudit(s: SparkSession, dir: String): DataFrame = {
    val firsts = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("f_signup"),
        min(when(col("event_type") === "view", col("ts"))).as("f_view"),
        min(when(col("event_type") === "click", col("ts"))).as("f_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("f_purchase"))
    def rule(name: String, violated: Column, applicable: Column): DataFrame =
      firsts.agg(
          sum(when(applicable, 1L).otherwise(0L)).as("n_applicable"),
          sum(when(applicable && violated, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(name).as("rule"), col("n_applicable"), col("n_violations"))
    rule("click_before_any_view",
        col("f_view").isNull || col("f_click") < col("f_view"),
        col("f_click").isNotNull)
      .unionByName(rule("purchase_before_any_signup",
        col("f_signup").isNull || col("f_purchase") < col("f_signup"),
        col("f_purchase").isNotNull))
      .unionByName(rule("purchase_before_any_view",
        col("f_view").isNull || col("f_purchase") < col("f_view"),
        col("f_purchase").isNotNull))
      .orderBy(col("rule"))
  }

  private val q245Sql: String =
    """WITH firsts AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS f_signup,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS f_view,
      |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS f_click,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS f_purchase
      |  FROM events GROUP BY 1)
      |SELECT 'click_before_any_view' AS rule,
      |  CAST(SUM(CASE WHEN f_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_applicable,
      |  CAST(SUM(CASE WHEN f_click IS NOT NULL
      |    AND (f_view IS NULL OR f_click < f_view) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violations
      |FROM firsts
      |UNION ALL
      |SELECT 'purchase_before_any_signup',
      |  CAST(SUM(CASE WHEN f_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(SUM(CASE WHEN f_purchase IS NOT NULL
      |    AND (f_signup IS NULL OR f_purchase < f_signup) THEN 1 ELSE 0 END)
      |    AS BIGINT)
      |FROM firsts
      |UNION ALL
      |SELECT 'purchase_before_any_view',
      |  CAST(SUM(CASE WHEN f_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(SUM(CASE WHEN f_purchase IS NOT NULL
      |    AND (f_view IS NULL OR f_purchase < f_view) THEN 1 ELSE 0 END) AS BIGINT)
      |FROM firsts
      |ORDER BY rule""".stripMargin

  /** q246: UTF-8 semantics battery — CHARACTER-based string functions
    * over multi-byte text (Latin accents + CJK synthesized onto real
    * document prefixes): length counts characters, octet length counts
    * bytes (they must differ by exactly the multi-byte surplus),
    * substring never splits a code point, upper() handles accents, and
    * reverse() reverses characters, not bytes. The i18n contract a
    * byte-oriented engine silently corrupts.
    */
  def utf8Battery(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        concat(lit("café_"), substring(col("text"), 1, 5), lit("_日本語")).as("x"))
      .select(col("doc_id"),
        length(col("x")).cast(LongType).as("n_chars"),
        octet_length(col("x")).cast(LongType).as("n_bytes"),
        substring(col("x"), 1, 4).as("first4"),
        upper(substring(col("x"), 1, 4)).as("up4"),
        reverse(substring(col("x"), -3, 3)).as("rev3"))
      .orderBy(col("doc_id"))

  private val q246Sql: String =
    """WITH x AS (
      |  SELECT doc_id, 'café_' || substr(text, 1, 5) || '_日本語' AS x
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(x) AS BIGINT) AS n_chars,
      |  CAST(strlen(x) AS BIGINT) AS n_bytes,
      |  substr(x, 1, 4) AS first4,
      |  upper(substr(x, 1, 4)) AS up4,
      |  reverse(substr(x, length(x) - 2, 3)) AS rev3
      |FROM x ORDER BY doc_id""".stripMargin

  /** q247: duplicate-charge detection — two purchases by the SAME user
    * in the SAME 10-dollar amount band within 24 hours (the double-
    * submit / retry screen; real double charges repeat the amount, and
    * the band absorbs cent-level fee jitter): pairs found via the
    * canonical-bin interval self-join (each candidate probes its two
    * covering 24 h bins on the (user, band) key — never a user-history
    * cross join), ordered pairs counted once under the (ts, event_id)
    * total order. Per flagged user: pair count and cents at risk.
    */
  def doubleCharges(s: SparkSession, dir: String): DataFrame = {
    val B = 86400L * 1000000L
    def idiv(a: Column, b: Long) = call_function("div", a, lit(b))
    val p = t(s, dir, "events").filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), round(col("value") * 100).cast(LongType).as("cents"))
      .withColumn("band", call_function("div", col("cents"), lit(1000L)))
    val a = p.withColumn("bin", explode(array(idiv(col("t"), B), idiv(col("t"), B) + 1)))
      .select(col("user_id"), col("band"), col("bin"),
        col("t").as("ta"), col("event_id").as("ida"), col("cents"))
    val b = p.withColumn("bin", idiv(col("t"), B))
      .select(col("user_id"), col("band"), col("bin"),
        col("t").as("tb"), col("event_id").as("idb"))
    a.join(b, Seq("user_id", "band", "bin"))
      .filter((col("ta") < col("tb") ||
        (col("ta") === col("tb") && col("ida") < col("idb"))) &&
        col("tb") - col("ta") <= B)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("cents")).as("cents_at_risk"))
      .orderBy(col("user_id"))
  }

  private val q247Sql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_us(ts) AS t, event_id,
      |    CAST(round(value * 100, 0) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase')
      |SELECT a.user_id, COUNT(*) AS n_pairs,
      |  CAST(SUM(a.cents) AS BIGINT) AS cents_at_risk
      |FROM p a JOIN p b
      |  ON b.user_id = a.user_id AND b.cents // 1000 = a.cents // 1000
      |  AND (a.t < b.t OR (a.t = b.t AND a.event_id < b.event_id))
      |  AND b.t - a.t <= 86400000000
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin

  /** q248: activity streaks — each user's longest run of CONSECUTIVE
    * active days (the retention/habit metric): distinct active days,
    * then the gaps-and-islands identity day − row_number() = constant
    * within a streak — one distinct aggregate + one window + one
    * aggregate, no self-join, no recursion.
    */
  def activityStreaks(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    days
      .withColumn("island", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("max_streak"), sum(col("len")).as("n_active_days"))
      .orderBy(col("user_id"))
  }

  private val q248Sql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |isl AS (
      |  SELECT user_id,
      |    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
      |      AS INTEGER) AS island
      |  FROM days),
      |st AS (
      |  SELECT user_id, island, COUNT(*) AS len FROM isl GROUP BY 1, 2)
      |SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
      |  CAST(SUM(len) AS BIGINT) AS n_active_days
      |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q249: FIFO lot matching — the order-matching / cost-basis
    * primitive (match each consumption against acquisitions oldest-
    * first): per user, buys (views) and sells (purchases) become
    * cumulative-quantity INTERVALS, and FIFO matching is exactly their
    * interval overlap — matched(i,j) = max(0, min(hiB, hiS) −
    * max(loB, loS)) — so the seemingly sequential ledger walk is one
    * user-keyed join + an overlap filter, per-user bounded (at 100 TB
    * band the cumulative ranges like q39 if single users carry huge
    * ledgers). All quantities integer cents; per user: bought, sold,
    * matched (≡ min(bought, sold) by algebra — the join must reproduce
    * it), and the touched lot-pair count.
    */
  def fifoMatching(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        round(col("value") * 100).cast(LongType).as("q"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def lots(tpe: String, lo: String, hi: String) = e
      .filter(col("event_type") === tpe)
      .withColumn(hi, sum(col("q")).over(w))
      .withColumn(lo, col(hi) - col("q"))
    val buys = lots("view", "lob", "hib")
      .select(col("user_id"), col("lob"), col("hib"))
    val sells = lots("purchase", "los", "his")
      .select(col("user_id").as("su"), col("los"), col("his"))
    val pairs = buys.join(sells, col("user_id") === col("su") &&
        col("hib") > col("los") && col("his") > col("lob"))
      .select(col("user_id"),
        (least(col("hib"), col("his")) - greatest(col("lob"), col("los"))).as("m"))
    val totals = e.groupBy(col("user_id")).agg(
      sum(when(col("event_type") === "view", col("q")).otherwise(0L)).as("bought"),
      sum(when(col("event_type") === "purchase", col("q")).otherwise(0L)).as("sold"))
    totals.join(pairs.groupBy(col("user_id"))
        .agg(sum(col("m")).as("matched"), count(lit(1)).as("n_lot_pairs")),
        Seq("user_id"), "left")
      .select(col("user_id"), col("bought"), col("sold"),
        coalesce(col("matched"), lit(0L)).as("matched"),
        coalesce(col("n_lot_pairs"), lit(0L)).as("n_lot_pairs"))
      .orderBy(col("user_id"))
  }

  private val q249Sql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CAST(round(value * 100, 0) AS BIGINT) AS q
      |  FROM events),
      |b AS (
      |  SELECT user_id,
      |    SUM(q) OVER w - q AS lob, SUM(q) OVER w AS hib
      |  FROM e WHERE event_type = 'view'
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING)),
      |s AS (
      |  SELECT user_id,
      |    SUM(q) OVER w - q AS los, SUM(q) OVER w AS his
      |  FROM e WHERE event_type = 'purchase'
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING)),
      |m AS (
      |  SELECT b.user_id,
      |    LEAST(b.hib, s.his) - GREATEST(b.lob, s.los) AS m
      |  FROM b JOIN s ON s.user_id = b.user_id
      |    AND b.hib > s.los AND s.his > b.lob),
      |tot AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN q ELSE 0 END) AS BIGINT)
      |      AS bought,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN q ELSE 0 END) AS BIGINT)
      |      AS sold
      |  FROM e GROUP BY 1),
      |mm AS (
      |  SELECT user_id, CAST(SUM(m) AS BIGINT) AS matched,
      |    COUNT(*) AS n_lot_pairs
      |  FROM m GROUP BY 1)
      |SELECT tot.user_id, tot.bought, tot.sold,
      |  CAST(COALESCE(mm.matched, 0) AS BIGINT) AS matched,
      |  CAST(COALESCE(mm.n_lot_pairs, 0) AS BIGINT) AS n_lot_pairs
      |FROM tot LEFT JOIN mm ON mm.user_id = tot.user_id
      |ORDER BY tot.user_id""".stripMargin

  /** q250: tiered marginal commission — the tax-bracket computation
    * (first $10k at 5%, next $40k at 3%, the rest at 1%, each tier's
    * cut floored separately in cents — marginal, so crossing a
    * threshold never reduces take-home, the property flat-rate CASE
    * ladders get wrong): pure per-row integer arithmetic rolled up per
    * order priority. The billing/royalty primitive.
    */
  def tieredCommission(s: SparkSession, dir: String): DataFrame = {
    def idiv(a: Column, b: Long) = call_function("div", a, lit(b))
    val total = round(col("o_totalprice") * 100).cast(LongType)
    val t1 = least(total, lit(1000000L))
    val t2 = least(greatest(total - 1000000L, lit(0L)), lit(4000000L))
    val t3 = greatest(total - 5000000L, lit(0L))
    val comm = idiv(t1 * 5, 100L) + idiv(t2 * 3, 100L) + idiv(t3 * 1, 100L)
    t(s, dir, "orders")
      .select(col("o_orderpriority"), comm.as("c"), total.as("tc"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("tc")).as("sum_cents"),
        sum(col("c")).as("sum_commission_cents"))
      .orderBy(col("o_orderpriority"))
  }

  private val q250Sql: String =
    """WITH o AS (
      |  SELECT o_orderpriority,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS tc
      |  FROM orders),
      |c AS (
      |  SELECT o_orderpriority, tc,
      |    (LEAST(tc, 1000000) * 5) // 100
      |    + (LEAST(GREATEST(tc - 1000000, 0), 4000000) * 3) // 100
      |    + (GREATEST(tc - 5000000, 0) * 1) // 100 AS c
      |  FROM o)
      |SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(tc) AS BIGINT) AS sum_cents,
      |  CAST(SUM(c) AS BIGINT) AS sum_commission_cents
      |FROM c GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** q251: exact distributed AUC via rank statistics — the model-eval
    * primitive at corpus scale. For each candidate scoring model, AUC
    * is the Mann-Whitney pair statistic: with per-distinct-score
    * positive/negative counts p(s), n(s) and the running count of
    * negatives strictly below s, 2·P·N·AUC = 2·Σ p(s)·negBelow(s) +
    * Σ p(s)·n(s) (ties count half) — all integer, no sort of raw rows.
    * The plan is one groupBy(model, score) that collapses 100 TB of
    * rows to the score domain BEFORE the per-model ordered prefix sum
    * (window over the tiny distinct-score set), so the window never
    * sees raw data. Three models with different tie structure pin the
    * tie-correction arithmetic; auc_ppm is floor(1e6·num/den).
    */
  def aucExact(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(
      round(col("value") * 100).cast(LongType).as("cents"),
      col("user_id"),
      (col("event_type") === "purchase").cast(LongType).as("y"))
    val scored = e.select(explode(array(
        struct(lit("m1_cents997").as("model"), pmod(col("cents"), lit(997L)).as("score")),
        struct(lit("m2_cents101").as("model"), pmod(col("cents"), lit(101L)).as("score")),
        struct(lit("m3_user31").as("model"), pmod(col("user_id"), lit(31L)).as("score"))))
        .as("ms"), col("y"))
      .select(col("ms.model").as("model"), col("ms.score").as("score"), col("y"))
    val perScore = scored.groupBy(col("model"), col("score"))
      .agg(sum(col("y")).as("p"), sum(lit(1L) - col("y")).as("n"))
    val w = Window.partitionBy(col("model")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withBelow = perScore
      .withColumn("neg_below", sum(col("n")).over(w) - col("n"))
    withBelow.groupBy(col("model"))
      .agg(sum(col("p")).as("pos"), sum(col("n")).as("neg"),
        sum(col("p") * col("neg_below")).as("concordant"),
        sum(col("p") * col("n")).as("tied"))
      .select(col("model"), col("pos"), col("neg"), col("concordant"), col("tied"),
        call_function("div",
          (lit(2L) * col("concordant") + col("tied")) * 1000000L,
          lit(2L) * col("pos") * col("neg")).as("auc_ppm"))
      .orderBy(col("model"))
  }

  private val q251Sql: String =
    """WITH e AS (
      |  SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents, user_id,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |scored AS (
      |  SELECT 'm1_cents997' AS model, cents % 997 AS score, y FROM e
      |  UNION ALL
      |  SELECT 'm2_cents101' AS model, cents % 101 AS score, y FROM e
      |  UNION ALL
      |  SELECT 'm3_user31' AS model, user_id % 31 AS score, y FROM e),
      |per_score AS (
      |  SELECT model, score, SUM(y) AS p, SUM(1 - y) AS n
      |  FROM scored GROUP BY 1, 2),
      |below AS (
      |  SELECT model, score, p, n,
      |    SUM(n) OVER (PARTITION BY model ORDER BY score
      |      ROWS UNBOUNDED PRECEDING) - n AS neg_below
      |  FROM per_score)
      |SELECT model, CAST(SUM(p) AS BIGINT) AS pos,
      |  CAST(SUM(n) AS BIGINT) AS neg,
      |  CAST(SUM(p * neg_below) AS BIGINT) AS concordant,
      |  CAST(SUM(p * n) AS BIGINT) AS tied,
      |  CAST(((2 * SUM(p * neg_below) + SUM(p * n)) * 1000000)
      |    // (2 * SUM(p) * SUM(n)) AS BIGINT) AS auc_ppm
      |FROM below GROUP BY model ORDER BY model""".stripMargin

  /** q252: classifier threshold-sweep evaluation — confusion matrix +
    * precision/recall/F1 across a threshold grid, the other half of
    * the model-eval pair (q251 is threshold-free). Rows collapse to
    * per-distinct-score (pos, neg) counts first — the 100 TB scan
    * reduces to the score domain — then a broadcast cross join against
    * the 9-row threshold grid aggregates cumulative counts per τ.
    * Ratios are floor-divided ppm; a threshold with no predicted
    * positives yields NULL precision/F1 (nullif guard in both engines,
    * not a fabricated 0).
    */
  def classifierEval(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(
      pmod(col("n_chars"), lit(100L)).as("score"),
      (col("lang") === "en").cast(LongType).as("y"))
    val perScore = d.groupBy(col("score"))
      .agg(sum(col("y")).as("p"), sum(lit(1L) - col("y")).as("n"))
    val taus = s.range(1, 10).select((col("id") * 10L).as("tau"))
    def ppm(num: Column, den: Column) =
      call_function("div", num * 1000000L, nullif(den, lit(0L)))
    perScore.crossJoin(broadcast(taus))
      .groupBy(col("tau"))
      .agg(sum(when(col("score") >= col("tau"), col("p")).otherwise(0L)).as("tp"),
        sum(when(col("score") >= col("tau"), col("n")).otherwise(0L)).as("fp"),
        sum(when(col("score") < col("tau"), col("p")).otherwise(0L)).as("fn"),
        sum(when(col("score") < col("tau"), col("n")).otherwise(0L)).as("tn"))
      .select(col("tau"), col("tp"), col("fp"), col("fn"), col("tn"),
        ppm(col("tp"), col("tp") + col("fp")).as("precision_ppm"),
        ppm(col("tp"), col("tp") + col("fn")).as("recall_ppm"),
        ppm(lit(2L) * col("tp"),
          lit(2L) * col("tp") + col("fp") + col("fn")).as("f1_ppm"))
      .orderBy(col("tau"))
  }

  private val q252Sql: String =
    """WITH d AS (
      |  SELECT n_chars % 100 AS score,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |per_score AS (
      |  SELECT score, SUM(y) AS p, SUM(1 - y) AS n FROM d GROUP BY 1),
      |taus AS (SELECT (i + 1) * 10 AS tau FROM range(9) r(i)),
      |cm AS (
      |  SELECT tau,
      |    SUM(CASE WHEN score >= tau THEN p ELSE 0 END) AS tp,
      |    SUM(CASE WHEN score >= tau THEN n ELSE 0 END) AS fp,
      |    SUM(CASE WHEN score < tau THEN p ELSE 0 END) AS fn,
      |    SUM(CASE WHEN score < tau THEN n ELSE 0 END) AS tn
      |  FROM per_score CROSS JOIN taus GROUP BY tau)
      |SELECT CAST(tau AS BIGINT) AS tau, CAST(tp AS BIGINT) AS tp,
      |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
      |  CAST(tn AS BIGINT) AS tn,
      |  CAST((tp * 1000000) // NULLIF(tp + fp, 0) AS BIGINT) AS precision_ppm,
      |  CAST((tp * 1000000) // NULLIF(tp + fn, 0) AS BIGINT) AS recall_ppm,
      |  CAST((2 * tp * 1000000) // NULLIF(2 * tp + fp + fn, 0) AS BIGINT)
      |    AS f1_ppm
      |FROM cm ORDER BY tau""".stripMargin

  /** q254: functional-dependency audit — data-profiling primitive
    * (schema inference, key discovery, denormalization safety): for
    * each candidate FD A → B, count LHS groups, groups with more than
    * one distinct RHS (violations), and the exact g3 repair size (min
    * rows to delete so the FD holds = Σ per-group (n − majority
    * count)), reported as floor-divided ppm. Each candidate is two
    * cascaded hash aggregations — (A, B) counts then per-A rollup — so
    * 100 TB reduces at the first groupBy and the FD verdict never
    * sorts or self-joins; candidates run independently and union.
    */
  def fdAudit(s: SparkSession, dir: String): DataFrame = {
    def fd(name: String, df: DataFrame, a: Column, b: Column): DataFrame =
      df.groupBy(a.as("lhs"), b.as("rhs")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("lhs"))
        .agg(sum(col("cnt")).as("grp_n"), max(col("cnt")).as("max_n"),
          count(lit(1)).as("n_rhs"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"),
          sum(col("grp_n")).as("n_rows"),
          sum(col("grp_n") - col("max_n")).as("n_delete"))
        .select(lit(name).as("fd"), col("n_lhs"), col("n_violating"),
          col("n_rows"), col("n_delete"),
          call_function("div", col("n_delete") * 1000000L, col("n_rows"))
            .as("g3_ppm"))
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    fd("li_orderkey_to_returnflag", li, col("l_orderkey"), col("l_returnflag"))
      .unionByName(fd("li_partkey_to_suppkey", li, col("l_partkey"), col("l_suppkey")))
      .unionByName(fd("o_custkey_to_priority", o, col("o_custkey"), col("o_orderpriority")))
      .unionByName(fd("o_orderkey_to_custkey", o, col("o_orderkey"), col("o_custkey")))
      .orderBy(col("fd"))
  }

  private val q254Sql: String = {
    def leg(name: String, table: String, a: String, b: String) =
      s"""SELECT '$name' AS fd, COUNT(*) AS n_lhs,
         |  SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS n_violating,
         |  SUM(grp_n) AS n_rows, SUM(grp_n - max_n) AS n_delete
         |FROM (
         |  SELECT lhs, SUM(cnt) AS grp_n, MAX(cnt) AS max_n, COUNT(*) AS n_rhs
         |  FROM (SELECT $a AS lhs, $b AS rhs, COUNT(*) AS cnt
         |        FROM $table GROUP BY 1, 2) g
         |  GROUP BY 1) gg""".stripMargin
    s"""WITH legs AS (
       |${leg("li_orderkey_to_returnflag", "lineitem", "l_orderkey", "l_returnflag")}
       |UNION ALL
       |${leg("li_partkey_to_suppkey", "lineitem", "l_partkey", "l_suppkey")}
       |UNION ALL
       |${leg("o_custkey_to_priority", "orders", "o_custkey", "o_orderpriority")}
       |UNION ALL
       |${leg("o_orderkey_to_custkey", "orders", "o_orderkey", "o_custkey")})
       |SELECT fd, CAST(n_lhs AS BIGINT) AS n_lhs,
       |  CAST(n_violating AS BIGINT) AS n_violating,
       |  CAST(n_rows AS BIGINT) AS n_rows,
       |  CAST(n_delete AS BIGINT) AS n_delete,
       |  CAST((n_delete * 1000000) // n_rows AS BIGINT) AS g3_ppm
       |FROM legs ORDER BY fd""".stripMargin
  }

  /** q255: grid-bucketed spatial neighbor join — the geo self-join
    * primitive (points-of-interest clustering, fraud co-location,
    * store catchment overlap) done the way it scales: points land in
    * 20×20 grid cells, the LEFT side replicates into its 3×3 cell
    * neighborhood (9 rows) and the join is a plain equi-join on cell —
    * because the radius (20) equals the cell width, every qualifying
    * pair differs by ≤1 cell per axis and matches on EXACTLY one
    * offset, so no pair dedup is needed and no all-pairs product ever
    * forms (the oracle IS the brute-force all-pairs semantics; the
    * engine plan is the scale path). Integer planar coordinates derive
    * from the seeded md5 hash (a multiplicative `k·c mod m` lattice
    * has NO near-but-distinct pairs — the filter would never fire);
    * distances compare squared.
    */
  /** q255's pair frame (grid-bucketed neighbor join, d² ≤ cell²
    * filtered, pre-aggregation) — exposed so [[graft.GeoProbe]] can
    * meter OUTPUT PAIRS vs wall time across corpus decades: the
    * emitted pair set itself grows superlinearly with density, so the
    * bench decade reads >10× while pairs/sec stays flat. */
  private[graft] def geoGridPairs(s: SparkSession, dir: String): DataFrame = {
    val cell = 20L
    val c = t(s, dir, "customer").select(col("c_custkey").as("k"),
      pmod(graft.functions.TextFns.seededHash(1,
        col("c_custkey").cast(StringType)), lit(1000L)).as("x"),
      pmod(graft.functions.TextFns.seededHash(2,
        col("c_custkey").cast(StringType)), lit(1000L)).as("y"),
      col("c_mktsegment").as("seg"))
    val cells = c
      .withColumn("cx", call_function("div", col("x"), lit(cell)))
      .withColumn("cy", call_function("div", col("y"), lit(cell)))
    val offs = for (dx <- Seq(-1L, 0L, 1L); dy <- Seq(-1L, 0L, 1L))
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val left = cells.withColumn("off", explode(array(offs: _*)))
      .select(col("k").as("ka"), col("x").as("xa"), col("y").as("ya"),
        col("seg").as("sega"),
        (col("cx") + col("off.dx")).as("jx"), (col("cy") + col("off.dy")).as("jy"))
    val right = cells.select(col("k").as("kb"), col("x").as("xb"),
      col("y").as("yb"), col("seg").as("segb"),
      col("cx").as("jx"), col("cy").as("jy"))
    left.join(right, Seq("jx", "jy"))
      .filter(col("ka") < col("kb"))
      .withColumn("d2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("d2") <= cell * cell)
      .select(least(col("sega"), col("segb")).as("seg_lo"),
        greatest(col("sega"), col("segb")).as("seg_hi"), col("d2"))
  }

  def geoGridJoin(s: SparkSession, dir: String): DataFrame = {
    geoGridPairs(s, dir)
      .groupBy(col("seg_lo"), col("seg_hi"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("d2")).as("sum_d2"))
      .orderBy(col("seg_lo"), col("seg_hi"))
  }

  private val q255Sql: String =
    s"""WITH c AS (
      |  SELECT c_custkey AS k,
      |    ${graft.functions.TextFns.seededHashSql(1, "CAST(c_custkey AS VARCHAR)")} % 1000 AS x,
      |    ${graft.functions.TextFns.seededHashSql(2, "CAST(c_custkey AS VARCHAR)")} % 1000 AS y,
      |    c_mktsegment AS seg
      |  FROM customer),
      |p AS (
      |  SELECT LEAST(a.seg, b.seg) AS seg_lo, GREATEST(a.seg, b.seg) AS seg_hi,
      |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      |  FROM c a JOIN c b ON a.k < b.k
      |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 400)
      |SELECT seg_lo, seg_hi, COUNT(*) AS n_pairs,
      |  CAST(SUM(d2) AS BIGINT) AS sum_d2
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Math scalar functions, per-row (IEEE-deterministic: sqrt is correctly
    * rounded in both engines; no transcendental fns in the oracle path).
    */
  def mathFns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      abs(col("p_size") - lit(25)).as("abs_off"),
      (col("p_size") % 7).as("size_mod"),
      floor(col("p_retailprice")).as("price_floor"),
      ceil(col("p_retailprice")).as("price_ceil"),
      sqrt(col("p_size").cast(DoubleType)).as("size_sqrt"),
      greatest(col("p_size"), lit(30)).as("size_hi"),
      least(col("p_size"), lit(30)).as("size_lo"))
      

  /** Array functions over tokenized text. */
  def arrayFns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("ntok"),
      array_join(slice(split(col("text"), " "), 1, 3), "_").as("first3"),
      array_join(array_sort(array_distinct(split(col("text"), " "))), ",").as("vocab"),
      element_at(split(col("text"), " "), -1).as("last_tok"))
      

  /** Streaming-batch meta (SURVEY.md O9/O10): min/max/count per type. */
  def eventsMeta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"),
        count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))

  /** Trailing-interval RANGE-frame window — the analytic complement to
    * q06's ROWS-frame ranking: per event, the count and exact sum of
    * the SAME user's activity in the preceding hour (inclusive). The
    * frame is anchored on epoch MICROSECONDS as the ordering key so the
    * [-1h, 0] bounds are integer-exact on both engines, peers at equal
    * timestamps all enter the frame (RANGE semantics — order among
    * ties cannot matter), and the sum uses the decimal-exact idiom so
    * the result is identical under any partitioning. At scale: one
    * shuffle on user_id, per-partition sort, incremental frame
    * evaluation — no self-join, no per-row rescan.
    */
  def trailingHourStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    t(s, dir, "events")
      .withColumn("us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("sum_1h"))
      .orderBy(col("event_id"))
  }

  /** Ordered funnel over the event stream: view → click → purchase in
    * strict sequence per user (see [[graft.operators.Funnel]]). */
  def eventFunnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.conversion(
        t(s, dir, "events"), col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))

  /** Batch gaps-and-islands sessionization over events (the batch twin
    * of the q31/q82 streaming session windows; same ≥30-min boundary
    * rule). */
  def batchSessions(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize.stats(
        t(s, dir, "events"), col("user_id"), col("ts"), col("event_id"),
        gapSeconds = 1800)
      .select(col("key").as("user_id"), col("session_seq"),
        col("start_ts"), col("end_ts"), col("n_events"))
      .orderBy(col("user_id"), col("session_seq"))

  /** Deterministic numeric profiling — the dataset-card moments: per
    * event type, exact-decimal mean and population variance/stddev.
    * Both sums are decimal-exact (associative → partitioning-proof);
    * the variance arithmetic `(n·Σx² − (Σx)²)/n²` runs in IEEE double
    * OVER those exact sums with the operand order mirrored in the
    * oracle, so every low bit matches.
    */
  def valueMoments(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(38, 2))).cast("double").as("s1"),
        sum((col("value") * col("value")).cast(DecimalType(38, 6)))
          .cast("double").as("s2"))
      .select(col("event_type"), col("n"),
        (col("s1") / col("n")).as("mean_v"),
        ((col("n") * col("s2") - col("s1") * col("s1")) / (col("n") * col("n")))
          .as("var_v"),
        sqrt(greatest(
          (col("n") * col("s2") - col("s1") * col("s1")) / (col("n") * col("n")),
          lit(0d))).as("std_v"))
      .orderBy(col("event_type"))

  /** q141: interval OVERLAP join — q134's user sessions against daily
    * promo windows (two per day), via the canonical-bin binned join
    * (no distinct, no cartesian): how many sessions/users were active
    * during each promo slot.
    */
  def promoSessionOverlap(s: SparkSession, dir: String): DataFrame = {
    val sess = graft.operators.Sessionize.stats(
        t(s, dir, "events"), col("user_id"), col("ts"), col("event_id"),
        gapSeconds = 1800)
      .select(col("key").as("user_id"),
        unix_micros(col("start_ts")).as("s_lo"),
        unix_micros(col("end_ts")).as("s_hi"))
    val promos = t(s, dir, "events")
      .select(date_trunc("day", col("ts")).as("day")).distinct()
      .select(col("day"), explode(array(
        struct(lit(10L).as("h0"), lit(14L).as("h1"), lit("morning").as("slot")),
        struct(lit(18L).as("h0"), lit(21L).as("h1"), lit("evening").as("slot")))).as("p"))
      .select(col("day"), col("p.slot").as("slot"),
        (unix_micros(col("day")) + col("p.h0") * 3600000000L).as("p_lo"),
        (unix_micros(col("day")) + col("p.h1") * 3600000000L).as("p_hi"))
    graft.operators.Joins.intervalJoin(
        sess, col("s_lo"), col("s_hi"), promos, col("p_lo"), col("p_hi"),
        binSize = 3600e6)
      .groupBy(col("day"), col("slot"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("day"), col("slot"))
  }

  /** q142: ANALYZE-style equi-depth column histogram over
    * l_extendedprice (see [[graft.operators.Analyze]]) — the stats a
    * cost-based layer feeds on, built on the two-phase prefix sum. */
  def columnStats(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analyze.equiDepthHistogram(
        t(s, dir, "lineitem"), col("l_extendedprice"),
        struct(col("l_orderkey"), col("l_linenumber")), k = 32)
      .orderBy(col("bucket"))

  /** q144: recursive CTE (Spark 4's WITH RECURSIVE) — iterative
    * hierarchy traversal declared in SQL: each user's ancestor chain in
    * the synthetic binary tree parent(u) = u div 2, to the ≤1 roots.
    * Pins the recursive-execution surface itself (fixpoint iteration
    * inside the engine, no driver loop); DuckDB replays the identical
    * recursion. */
  def recursiveChains(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("events_rc")
    s.sql(
      """WITH RECURSIVE anc(u, a, depth) AS (
        |  SELECT user_id, user_id, 0 FROM (SELECT DISTINCT user_id FROM events_rc)
        |  UNION ALL
        |  SELECT u, a DIV 2, depth + 1 FROM anc WHERE a > 1)
        |SELECT u AS user_id, CAST(MAX(depth) AS BIGINT) AS depth,
        |  COUNT(*) AS chain_len
        |FROM anc GROUP BY u ORDER BY u""".stripMargin)
  }

  /** q147: Hive-style directory partition pruning — events written
    * `partitionBy(day)` once (ensure-once), then a day-range read:
    * the filter binds to PARTITION DIRECTORIES so non-matching days
    * are never opened (the scan's `PartitionFilters` — asserted in
    * the spec via the same plan surface; this query pins the VALUES
    * through the partitioned layout, including the partition-column
    * round-trip through directory names).
    */
  def partitionPruning(s: SparkSession, dir: String): DataFrame = {
    partitionedEventsFact(s, dir)
      .filter(col("day_n").between(19732, 19738)) // 2024-01-10 .. 2024-01-16
      .groupBy(col("day_n").cast("long").as("day_n"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("day_n"), col("event_type"))
  }

  /** q208: DYNAMIC partition pruning — q147 prunes on a literal
    * predicate at plan time; DPP prunes at RUN time from the other side
    * of a join: the weekend-day dimension's filter becomes a pruning
    * subquery evaluated into the fact scan's partition filters (reusing
    * the broadcast), so only weekend partitions of the day-partitioned
    * fact are read. At 100 TB "join fact to a filtered dim" is THE
    * dominant query shape and DPP is the difference between scanning 2
    * partitions and 30. Values pinned here; the `dynamicpruning`
    * expression in the scan's partition filters is pinned by
    * DppPlanSpec (pruning must be correctness-neutral, like q197).
    */
  def dynamicPartitionPruning(s: SparkSession, dir: String): DataFrame = {
    val fact = partitionedEventsFact(s, dir)
    // day dimension: day number + day-of-week (1970-01-01 = Thursday →
    // (d+4) mod 7 maps 0=Sun..6=Sat), filtered to weekends
    val dim = s.range(19723L, 19753L).toDF("day_n")
      .withColumn("dow", pmod(col("day_n") + 4, lit(7)))
      .filter(col("dow") === 0 || col("dow") === 6)
    fact.join(broadcast(dim), "day_n")
      .groupBy(col("day_n").cast(LongType).as("day_n"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("day_n"))
  }

  /** The day-partitioned events staging q147/q208 share. */
  private[queries] def partitionedEventsFact(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val outP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"evpart_$tag")
    graft.Staging.ensureFresh(java.nio.file.Paths.get(dir, "events.parquet"), outP) {
      t(s, dir, "events")
        .withColumn("day_n", unix_date(col("ts").cast("date")))
        .write.mode("overwrite").partitionBy("day_n").parquet(outP.toString)
    }
    s.read.parquet(outP.toString)
  }

  private val q208Sql: String =
    """WITH e AS (
      |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_n,
      |    value
      |  FROM events)
      |SELECT CAST(day_n AS BIGINT) AS day_n, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM e
      |WHERE day_n BETWEEN 19723 AND 19752 AND (day_n + 4) % 7 IN (0, 6)
      |GROUP BY day_n ORDER BY day_n""".stripMargin

  /** q148: NULL-semantics parity battery — the corner cases engines
    * must agree on, pinned in one aggregation: NULL group keys form
    * their own group; aggregates SKIP nulls while count(*) doesn't;
    * `=` on a NULL key yields NULL (eq_self = 0 for the null group)
    * where null-safe `<=>` yields true (nullsafe_self = 1 everywhere);
    * and the sort order states NULLS FIRST explicitly — Spark's
    * default ascending puts nulls first while DuckDB's puts them last,
    * so an implicit order is a silent cross-engine fork.
    */
  def nullSemantics(s: SparkSession, dir: String): DataFrame = {
    val x = t(s, dir, "events").select(
      when(col("user_id") % 7 === 0, lit(null)).otherwise(col("user_id") % 5).as("u"),
      when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value")).as("v"))
    x.groupBy(col("u"))
      .agg(count(lit(1)).as("n_all"), count(col("v")).as("n_v"),
        sum(col("v").cast(DecimalType(38, 2))).cast("double").as("sum_v"),
        max(when(col("u") === col("u"), 1L).otherwise(0L)).as("eq_self"),
        max(when(col("u") <=> col("u"), 1L).otherwise(0L)).as("nullsafe_self"))
      .orderBy(col("u").asc_nulls_first)
  }

  /** q149: LATERAL correlated subquery join — "top order per customer"
    * declared as a per-row dependent subquery instead of a window; the
    * optimizer decorrelates it into a join+aggregate, which is the pin:
    * the declarative surface must not force a nested loop. */
  def lateralTopOrder(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer_lat")
    t(s, dir, "orders").createOrReplaceTempView("orders_lat")
    s.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer_lat c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders_lat o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |ORDER BY c.c_custkey""".stripMargin)
  }

  /** q150: UNPIVOT (melt) — wide per-type aggregates back to long form;
    * the inverse of q35's pivot, pinned through Spark's native unpivot
    * (`ids`/`values`/variable/value naming included). */
  def unpivotTypeSums(s: SparkSession, dir: String): DataFrame = {
    val wide = t(s, dir, "events")
      .groupBy((col("user_id") % 10).as("ub"))
      .pivot("event_type", Seq("click", "purchase", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
    wide.unpivot(Array(col("ub")), Array(col("click"), col("purchase"), col("view")),
        "event_type", "n")
      .orderBy(col("ub"), col("event_type"))
  }

  /** q151: explicit GROUPING SETS with `grouping_id` — the grouping-set
    * selector beyond q08's ROLLUP / q34's CUBE: exactly the requested
    * set list, with the grouping-id bitmask pinned. */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("events_gs")
    s.sql(
      """SELECT COALESCE(event_type, 'ALL') AS etype,
        |  CAST(user_id % 5 AS BIGINT) AS ub,
        |  CAST(grouping_id(event_type, user_id % 5) AS BIGINT) AS gid,
        |  COUNT(*) AS n
        |FROM events_gs
        |GROUP BY GROUPING SETS ((event_type), (user_id % 5), (event_type, user_id % 5))
        |ORDER BY gid, etype, ub NULLS FIRST""".stripMargin)
  }

  /** q152: map-typed column battery — the one builtin family no other
    * query touched: construct, probe (`element_at`), filter
    * (`map_filter`), merge (`map_concat`), and serialize
    * (`map_entries`) a map column. Spark map entries carry INSERTION
    * order, so every serialized view sorts explicitly — without that,
    * output would be engine- (and version-) dependent.
    */
  def mapFns(s: SparkSession, dir: String): DataFrame = {
    def entriesSorted(m: Column): Column =
      array_join(array_sort(transform(map_entries(m),
        e => concat(e.getField("key"), lit("="), e.getField("value")))), ",")
    t(s, dir, "events").filter(col("event_id") % 100 === 0)
      .select(col("event_id"),
        map(lit("type"), col("event_type"),
          lit("ub"), (col("user_id") % 5).cast("string"),
          lit("k"), get_json_object(col("props"), "$.k")).as("m"))
      .select(col("event_id"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys_sorted"),
        entriesSorted(map_filter(col("m"), (k, _) => k =!= "ub")).as("no_ub"),
        element_at(col("m"), "type").as("type_v"),
        entriesSorted(map_concat(col("m"), map(lit("extra"), lit("1")))).as("with_extra"),
        size(col("m")).cast("long").as("m_size"))
      .orderBy(col("event_id"))
  }

  /** q154: ranking-function battery beyond q06's row_number — rank /
    * dense_rank / percent_rank / cume_dist over a DELIBERATELY tied
    * key (their outputs are tie-invariant, so ordering by the coarse
    * key alone is still deterministic), and ntile over a totally
    * ordered spec (ntile splits ties by row order, so it NEEDS the
    * tiebreak — mixing the two specs in one query pins exactly that
    * distinction).
    */
  def rankBattery(s: SparkSession, dir: String): DataFrame = {
    val wTies = Window.partitionBy(col("event_type")).orderBy(col("coarse"))
    val wTotal = Window.partitionBy(col("event_type"))
      .orderBy(col("coarse"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        floor(col("value") / 100).cast("long").as("coarse"))
      .withColumn("rnk", rank().over(wTies))
      .withColumn("drnk", dense_rank().over(wTies))
      .withColumn("prnk", percent_rank().over(wTies))
      .withColumn("cdist", cume_dist().over(wTies))
      .withColumn("tile", ntile(4).over(wTotal))
      .filter(col("event_id") % 20 === 0)
      .orderBy(col("event_type"), col("coarse"), col("event_id"))
  }

  /** q155: ROWS-frame sliding window — the row-count twin of q131's
    * RANGE frame: per event, stats over the user's LAST 5 events
    * (4 preceding + current) in (ts, event_id) total order. ROWS
    * frames need the unique tiebreak for determinism (peers do NOT all
    * enter the frame, unlike RANGE), which is exactly the distinction
    * this pins against q131.
    */
  def slidingRowStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, 0)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_5"),
        sum(col("value").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("sum_5"))
      .filter(col("event_id") % 10 === 0)
      .orderBy(col("event_id"))
  }

  /** q156: calendar gap filling — densify the per-(type, day) series so
    * every day in the corpus span appears, zeros where nothing
    * happened: `sequence()` generates the calendar in-plan (no driver
    * loop, no external table) and the left join tags the holes. The
    * everyday reporting shape that window functions can't express.
    */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val span = ev.agg(
      min(col("ts").cast("date")).as("d0"), max(col("ts").cast("date")).as("d1"))
    val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val types = ev.select(col("event_type")).distinct()
    val actual = ev.groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    days.crossJoin(types)
      .join(actual, Seq("day", "event_type"), "left")
      // timestamps at midnight on the wire: DuckDB DATEs surface as
      // timestamps in the driver's pandas compare, so a date column
      // here would dtype-mismatch even with equal values
      .select(col("day").cast("timestamp").as("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("day"), col("event_type"))
  }

  /** CUBE over supplier ⋈ nation (the one driver table no other query
    * reads): all grouping-set combinations, null slots coalesced.
    */
  def supplierCube(s: SparkSession, dir: String): DataFrame = {
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    su.join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .cube(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_supp"), dsum(col("s_acctbal")).as("total_bal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_supp"), col("total_bal"))
      .orderBy(col("region_name"), col("nation_name"))
  }

  /** Pivot-style conditional aggregation: one column per region (same
    * CASE-sum formulation in both engines — engine-portable pivot).
    */
  def pivotRegions(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    val joined = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    val cols = regions.map(rn =>
      count(when(col("r_name") === rn, lit(1))).as("n_" + rn.toLowerCase.replace(" ", "_")))
    joined.groupBy(col("c_mktsegment"))
      .agg(cols.head, cols.tail: _*)
      .orderBy(col("c_mktsegment"))
  }

  /** Date arithmetic: datediff / date_add / last_day / day-of-week. */
  def dateArith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      datediff(lit("1998-12-31").cast(DateType), col("o_orderdate").cast(DateType))
        .cast(LongType).as("days_to_eoy"),
      // DATE surfaces as python date vs pandas Timestamp across the two
      // engines' parquet paths — emit timestamps for the hash compare
      date_add(col("o_orderdate").cast(DateType), 90).cast(TimestampType).as("due_date"),
      last_day(col("o_orderdate")).cast(TimestampType).as("month_end"),
      (dayofweek(col("o_orderdate")) - 1).cast(LongType).as("dow_sun0"))

  /** Ordered-set aggregates: exact interpolated percentiles (Spark
    * `percentile` ≡ DuckDB `quantile_cont`).
    */
  def pricePercentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        expr("percentile(o_totalprice, 0.99)").as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_top_orders" -> (topOrders _),
    "q03_revenue_by_nation" -> (revenueByNation _),
    "q04_semi_join" -> (customersWithBigOrders _),
    "q05_anti_join" -> (customersWithoutUrgent _),
    "q06_window_rank" -> (topOrdersPerCustomer _),
    "q07_set_ops" -> (setOpsUsers _),
    "q08_rollup" -> (acctbalRollup _),
    "q09_string_fns" -> (stringFns _),
    "q10_date_fns" -> (dateFns _),
    "q11_json_fns" -> (jsonFns _),
    "q12_distinct_agg" -> (distinctUsers _),
    "q13_big_join" -> (revenueByPriority _),
    "q14_math_fns" -> (mathFns _),
    "q15_array_fns" -> (arrayFns _),
    "q16_events_meta" -> (eventsMeta _),
    "q34_supplier_cube" -> (supplierCube _),
    "q35_pivot_regions" -> (pivotRegions _),
    "q36_date_arith" -> (dateArith _),
    "q41_percentiles" -> (pricePercentiles _),
    "q47_bucketed_join" -> (bucketedRevenue _),
    "q62_clustered_layout" -> (clusteredLayout _),
    "q88_orc_layout" -> (orcLayout _),
    "q116_zorder_layout" -> (zorderLayout _),
    "q131_range_frame" -> (trailingHourStats _),
    "q133_funnel" -> (eventFunnel _),
    "q134_batch_sessions" -> (batchSessions _),
    "q135_value_moments" -> (valueMoments _),
    "q140_hilbert_layout" -> (hilbertLayout _),
    "q141_interval_join" -> (promoSessionOverlap _),
    "q142_column_stats" -> (columnStats _),
    "q144_recursive_cte" -> (recursiveChains _),
    "q147_partition_pruning" -> (partitionPruning _),
    "q148_null_semantics" -> (nullSemantics _),
    "q149_lateral_join" -> (lateralTopOrder _),
    "q150_unpivot" -> (unpivotTypeSums _),
    "q151_grouping_sets" -> (groupingSets _),
    "q152_map_fns" -> (mapFns _),
    "q154_rank_battery" -> (rankBattery _),
    "q155_rows_frame" -> (slidingRowStats _),
    "q156_gap_fill" -> (gapFill _),
    "q158_zorder3_layout" -> (zorder3Layout _),
    "q161_variant_json" -> (variantJson _),
    "q162_pipe_sql" -> (pipeSql _),
    "q163_collation" -> (collationFns _),
    "q166_retention" -> (retentionCohorts _),
    "q167_scd2" -> (scd2Build _),
    "q168_regression_stats" -> (regressionStats _),
    "q169_hof_battery" -> (hofBattery _),
    "q172_table_stats" -> (tableStats _),
    "q173_robust_stats" -> (robustStats _),
    "q175_cdc_delete" -> (cdcDelete _),
    "q176_explode_battery" -> (explodeBattery _),
    "q177_try_fns" -> (tryFns _),
    "q178_anomaly_flags" -> (anomalyFlags _),
    "q181_datetime_battery" -> (datetimeBattery _),
    "q182_decimal_battery" -> (decimalBattery _),
    "q183_regexp_battery" -> (regexpBattery _),
    "q184_argmax_battery" -> (argmaxBattery _),
    "q189_gap_interpolate" -> (gapFillInterpolate _),
    "q190_subquery_battery" -> (subqueryBattery _),
    "q193_skyline" -> (skylineOrders _),
    "q194_transitions" -> (eventTransitions _),
    "q195_twap" -> (timeWeightedAvg _),
    "q196_bool_bitwise" -> (boolBitwiseBattery _),
    "q197_runtime_bloom" -> (runtimeBloomJoin _),
    "q198_quantile_norm" -> (quantileNormalize _),
    "q199_attribution" -> (lastTouchAttribution _),
    "q200_quantile_filter" -> (globalQuantileFilter _),
    "q201_sliding_distinct" -> (slidingDistinctUsers _),
    "q203_scd2_apply" -> (scd2Apply _),
    "q206_table_checksum" -> (tableChecksum _),
    "q208_dynamic_pruning" -> (dynamicPartitionPruning _),
    "q207_deterministic_mode" -> (deterministicMode _),
    "q211_peak_concurrency" -> (peakConcurrency _),
    "q217_join_matrix" -> (joinMatrix _),
    "q220_constraint_audit" -> (constraintAudit _),
    "q221_assoc_rules" -> (assocRules _),
    "q224_view_maintenance" -> (viewMaintenance _),
    "q225_path_trigrams" -> (pathTrigrams _),
    "q226_ewma" -> (ewmaSmoothing _),
    "q227_k_anonymity" -> (kAnonymityAudit _),
    "q286_l_diversity" -> (lDiversityAudit _),
    "q294_t_closeness" -> (tClosenessAudit _),
    "q298_rr_dp_release" -> (rrDpRelease _),
    "q304_dgeo_dp_sum" -> (dgeoDpSumRelease _),
    "q228_interarrival" -> (interarrivalSpectrum _),
    "q229_codec_battery" -> (codecBattery _),
    "q231_position_attribution" -> (positionAttribution _),
    "q232_chi_square" -> (chiSquareCells _),
    "q233_benford" -> (benfordAudit _),
    "q234_apportionment" -> (apportionment _),
    "q235_timezone_battery" -> (timezoneBattery _),
    "q236_minmax_maintenance" -> (minmaxMaintenance _),
    "q237_target_encoding" -> (targetEncoding _),
    "q238_dwell_times" -> (dwellTimes _),
    "q239_ab_exposure" -> (abExposure _),
    "q240_clamped_balance" -> (clampedBalance _),
    "q242_hierarchy_shares" -> (hierarchyShares _),
    "q243_weighted_quantiles" -> (weightedQuantiles _),
    "q244_penny_allocation" -> (pennyAllocation _),
    "q245_protocol_audit" -> (protocolAudit _),
    "q246_utf8_battery" -> (utf8Battery _),
    "q247_double_charges" -> (doubleCharges _),
    "q248_activity_streaks" -> (activityStreaks _),
    "q249_fifo_matching" -> (fifoMatching _),
    "q250_tiered_commission" -> (tieredCommission _),
    "q251_auc_exact" -> (aucExact _),
    "q252_classifier_eval" -> (classifierEval _),
    "q254_fd_audit" -> (fdAudit _),
    "q255_geo_grid_join" -> (geoGridJoin _))

  val family: String = "relational"

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(l_quantity) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q03_revenue_by_nation" ->
      """SELECT n_name,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q04_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q06_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk, prev_price FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
        |   LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS prev_price
        |  FROM orders) WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q07_set_ops" ->
      """SELECT user_id FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |ORDER BY user_id""".stripMargin,
    "q08_rollup" ->
      """SELECT COALESCE(r_name, 'ALL') AS region_name,
        | COALESCE(n_name, 'ALL') AS nation_name,
        | COUNT(*) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,
    "q09_string_fns" ->
      """SELECT p_partkey,
        | UPPER(p_name) AS uname,
        | SUBSTRING(p_name, 1, 5) AS pfx,
        | LENGTH(p_name) AS len,
        | REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS novowels,
        | CONCAT_WS('|', p_brand, p_type) AS brand_type,
        | STRING_SPLIT(p_name, ' ')[1] AS first_tok,
        | LEN(STRING_SPLIT(p_name, ' ')) AS ntok,
        | LPAD(p_brand, 12, '#') AS padded,
        | REVERSE(p_name) AS rev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q10_date_fns" ->
      """SELECT DATE_TRUNC('month', o_orderdate) AS order_month,
        | CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_revenue
        |FROM orders GROUP BY 1, 2 ORDER BY order_month""".stripMargin,
    "q11_json_fns" ->
      """SELECT event_type,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        | COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q12_distinct_agg" ->
      """SELECT event_type,
        | COUNT(DISTINCT user_id) AS users,
        | COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q13_big_join" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q14_math_fns" ->
      """SELECT p_partkey,
        | ABS(p_size - 25) AS abs_off,
        | p_size % 7 AS size_mod,
        | CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
        | CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
        | SQRT(CAST(p_size AS DOUBLE)) AS size_sqrt,
        | GREATEST(p_size, 30) AS size_hi,
        | LEAST(p_size, 30) AS size_lo
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q15_array_fns" ->
      """SELECT doc_id,
        | LEN(STRING_SPLIT(text, ' ')) AS ntok,
        | ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '), 1, 3), '_') AS first3,
        | ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' '))), ',') AS vocab,
        | STRING_SPLIT(text, ' ')[-1] AS last_tok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q155_rows_frame" ->
      """SELECT event_id, user_id, ts,
        |  COUNT(*) OVER w AS n_5,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_5
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |QUALIFY event_id % 10 = 0
        |ORDER BY event_id""".stripMargin,
    "q156_gap_fill" ->
      """WITH span AS (
        |  SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events),
        |days AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |  FROM span),
        |types AS (SELECT DISTINCT event_type FROM events),
        |actual AS (
        |  SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT d.day, t.event_type, CAST(COALESCE(a.n, 0) AS BIGINT) AS n
        |FROM days d CROSS JOIN types t
        |LEFT JOIN actual a ON a.day = d.day AND a.event_type = t.event_type
        |ORDER BY d.day, t.event_type""".stripMargin,
    "q154_rank_battery" ->
      """SELECT event_id, event_type, CAST(floor(value / 100) AS BIGINT) AS coarse,
        |  CAST(rank() OVER wt AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER wt AS INTEGER) AS drnk,
        |  percent_rank() OVER wt AS prnk,
        |  cume_dist() OVER wt AS cdist,
        |  CAST(ntile(4) OVER wo AS INTEGER) AS tile
        |FROM events
        |WINDOW wt AS (PARTITION BY event_type ORDER BY CAST(floor(value / 100) AS BIGINT)),
        |  wo AS (PARTITION BY event_type
        |         ORDER BY CAST(floor(value / 100) AS BIGINT), event_id)
        |QUALIFY event_id % 20 = 0
        |ORDER BY event_type, coarse, event_id""".stripMargin,
    "q152_map_fns" ->
      """SELECT event_id,
        |  'k,type,ub' AS keys_sorted,
        |  'k=' || json_extract_string(props, '$.k') || ',type=' || event_type AS no_ub,
        |  event_type AS type_v,
        |  'extra=1,k=' || json_extract_string(props, '$.k') || ',type=' || event_type
        |    || ',ub=' || CAST(user_id % 5 AS VARCHAR) AS with_extra,
        |  CAST(3 AS BIGINT) AS m_size
        |FROM events WHERE event_id % 100 = 0 ORDER BY event_id""".stripMargin,
    "q149_lateral_join" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |ORDER BY c.c_custkey""".stripMargin,
    "q150_unpivot" ->
      """WITH ubs AS (SELECT DISTINCT user_id % 10 AS ub FROM events),
        |t(et) AS (VALUES ('click'), ('purchase'), ('view')),
        |c AS (
        |  SELECT user_id % 10 AS ub, event_type, COUNT(*) AS n FROM events
        |  WHERE event_type IN ('click', 'purchase', 'view') GROUP BY 1, 2)
        |SELECT ubs.ub, t.et AS event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        |FROM ubs CROSS JOIN t
        |LEFT JOIN c ON c.ub = ubs.ub AND c.event_type = t.et
        |ORDER BY ubs.ub, event_type""".stripMargin,
    "q151_grouping_sets" ->
      """SELECT COALESCE(event_type, 'ALL') AS etype,
        |  CAST(user_id % 5 AS BIGINT) AS ub,
        |  CAST(GROUPING(event_type, user_id % 5) AS BIGINT) AS gid,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id % 5), (event_type, user_id % 5))
        |ORDER BY gid, etype, ub NULLS FIRST""".stripMargin,
    "q148_null_semantics" ->
      """WITH x AS (
        |  SELECT CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % 5 END AS u,
        |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT u, COUNT(*) AS n_all, COUNT(v) AS n_v,
        |  CAST(SUM(CAST(v AS DECIMAL(38,2))) AS DOUBLE) AS sum_v,
        |  CAST(MAX(CASE WHEN u = u THEN 1 ELSE 0 END) AS BIGINT) AS eq_self,
        |  CAST(MAX(CASE WHEN u IS NOT DISTINCT FROM u THEN 1 ELSE 0 END) AS BIGINT)
        |    AS nullsafe_self
        |FROM x GROUP BY u ORDER BY u NULLS FIRST""".stripMargin,
    "q147_partition_pruning" ->
      """SELECT CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_n,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' BETWEEN 19732 AND 19738
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q144_recursive_cte" ->
      """WITH RECURSIVE anc(u, a, depth) AS (
        |  SELECT user_id, user_id, 0 FROM (SELECT DISTINCT user_id FROM events)
        |  UNION ALL
        |  SELECT u, a // 2, depth + 1 FROM anc WHERE a > 1)
        |SELECT u AS user_id, CAST(MAX(depth) AS BIGINT) AS depth,
        |  COUNT(*) AS chain_len
        |FROM anc GROUP BY u ORDER BY u""".stripMargin,
    "q142_column_stats" ->
      """WITH r AS (
        |  SELECT l_extendedprice AS v,
        |    ROW_NUMBER() OVER (
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) - 1 AS p
        |  FROM lineitem),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem)
        |SELECT (p * 32) // n AS bucket, MIN(v) AS lo, MAX(v) AS hi,
        |  COUNT(*) AS n_rows, CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv
        |FROM r, n GROUP BY 1 ORDER BY 1""".stripMargin,
    "q141_interval_join" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM x),
        |sess AS (
        |  SELECT user_id, session_seq, MIN(ts) AS st, MAX(ts) AS en
        |  FROM y GROUP BY 1, 2),
        |days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
        |promos AS (
        |  SELECT day, 'morning' AS slot,
        |    day + INTERVAL 10 HOUR AS p_lo, day + INTERVAL 14 HOUR AS p_hi FROM days
        |  UNION ALL
        |  SELECT day, 'evening',
        |    day + INTERVAL 18 HOUR, day + INTERVAL 21 HOUR FROM days)
        |SELECT day, slot, COUNT(*) AS n_sessions,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM sess JOIN promos ON st <= p_hi AND p_lo <= en
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q134_batch_sessions" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM x)
        |SELECT user_id, session_seq, MIN(ts) AS start_ts, MAX(ts) AS end_ts,
        |  COUNT(*) AS n_events
        |FROM y GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q135_value_moments" ->
      """WITH a AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1)
        |SELECT event_type, n, s1 / n AS mean_v,
        |  (n * s2 - s1 * s1) / (n * n) AS var_v,
        |  sqrt(greatest((n * s2 - s1 * s1) / (n * n), 0)) AS std_v
        |FROM a ORDER BY event_type""".stripMargin,
    "q133_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id, MIN(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t_click
        |  FROM events e JOIN t1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > t1.t_view GROUP BY 1),
        |t3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t_purchase
        |  FROM events e JOIN t2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.t_click GROUP BY 1)
        |SELECT u.user_id, t_view, t_click, t_purchase,
        |  CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
        |            WHEN t_click IS NOT NULL THEN 2
        |            WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN t1 USING (user_id)
        |LEFT JOIN t2 USING (user_id)
        |LEFT JOIN t3 USING (user_id)
        |ORDER BY u.user_id""".stripMargin,
    "q131_range_frame" ->
      """SELECT event_id, user_id, ts,
        | COUNT(*) OVER w AS n_1h,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q16_events_meta" ->
      """SELECT event_type,
        | MIN(ts) AS min_ts,
        | MAX(ts) AS max_ts,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q34_supplier_cube" ->
      """SELECT COALESCE(r_name, 'ALL') AS region_name,
        | COALESCE(n_name, 'ALL') AS nation_name,
        | COUNT(*) AS n_supp,
        | CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,
    "q35_pivot_regions" ->
      """SELECT c_mktsegment,
        | COUNT(CASE WHEN r_name = 'AFRICA' THEN 1 END) AS n_africa,
        | COUNT(CASE WHEN r_name = 'AMERICA' THEN 1 END) AS n_america,
        | COUNT(CASE WHEN r_name = 'ASIA' THEN 1 END) AS n_asia,
        | COUNT(CASE WHEN r_name = 'EUROPE' THEN 1 END) AS n_europe,
        | COUNT(CASE WHEN r_name = 'MIDDLE EAST' THEN 1 END) AS n_middle_east
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q36_date_arith" ->
      """SELECT o_orderkey,
        | date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS TIMESTAMP) AS due_date,
        | CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
        | CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sun0
        |FROM orders""".stripMargin,
    "q41_percentiles" ->
      """SELECT o_orderpriority,
        | quantile_cont(o_totalprice, 0.5) AS p50,
        | quantile_cont(o_totalprice, 0.9) AS p90,
        | quantile_cont(o_totalprice, 0.99) AS p99,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q47_bucketed_join" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q62_clustered_layout" -> q62Sql,
    "q88_orc_layout" -> q62Sql,
    "q116_zorder_layout" -> q116Sql,
    "q140_hilbert_layout" -> q140Sql,
    "q158_zorder3_layout" -> q158Sql,
    "q161_variant_json" -> q161Sql,
    "q162_pipe_sql" -> q162Sql,
    "q163_collation" -> q163Sql,
    "q166_retention" -> q166Sql,
    "q167_scd2" -> q167Sql,
    "q168_regression_stats" -> q168Sql,
    "q169_hof_battery" -> q169Sql,
    "q172_table_stats" -> q172Sql,
    "q173_robust_stats" -> q173Sql,
    "q175_cdc_delete" -> q175Sql,
    "q176_explode_battery" -> q176Sql,
    "q177_try_fns" -> q177Sql,
    "q178_anomaly_flags" -> q178Sql,
    "q181_datetime_battery" -> q181Sql,
    "q182_decimal_battery" -> q182Sql,
    "q183_regexp_battery" -> q183Sql,
    "q184_argmax_battery" -> q184Sql,
    "q189_gap_interpolate" -> q189Sql,
    "q190_subquery_battery" -> q190Sql,
    "q193_skyline" -> q193Sql,
    "q194_transitions" -> q194Sql,
    "q195_twap" -> q195Sql,
    "q196_bool_bitwise" -> q196Sql,
    "q197_runtime_bloom" -> q197Sql,
    "q198_quantile_norm" -> q198Sql,
    "q199_attribution" -> q199Sql,
    "q200_quantile_filter" -> q200Sql,
    "q201_sliding_distinct" -> q201Sql,
    "q203_scd2_apply" -> q203Sql,
    "q206_table_checksum" -> q206Sql,
    "q208_dynamic_pruning" -> q208Sql,
    "q207_deterministic_mode" -> q207Sql,
    "q211_peak_concurrency" -> q211Sql,
    "q217_join_matrix" -> q217Sql,
    "q220_constraint_audit" -> q220Sql,
    "q221_assoc_rules" -> q221Sql,
    "q224_view_maintenance" -> q224Sql,
    "q225_path_trigrams" -> q225Sql,
    "q226_ewma" -> q226Sql,
    "q227_k_anonymity" -> q227Sql,
    "q286_l_diversity" -> q286Sql,
    "q294_t_closeness" -> q294Sql,
    "q298_rr_dp_release" -> q298Sql,
    "q304_dgeo_dp_sum" -> q304Sql,
    "q228_interarrival" -> q228Sql,
    "q229_codec_battery" -> q229Sql,
    "q231_position_attribution" -> q231Sql,
    "q232_chi_square" -> q232Sql,
    "q233_benford" -> q233Sql,
    "q234_apportionment" -> q234Sql,
    "q235_timezone_battery" -> q235Sql,
    "q236_minmax_maintenance" -> q236Sql,
    "q237_target_encoding" -> q237Sql,
    "q238_dwell_times" -> q238Sql,
    "q239_ab_exposure" -> q239Sql,
    "q240_clamped_balance" -> q240Sql,
    "q242_hierarchy_shares" -> q242Sql,
    "q243_weighted_quantiles" -> q243Sql,
    "q244_penny_allocation" -> q244Sql,
    "q245_protocol_audit" -> q245Sql,
    "q246_utf8_battery" -> q246Sql,
    "q247_double_charges" -> q247Sql,
    "q248_activity_streaks" -> q248Sql,
    "q249_fifo_matching" -> q249Sql,
    "q250_tiered_commission" -> q250Sql,
    "q251_auc_exact" -> q251Sql,
    "q252_classifier_eval" -> q252Sql,
    "q254_fd_audit" -> q254Sql,
    "q255_geo_grid_join" -> q255Sql)

  /** DuckDB replay of the 6-bit 3-D Morton interleave
    * (Layout.zOrderValueN): bit b of dim j lands at position 3b+j. */
  private lazy val q158Sql: String = {
    val interleave = (0 until 6).flatMap(b => Seq(
      s"(((x >> $b) & 1) << ${3 * b})",
      s"(((y >> $b) & 1) << ${3 * b + 1})",
      s"(((w >> $b) & 1) << ${3 * b + 2})"))
      .mkString(" | ")
    s"""WITH base AS (
       |  SELECT l_partkey % 64 AS x, l_suppkey % 64 AS y,
       |    l_orderkey % 64 AS w, l_quantity
       |  FROM lineitem),
       |z AS (
       |  SELECT x, y, w, l_quantity, $interleave AS zval FROM base)
       |SELECT x // 16 AS tile_x, y // 16 AS tile_y, w // 16 AS tile_w,
       | COUNT(*) AS n,
       | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       | MIN(zval) AS min_z, MAX(zval) AS max_z
       |FROM z
       |WHERE x BETWEEN 16 AND 47 AND y BETWEEN 32 AND 63 AND w BETWEEN 8 AND 39
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  /** DuckDB replay of the 8-bit Morton interleave (Layout.zOrderValue):
    * bit b of x lands at position 2b, bit b of y at 2b+1. */
  private lazy val q140Sql: String = {
    val bits = 8
    val steps = (0 until bits).map(i => 1L << (bits - 1 - i))
    val ctes = steps.zipWithIndex.map { case (s, i) =>
      val j = i + 1
      s"""h$j AS (
         |  SELECT l_quantity, x0, y0,
         |    d$i + $s * $s * xor(3 * rx, ry) AS d$j,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - y$i ELSE y$i END ELSE x$i END AS x$j,
         |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - x$i ELSE x$i END ELSE y$i END AS y$j
         |  FROM (SELECT *,
         |          CASE WHEN (x$i & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |          CASE WHEN (y$i & $s) > 0 THEN 1 ELSE 0 END AS ry
         |        FROM h$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH h0 AS (
       |  SELECT l_partkey % 256 AS x0, l_suppkey % 256 AS y0,
       |    CAST(0 AS BIGINT) AS d0, l_quantity
       |  FROM lineitem),
       |$ctes
       |SELECT x0 // 32 AS tile_x, y0 // 32 AS tile_y, COUNT(*) AS n,
       | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       | MIN(d$bits) AS min_h, MAX(d$bits) AS max_h
       |FROM h$bits WHERE x0 BETWEEN 32 AND 95 AND y0 BETWEEN 64 AND 127
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  private lazy val q116Sql: String = {
    val interleave = (0 until 8).map(b =>
      s"(((x >> $b) & 1) << ${2 * b}) | (((y >> $b) & 1) << ${2 * b + 1})")
      .mkString(" | ")
    s"""WITH base AS (
       |  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y, l_quantity
       |  FROM lineitem),
       |z AS (
       |  SELECT x, y, l_quantity, $interleave AS zval FROM base)
       |SELECT x // 32 AS tile_x, y // 32 AS tile_y, COUNT(*) AS n,
       | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       | MIN(zval) AS min_z, MAX(zval) AS max_z
       |FROM z WHERE x BETWEEN 32 AND 95 AND y BETWEEN 64 AND 127
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  private lazy val q62Sql: String =
    """SELECT l_orderkey % 100 AS okey_bucket, COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem WHERE l_orderkey % 10 = 0
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
