package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Sketch-based corpus analytics — the approximate operators a 100 TB
  * corpus-stats pass actually runs when exact distinct / percentile /
  * top-k would be too expensive:
  *
  *  - approx-distinct: HyperLogLog++ (`approx_count_distinct`) — one
  *    pass, fixed ~KB state per group, map-side partial aggregation,
  *    versus an exact distinct's full shuffle of every key;
  *  - mergeable sketches: Apache DataSketches HLL (`hll_sketch_agg` /
  *    `hll_union_agg`) — THE warehouse pre-aggregation pattern: persist
  *    per-partition (per-day) sketch columns once, answer any later
  *    rollup by unioning kilobyte sketches instead of rescanning the
  *    corpus;
  *  - approx quantiles: `percentile_approx` — bounded-memory rank
  *    estimation versus an exact percentile's per-group sort;
  *  - heavy hitters: `approx_top_k` (frequent-items sketch) — fixed
  *    state versus a full groupBy count + global sort.
  *
  * Oracle strategy: sketch ESTIMATES are engine- and implementation-
  * specific, so a value-level DuckDB compare of the estimate itself
  * would be meaningless. Each query instead emits EXACT values plus
  * BOOLEAN within-tolerance flags comparing the in-plan sketch estimate
  * against the in-plan exact answer; DuckDB independently recomputes
  * the exact values and pins every flag TRUE. A green run proves the
  * estimate landed inside the documented error budget — deterministic
  * for fixed data. (The per-key counts in q59 ARE exactly comparable:
  * a frequent-items sketch is exact while the number of distinct items
  * fits its tracked-item bound, which the 31-token corpus does.)
  */
object SketchQueries extends QueryModule {

  // ---- q56: HLL++ approx-distinct quality ------------------------------

  /** Distinct users per event type, exact vs HyperLogLog++ at 2% target
    * rsd, pinned within a 5% budget (2.5σ). At warehouse scale the
    * exact branch is the one that disappears: HLL keeps ~KB of state
    * per group and combines map-side, while COUNT(DISTINCT) must
    * shuffle every (group, user) pair.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <= col("n_exact") * 0.05).as("hll_ok"))
      .orderBy(col("event_type"))

  private val q56Oracle: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact, TRUE AS hll_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- q57: approx quantiles quality -----------------------------------

  /** Median and p95 of extended price per return flag: exact
    * (interpolating `percentile`, a per-group sort) vs
    * `percentile_approx` at accuracy 10000 (bounded-memory, one pass),
    * pinned within 2% relative error. The exact values stay in-plan
    * only — interpolated floats differ across engines in the last ulp,
    * so the cross-engine contract is the count + the quality flags.
    */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        expr("percentile(l_extendedprice, array(0.5D, 0.95D))").as("ex"),
        expr("percentile_approx(l_extendedprice, array(0.5D, 0.95D), 10000)").as("ap"))
      .select(col("l_returnflag"), col("n_rows"),
        (abs(element_at(col("ap"), 1) - element_at(col("ex"), 1))
          <= element_at(col("ex"), 1) * 0.02).as("p50_ok"),
        (abs(element_at(col("ap"), 2) - element_at(col("ex"), 2))
          <= element_at(col("ex"), 2) * 0.02).as("p95_ok"))
      .orderBy(col("l_returnflag"))

  private val q57Oracle: String =
    """SELECT l_returnflag, COUNT(*) AS n_rows, TRUE AS p50_ok, TRUE AS p95_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q58: mergeable HLL sketches (DataSketches) ----------------------

  /** The sketch-column warehouse pattern end-to-end: per-(type, day)
    * DataSketches HLL partials — the table a 100 TB deployment would
    * PERSIST — then a rollup that unions kilobyte sketches per type,
    * next to a direct single-pass sketch and the exact count. Both the
    * merged and the direct estimate are pinned within 5% of exact
    * (sketch union is not bit-lossless — merged 1488 vs direct 1494 vs
    * exact 1500 at sf0.1 — which is why the flags, not the estimates,
    * are the cross-engine contract).
    */
  def sketchMerge(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"))
    val partials = e.groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = partials.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_merged"))
    val direct = e.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("n_direct"),
        countDistinct(col("user_id")).as("n_exact"))
    merged.join(direct, "event_type")
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_merged") - col("n_exact")) <= col("n_exact") * 0.05).as("merged_ok"),
        (abs(col("n_direct") - col("n_exact")) <= col("n_exact") * 0.05).as("direct_ok"))
      .orderBy(col("event_type"))
  }

  private val q58Oracle: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
      |  TRUE AS merged_ok, TRUE AS direct_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- q59: heavy hitters (frequent-items sketch) ----------------------

  /** Top-5 corpus tokens: `approx_top_k` proposes an 8-candidate set
    * from fixed sketch state (no full-vocabulary groupBy + global sort),
    * then exact counting RESTRICTED to the candidates picks the final 5
    * under a deterministic (count desc, token) order — the two-phase
    * heavy-hitter shape a warehouse runs. Tie-safety: the sketch may
    * break a count tie arbitrarily, but the exact re-rank resolves any
    * boundary tie exactly like the oracle's ORDER BY as long as fewer
    * than 4 tokens share the rank-5 boundary count (the 8−5+1 candidate
    * margin; the shipped corpora have distinct boundary counts at every
    * SF — widen k_sketch if a future corpus ties wider).
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val candidates = toks
      .agg(expr("approx_top_k(tok, 8)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("tok"))
    toks.join(broadcast(candidates), "tok")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("tok"))
      .limit(5)
      .select(col("tok").as("token"), col("n_occurrences"))
  }

  private val q59Oracle: String =
    """SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |WHERE tok <> '' GROUP BY tok
      |ORDER BY n_occurrences DESC, token LIMIT 5""".stripMargin

  // ---- q125: count-min frequency certificates --------------------------

  private val CmsEps = 0.0005
  private val CmsTopN = 10

  /** Count-min sketch point-query certificates over (event_type, user)
    * pair frequencies: build ONE kilobyte-scale CMS over the keyed
    * stream in a distributed pass (`stat.countMinSketch` — the
    * two-job pattern of `Dedup.bloomNewDocs`: the sketch is an action,
    * then ships to executors INSIDE the probe expression,
    * [[graft.catalyst.CmsEstimate]]), then certify the exact top-10
    * pairs: the estimate must never undercount (a CMS structural
    * guarantee) and overcount by at most ⌈ε·N⌉ (holds with
    * probability ≥ δ = 0.99; deterministic for fixed data + seed).
    * At 100 TB this is the frequency story without a counts table:
    * per-key "how often?" answers from KBs of mergeable state, while
    * the exact branch below exists only to pin the certificate at
    * gate scale.
    */
  def cmsFrequency(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables(s, dir, "events").select(
      col("event_type"), col("user_id"),
      xxhash64(concat_ws(":", col("event_type"), col("user_id"))).as("key"))
    val cms = keyed.stat.countMinSketch("key", CmsEps, 0.99, 42)
    val total = keyed.agg(count(lit(1)).as("n_total"))
    keyed.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("event_type"), col("user_id"))
      .limit(CmsTopN)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_exact").desc, col("event_type"), col("user_id"))))
      .crossJoin(broadcast(total))
      .withColumn("n_cms", graft.catalyst.CmsEstimate.estimate(
        xxhash64(concat_ws(":", col("event_type"), col("user_id"))), cms))
      .select(col("event_type"), col("user_id"), col("n_exact"), col("rnk"),
        (col("n_cms") >= col("n_exact") &&
          col("n_cms") <= col("n_exact") + ceil(lit(CmsEps) * col("n_total")).cast("long"))
          .as("cms_ok"))
      .orderBy(col("rnk"))
  }

  private val q125Oracle: String =
    s"""SELECT event_type, user_id, n_exact, CAST(rnk AS INTEGER) AS rnk, TRUE AS cms_ok
       |FROM (
       |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
       |    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type, user_id) AS rnk
       |  FROM events GROUP BY 1, 2)
       |WHERE rnk <= $CmsTopN ORDER BY rnk""".stripMargin

  // ---- q281: RAW count-min point estimates ------------------------------

  /** The RAW CountMinSketch path, driver-pinned (q125 pins the
    * in-plan [[graft.catalyst.CmsEstimate]] probe; this pins the other
    * half of the §2.3 row): the sketch is built by the SQL
    * `count_min_sketch` AGGREGATE — the distributed mergeable partial
    * agg, i.e. exactly how a 100 TB pipeline persists per-shard
    * sketch columns — its serialized bytes are read back with
    * `CountMinSketch.readFrom`, and the exact top-10 keys are probed
    * with raw `estimateCount` calls on the deserialized sketch (the
    * API a monitoring job calls against a STORED sketch, no Spark plan
    * around it). Certificates (q172's discipline): never undercounts
    * (structural), overcounts ≤ ⌈ε·N⌉ (p ≥ δ = 0.99, deterministic for
    * fixed data + seed); the 10-row collect is top-k-bounded.
    */
  def cmsRawEstimates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyed = Tables(s, dir, "events").select(
      col("event_type"), col("user_id"),
      xxhash64(concat_ws(":", col("event_type"), col("user_id"))).as("key"))
    val bytes = keyed
      .agg(expr(s"count_min_sketch(key, CAST($CmsEps AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val top = keyed.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_exact"), first(col("key")).as("key"))
      .orderBy(col("n_exact").desc, col("event_type"), col("user_id"))
      .limit(CmsTopN)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_exact").desc, col("event_type"), col("user_id"))))
      .crossJoin(broadcast(keyed.agg(count(lit(1)).as("n_total"))))
      .select(col("event_type"), col("user_id"), col("n_exact"), col("rnk"),
        col("key"), col("n_total"))
      .as[(String, Long, Long, Int, Long, Long)]
      .collect() // CmsTopN rows — top-k-bounded driver probe
    top.toSeq.map { case (et, uid, nExact, rnk, key, nTotal) =>
      val est = cms.estimateCount(key)
      (et, uid, nExact, rnk,
        est >= nExact && est <= nExact + math.ceil(CmsEps * nTotal).toLong)
    }.toDF("event_type", "user_id", "n_exact", "rnk", "raw_ok")
      .orderBy(col("rnk"))
  }

  private val q281Oracle: String =
    s"""SELECT event_type, user_id, n_exact, CAST(rnk AS INTEGER) AS rnk, TRUE AS raw_ok
       |FROM (
       |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
       |    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type, user_id) AS rnk
       |  FROM events GROUP BY 1, 2)
       |WHERE rnk <= $CmsTopN ORDER BY rnk""".stripMargin

  /** q219: sketch SET ALGEBRA — the HLL union is native (merge the
    * registers) but the intersection is NOT; the production estimator
    * is inclusion–exclusion, `|A∩B| ≈ est(A) + est(B) − est(A∪B)`,
    * whose error COMPOUNDS additively across the three estimates. The
    * query pins both sides: exact click/purchase user-set sizes and
    * their exact union/intersection, next to the HLL legs with
    * certificates — the union within its own rsd bound, the I-E
    * intersection within the additive 3-estimate envelope. At 100 TB
    * the exact legs drop and the certificate discipline (q56/q61) is
    * what says the estimates can be trusted.
    */
  def sketchSetAlgebra(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val a = ev.filter(col("event_type") === "click").select(col("user_id"))
    val b = ev.filter(col("event_type") === "purchase").select(col("user_id"))
    val u = a.union(b)
    val exact = a.agg(countDistinct(col("user_id")).as("a_n"),
        approx_count_distinct(col("user_id"), 0.02).as("a_est"))
      .crossJoin(b.agg(countDistinct(col("user_id")).as("b_n"),
        approx_count_distinct(col("user_id"), 0.02).as("b_est")))
      .crossJoin(u.agg(countDistinct(col("user_id")).as("u_n"),
        approx_count_distinct(col("user_id"), 0.02).as("u_est")))
      .crossJoin(a.distinct().join(b.distinct(), "user_id")
        .agg(count(lit(1)).as("i_n")))
    exact.select(col("a_n"), col("b_n"), col("u_n"), col("i_n"),
      (abs(col("u_est") - col("u_n")) <= col("u_n") * 0.05).as("union_ok"),
      (abs(col("a_est") + col("b_est") - col("u_est") - col("i_n"))
        <= (col("a_n") + col("b_n") + col("u_n")) * 0.05).as("inter_ok"))
  }

  private val q219Oracle: String =
    """WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT (SELECT COUNT(*) FROM a) AS a_n,
      |  (SELECT COUNT(*) FROM b) AS b_n,
      |  (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS u_n,
      |  (SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS i_n,
      |  TRUE AS union_ok, TRUE AS inter_ok""".stripMargin

  // ---- registry --------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_approx_distinct" -> (approxDistinct _),
    "q57_approx_quantiles" -> (approxQuantiles _),
    "q58_sketch_merge" -> (sketchMerge _),
    "q59_heavy_hitters" -> (heavyHitters _),
    "q125_cms_frequency" -> (cmsFrequency _),
    "q281_cms_raw" -> (cmsRawEstimates _),
    "q219_sketch_set_algebra" -> (sketchSetAlgebra _))

  val family: String = "sketches"

  val oracles: Map[String, String] = Map(
    "q56_approx_distinct" -> q56Oracle,
    "q57_approx_quantiles" -> q57Oracle,
    "q58_sketch_merge" -> q58Oracle,
    "q59_heavy_hitters" -> q59Oracle,
    "q125_cms_frequency" -> q125Oracle,
    "q281_cms_raw" -> q281Oracle,
    "q219_sketch_set_algebra" -> q219Oracle)
}
