package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Similarity}

/** Driver-checked queries for the training-data operators (north-star
  * extensions, SURVEY §7.3 M6): exact + near dedup, MinHash-LSH, SimHash,
  * ANN (brute + IVF), text quality/language/token analysis — each over
  * the `documents`/`embeddings` tables with a value-level DuckDB oracle.
  */
object DataOps extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")

  /** Deterministic presentation order WITHOUT double-evaluating an
    * expensive chain: a global sort's range-partitioner sampling pass
    * re-runs all post-shuffle compute under it, and for this module's
    * queries that compute (pair verification, ANN scoring, media
    * decode) dwarfs the few-MB result being sorted. Materialize the
    * result once, then sort the materialized blocks (measured: 2× on
    * q22, 3-4× on q45/q55). Narrow per-row projections (q26/q27/q38…)
    * keep a plain orderBy — their sampling pass costs one cheap scan,
    * not a recompute.
    */
  private implicit class SortOnce(df: DataFrame) {
    def sortOnce(cols: Column*): DataFrame = df.localCheckpoint(false).orderBy(cols: _*)
  }

  /** Deterministic per-(name, sfDir) scratch path under the shared
    * graft_work root — one sanitizer for every export query, so the
    * scheme can't fork between call sites. */
  private def workDir(name: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"${name}_$tag").toString
  }

  // ---- q21: exact dedup ------------------------------------------------

  /** Exact dedup over a corpus with planted duplicates (the test corpus
    * is dup-free, so every doc_id≡0 (mod 3) is re-added under a shifted
    * id — mirrored in the oracle).
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val corpus = d.unionAll(
      d.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    Dedup.exactGroups(corpus, col("doc_id"), col("text"))
      .filter(col("n_copies") > 1)
      .select(col("keep_id"), col("n_copies"))
      .sortOnce(col("keep_id"))
  }

  private val q21Oracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0)
      |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1 ORDER BY keep_id""".stripMargin

  // ---- q22: exact near-dup (inverted-index Jaccard) --------------------

  def nearDup(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupPairs(docs(s, dir), col("doc_id"), col("text"), threshold = 0.8)
      .sortOnce(col("doc_a"), col("doc_b"))

  /** toks + per-doc distinct 3-shingle CTEs — the SQL rendition of
    * `WordShingles`, shared by EVERY shingle oracle (q22/q23/q53/q63)
    * so shingle semantics can never fork between them. */
  private[queries] val shingleBaseCtes: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |         unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |                               for i in range(1, len(t) - 1)])) AS shingle
      |       FROM toks WHERE len(t) >= 3)""".stripMargin

  /** Shared oracle CTEs: distinct 3-shingles + per-doc set sizes. */
  private val shingleCtes: String =
    s"""$shingleBaseCtes,
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |exact AS (
      |  SELECT doc_a, doc_b, c / (sa.n + sb.n - c) AS jacc
      |  FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE c / (sa.n + sb.n - c) >= 0.8)""".stripMargin

  private val q22Oracle: String =
    s"WITH $shingleCtes\nSELECT doc_a, doc_b, jacc FROM exact ORDER BY doc_a, doc_b"

  // ---- q23: MinHash + banded LSH near-dup ------------------------------

  private val NumPerms = 16
  private val RowsPerBand = 4

  def minhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(docs(s, dir), col("doc_id"), col("text"),
      threshold = 0.8, numPerms = NumPerms, rowsPerBand = RowsPerBand)
      .sortOnce(col("doc_a"), col("doc_b"))

  private val q23Oracle: String = {
    val sigCols = (0 until NumPerms)
      .map(i => s"MIN(${TextFns.minhashPermSql(i, "h")}) AS s$i").mkString(", ")
    val bandSelects = (0 until NumPerms / RowsPerBand).map { bnd =>
      val key = (0 until RowsPerBand)
        .map(r => s"CAST(s${bnd * RowsPerBand + r} AS VARCHAR)").mkString(" || '_' || ")
      s"SELECT doc_id, $bnd AS band, $key AS key FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shingleCtes,
       |hashed AS (SELECT doc_id, ${TextFns.hash60Sql("shingle")} AS h FROM sh),
       |sigs AS (SELECT doc_id, $sigCols FROM hashed GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cands AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, jacc FROM cands JOIN exact USING (doc_a, doc_b)
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---- q24/q25: ANN over embeddings ------------------------------------

  private val NumQueries = 20
  private val TopK = 3
  private val NumCentroids = 8

  def annBrute(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.bruteTopK(e, e.filter(col("vec_id") < NumQueries), TopK)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), round(col("sim"), 6).as("sim_r"))
      .sortOnce(col("query_id"), col("rnk"))
  }

  private val q24Oracle: String = {
    val cos = VectorFns.cosineSql("q.embedding", "c.embedding")
    s"""SELECT query_id, rnk, neighbor_id, round(sim, 6) AS sim_r FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cos AS sim,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC, c.vec_id) AS rnk
       |  FROM embeddings q, embeddings c
       |  WHERE q.vec_id < $NumQueries AND c.vec_id <> q.vec_id)
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin
  }

  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.ivfTopK(e, e.filter(col("vec_id") < NumQueries),
      e.filter(col("vec_id") < NumCentroids), TopK)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), round(col("sim"), 6).as("sim_r"))
      .sortOnce(col("query_id"), col("rnk"))
  }

  private val q25Oracle: String = {
    val vcos = VectorFns.cosineSql("v.embedding", "c.embedding")
    val qcos = VectorFns.cosineSql("q.embedding", "c.embedding")
    s"""WITH assign AS (
       |  SELECT vec_id, embedding, centroid_id FROM (
       |    SELECT v.vec_id, v.embedding, c.vec_id AS centroid_id,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY $vcos DESC, c.vec_id) AS crn
       |    FROM embeddings v, embeddings c WHERE c.vec_id < $NumCentroids)
       |  WHERE crn = 1)
       |SELECT query_id, rnk, neighbor_id, round(sim, 6) AS sim_r FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $qcos AS sim,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $qcos DESC, c.vec_id) AS rnk
       |  FROM assign q JOIN assign c
       |    ON q.centroid_id = c.centroid_id AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NumQueries)
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin
  }

  // ---- q26: text quality stats -----------------------------------------

  private val stopList = TextFns.EnglishStopwords

  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val stopArr = array(stopList.map(lit): _*)
    docs(s, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tok"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      round(size(array_distinct(toks)).cast("double") / size(toks), 6).as("ttr"),
      size(filter(toks, t => array_contains(stopArr, t))).cast("long").as("stop_hits"),
      round(length(col("text")).cast("double") / size(toks), 6).as("avg_tok_len"),
      // BPE-ish subword segmentation: letter runs, digit runs, other
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast("long").as("n_subtok"))
  }

  private val q26Oracle: String = {
    val stops = stopList.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       | LENGTH(text) AS n_chars,
       | len(string_split(text, ' ')) AS n_tok,
       | len(list_distinct(string_split(text, ' '))) AS n_distinct,
       | round(len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')), 6) AS ttr,
       | len(list_filter(string_split(text, ' '), t -> list_contains($stops, t))) AS stop_hits,
       | round(LENGTH(text) / len(string_split(text, ' ')), 6) AS avg_tok_len,
       | len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS n_subtok
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---- q27: language-ID heuristic --------------------------------------

  private val langLists: Seq[(String, Seq[String])] = Seq(
    "en" -> TextFns.EnglishStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"))

  /** Stopword-overlap language ID: most-hit list wins; zero hits → 'und'
    * (ISO 639-3 undetermined). Ties resolved by list order (en<de<fr).
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val hits = langLists.map { case (lang, words) =>
      size(filter(toks, t => array_contains(array(words.map(lit): _*), t))).as(s"hits_$lang")
    }
    val d = docs(s, dir).select(col("doc_id") +: hits: _*)
    // argmax with first-listed winning ties, zero → 'und'
    val maxHits = greatest(langLists.map { case (l, _) => col(s"hits_$l") }: _*)
    val guess = when(maxHits === 0, lit("und"))
      .otherwise(langLists.foldLeft(lit(null).cast("string")) { case (acc, (l, _)) =>
        coalesce(acc, when(col(s"hits_$l") === maxHits, lit(l)))
      })
    d.select(col("doc_id"), col("hits_en"), col("hits_de"), col("hits_fr"), guess.as("lang_guess"))
      
  }

  private val q27Oracle: String = {
    val hitExprs = langLists.map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(string_split(text, ' '), t -> list_contains($arr, t))) AS hits_$lang"
    }.mkString(",\n ")
    s"""WITH h AS (SELECT doc_id, $hitExprs FROM documents)
       |SELECT doc_id, hits_en, hits_de, hits_fr,
       | CASE WHEN greatest(hits_en, hits_de, hits_fr) = 0 THEN 'und'
       |      WHEN hits_en = greatest(hits_en, hits_de, hits_fr) THEN 'en'
       |      WHEN hits_de = greatest(hits_en, hits_de, hits_fr) THEN 'de'
       |      ELSE 'fr' END AS lang_guess
       |FROM h ORDER BY doc_id""".stripMargin
  }

  // ---- q28: SimHash fingerprint ----------------------------------------

  def simhashFp(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(docs(s, dir), col("doc_id"), col("text"))
      

  /** SimHash fingerprint CTEs shared by q28 and q46 (ends with an `fp`
    * relation of (doc_id, simhash)). */
  private val simhashCte: String = {
    val h = TextFns.hash60Sql("tok")
    val bitSums = (0 until 32).map(b => s"SUM((h >> $b) & 1) AS b$b").mkString(", ")
    val fp = (0 until 32)
      .map(b => s"(CASE WHEN 2 * b$b > n_toks THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH dtoks AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
       |hashed AS (SELECT doc_id, $h AS h FROM dtoks),
       |counted AS (SELECT doc_id, COUNT(*) AS n_toks, $bitSums FROM hashed GROUP BY doc_id),
       |fp AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM counted)""".stripMargin
  }

  private val q28Oracle: String =
    s"""$simhashCte
       |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin

  // ---- q46: SimHash near-dup (pigeonhole multi-index) ------------------

  /** Band-bucketed SimHash near-dup join: exact recall for hamming ≤ 1
    * by pigeonhole over 2 bands (no probabilistic miss — see
    * Dedup.simhashNearDups). k = 1, not 3: the templated test corpus
    * duplicates fingerprints heavily, so the RESULT itself grows
    * super-linearly with the hamming budget (2.1 M pairs at k=3 vs
    * 433 k at k=1 on sf0.1) — the tight budget keeps the query
    * output-meaningful while exercising the same machinery. The oracle
    * recomputes fingerprints and brute-forces all pairs.
    */
  def simhashNearDup(s: SparkSession, dir: String): DataFrame =
    // spareBlocks = 2 (3 bands of ~21-bit 2-block keys, vs s=1's two
    // 16-bit halves): a near-miss twin at hamming 2-8 often keeps one
    // 16-bit half intact, so s=1 candidate volume tracks the twin
    // structure quadratically (measured 14.0x decade, output only
    // 6.6x); requiring 2-of-3 blocks to match at once cuts it to 8.0x.
    // Answer-invariant - pigeonhole completeness holds at any s and
    // every candidate is exact-verified (DedupSpec s-equivalence).
    Dedup.simhashNearDups(docs(s, dir), col("doc_id"), col("text"),
        maxHamming = 1, spareBlocks = 2)
      .sortOnce(col("doc_a"), col("doc_b"))

  private val q46Oracle: String =
    s"""$simhashCte
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM fp a, fp b
       |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 1
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- q29: multimodal binary columns ----------------------------------

  /** Binary media payloads + typed metadata through the mapPartitions
    * feature extractor, exercising the TOTALITY contract: these payloads
    * are text bytes, not decodable containers, so every row takes the
    * ByteStats + metadata-arithmetic fallback (the real decodes are
    * pinned by q45/q54/q55). The corpus is ASCII so the oracle
    * reproduces the byte stats with per-char code points.
    */
  def multimodal(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.decodeFeatures(Multimodal.syntheticMedia(docs(s, dir)))
      .select(col("media_id"), col("kind"), col("n_bytes"), col("byte_sum"),
        col("byte_min"), col("byte_max"), col("n_pixels"), col("frames_sampled"),
        col("resized_w"), col("resized_h"))
  }

  private val q29Oracle: String =
    """SELECT doc_id AS media_id,
      | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      | octet_length(encode(text)) AS n_bytes,
      | CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS BIGINT) AS byte_sum,
      | list_min(list_transform(string_split(text, ''), c -> ascii(c))) AS byte_min,
      | list_max(list_transform(string_split(text, ''), c -> ascii(c))) AS byte_max,
      | CAST((n_chars % 64 + 1) * (n_chars % 48 + 1) AS BIGINT) AS n_pixels,
      | CASE WHEN doc_id % 3 = 2
      |      THEN CAST(least(16, (n_chars % 100 + 1 + 9) // 10) AS INTEGER) END AS frames_sampled,
      | CASE WHEN doc_id % 3 = 0 THEN CAST(32 AS INTEGER) END AS resized_w,
      | CASE WHEN doc_id % 3 = 0
      |      THEN CAST(greatest(1, ((n_chars % 48 + 1) * 32) // (n_chars % 64 + 1)) AS INTEGER)
      |      END AS resized_h
      |FROM documents ORDER BY media_id""".stripMargin

  // ---- q45: REAL image decode (javax.imageio) --------------------------

  /** Genuine PNG containers round-tripped through the real image codec:
    * deterministic row-gradient grayscale PNGs (pixel(x,y) = (id+y)%256)
    * are encoded per-partition, then decoded with `javax.imageio`, pixel
    * stats read from the raster, and resized via `Graphics2D`. The
    * closed-form pixel function lets the SQL oracle predict every
    * decoded statistic — a green run proves a real decode happened
    * (byte-level stats of a PNG container would match nothing).
    */
  def imageDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.decodeFeatures(Multimodal.syntheticImages(docs(s, dir)))
      .select(col("media_id"), col("decoded_w"), col("decoded_h"), col("n_pixels"),
        col("px_min"), col("px_max"), col("px_sum"), col("resized_w"), col("resized_h"))
      .sortOnce(col("media_id"))
  }

  private val q45Oracle: String =
    """WITH base AS (
      |  SELECT doc_id, doc_id % 16 + 4 AS w, doc_id % 12 + 4 AS h FROM documents),
      |ys AS (SELECT doc_id, w, h, unnest(range(h)) AS y FROM base),
      |px AS (
      |  SELECT doc_id, w, h,
      |    MIN((doc_id + y) % 256) AS px_min,
      |    MAX((doc_id + y) % 256) AS px_max,
      |    SUM((doc_id + y) % 256) * w AS px_sum
      |  FROM ys GROUP BY 1, 2, 3)
      |SELECT doc_id AS media_id,
      |  CAST(w AS INTEGER) AS decoded_w, CAST(h AS INTEGER) AS decoded_h,
      |  CAST(w * h AS BIGINT) AS n_pixels,
      |  CAST(px_min AS INTEGER) AS px_min, CAST(px_max AS INTEGER) AS px_max,
      |  CAST(px_sum AS BIGINT) AS px_sum,
      |  CAST(32 AS INTEGER) AS resized_w,
      |  CAST(greatest(1, (h * 32) // w) AS INTEGER) AS resized_h
      |FROM px ORDER BY media_id""".stripMargin

  // ---- q54: REAL audio decode (javax.sound.sampled) --------------------

  /** Genuine RIFF/WAVE containers round-tripped through the real audio
    * codec: deterministic 16-bit mono PCM (sample(i) =
    * (id·7 + i·13) % 4001 − 2000) encoded per-partition, decoded with
    * `javax.sound.sampled`, channel-0 sample statistics. The closed-form
    * sample function lets the SQL oracle predict every decoded statistic
    * — a green run proves a real container decode happened (byte stats
    * of a RIFF header would match nothing).
    */
  def audioDecode(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.decodeFeatures(Multimodal.syntheticAudio(docs(s, dir)))
      .select(col("media_id"), col("sample_rate"), col("n_samples"),
        col("smp_min"), col("smp_max"), col("smp_sum"), col("duration_ms"))
      .sortOnce(col("media_id"))
  }

  private val q54Oracle: String =
    """WITH base AS (
      |  SELECT doc_id, CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
      |         doc_id % 500 + 100 AS n FROM documents),
      |smp AS (SELECT doc_id, sample_rate, n, unnest(range(n)) AS i FROM base),
      |st AS (
      |  SELECT doc_id, sample_rate, n,
      |    MIN((doc_id * 7 + i * 13) % 4001 - 2000) AS smp_min,
      |    MAX((doc_id * 7 + i * 13) % 4001 - 2000) AS smp_max,
      |    SUM((doc_id * 7 + i * 13) % 4001 - 2000) AS smp_sum
      |  FROM smp GROUP BY 1, 2, 3)
      |SELECT doc_id AS media_id, sample_rate,
      |  CAST(n AS BIGINT) AS n_samples,
      |  CAST(smp_min AS INTEGER) AS smp_min, CAST(smp_max AS INTEGER) AS smp_max,
      |  CAST(smp_sum AS BIGINT) AS smp_sum,
      |  CAST(n * 1000 // sample_rate AS BIGINT) AS duration_ms
      |FROM st ORDER BY media_id""".stripMargin

  // ---- q55: REAL video frame sampling (ImageIO sequence) ---------------

  /** Genuine animated-GIF containers through the real sequence decoder:
    * per-doc multi-frame grayscale GIFs (frame fr pixel(x,y) =
    * (id + fr·31 + y) % 256), every-3rd-frame sampling capped at 5
    * frames, pixel statistics over the sampled frames only — the
    * training-data frame-sampling shape, with the true container frame
    * count alongside. Closed-form pixels make every statistic
    * SQL-predictable.
    */
  def videoFrames(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.decodeFeatures(Multimodal.syntheticVideos(docs(s, dir)),
        frameEveryK = 3, frameCap = 5)
      .select(col("media_id"), col("n_frames"), col("frames_sampled"),
        col("decoded_w"), col("decoded_h"), col("n_pixels"),
        col("px_min"), col("px_max"), col("px_sum"))
      .sortOnce(col("media_id"))
  }

  private val q55Oracle: String =
    """WITH base AS (
      |  SELECT doc_id, doc_id % 12 + 4 AS w, doc_id % 8 + 4 AS h,
      |         doc_id % 20 + 2 AS nf FROM documents),
      |fy AS (SELECT doc_id, w, h, nf, unnest(range(nf)) AS f FROM base),
      |sel AS (SELECT * FROM fy WHERE f % 3 = 0 AND f // 3 < 5),
      |fyy AS (SELECT doc_id, w, h, nf, f, unnest(range(h)) AS y FROM sel),
      |st AS (
      |  SELECT doc_id, w, h, nf,
      |    COUNT(DISTINCT f) AS frames_sampled,
      |    MIN((doc_id + f * 31 + y) % 256) AS px_min,
      |    MAX((doc_id + f * 31 + y) % 256) AS px_max,
      |    SUM((doc_id + f * 31 + y) % 256) * w AS px_sum
      |  FROM fyy GROUP BY 1, 2, 3, 4)
      |SELECT doc_id AS media_id,
      |  CAST(nf AS INTEGER) AS n_frames,
      |  CAST(frames_sampled AS INTEGER) AS frames_sampled,
      |  CAST(w AS INTEGER) AS decoded_w, CAST(h AS INTEGER) AS decoded_h,
      |  CAST(w * h AS BIGINT) AS n_pixels,
      |  CAST(px_min AS INTEGER) AS px_min, CAST(px_max AS INTEGER) AS px_max,
      |  CAST(px_sum AS BIGINT) AS px_sum
      |FROM st ORDER BY media_id""".stripMargin

  // ---- q37: embedding-cosine near-dup ----------------------------------

  /** Embedding-space near-duplicates (the dedup family's fourth member
    * next to exact/Jaccard/MinHash): pairs with cosine ≥ 0.45. The test
    * embeddings are random vectors whose pair similarities form a
    * continuum straddling the threshold (0.4494 just below vs 0.4516
    * just above at sf0.01) — no bucketing filter can be both complete
    * and selective there, so this query uses the EXACT blocked pairwise
    * equi-join. The separated-duplicate regime where LSH candidates do
    * pay off is q44.
    */
  def embedNearDup(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.cosineNearDupPairs(emb(s, dir), threshold = 0.45)
      .sortOnce(col("vec_a"), col("vec_b"))

  private val q37Oracle: String = {
    val cos = VectorFns.cosineSql("a.embedding", "b.embedding")
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round($cos, 6) AS sim_r
       |FROM embeddings a, embeddings b
       |WHERE a.vec_id < b.vec_id AND $cos >= 0.45
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  // ---- q44: sign-LSH near-dup on planted duplicates --------------------

  /** The sublinear near-dup path on a TRUE near-dup corpus: the
    * embeddings table unioned with a perturbed copy of itself (dim 0
    * shifted by +0.1 → planted pairs at cosine ≈ 0.995 vs a ≤ 0.61
    * background). Sign-LSH banding generates candidates (~4% of pairs),
    * exact cosine verifies — the oracle recomputes the full exact
    * all-pairs answer, so a green run proves 100% recall on every
    * planted pair plus zero false positives.
    */
  def lshNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    // planted ids start past max(vec_id), DERIVED from the corpus (one
    // column-pruned scalar-agg action at plan time) so a larger SF can
    // never collide planted ids with real ones and silently corrupt the
    // pair set; the oracle derives the same offset via a subquery
    val off = e.agg(max(col("vec_id")).cast("long")).head().getLong(0) + 1L
    val planted = e.select((col("vec_id") + lit(off)).as("vec_id"),
      concat(array(element_at(col("embedding"), 1) + lit(0.1)),
        slice(col("embedding"), 2, 10000)).as("embedding"))
    // rowsPerBand is the sign-LSH SCALE knob (the hamming family's
    // spareBlocks analogue): 2^R keys per band. R=8 (256 keys) saturates
    // past ~10^4 vectors — avg bucket grows ~n/2^R and candidates ~n²/2^R
    // (measured: OOM at the 40k-vector sf1 corpus). R=12 (4096 keys)
    // holds buckets ~10 deep there; recall on the planted 0.995-cosine
    // pairs stays exact (miss ≈ (1−0.968^12)^16 ≈ 1.3e-8 per pair, and
    // the oracle's full all-pairs recompute verifies it at every scale).
    graft.operators.Similarity.signLshNearDupPairs(e.unionByName(planted),
        threshold = 0.9, numBands = 16, rowsPerBand = 12)
      .sortOnce(col("vec_a"), col("vec_b"))
  }

  private val q44Oracle: String = {
    val cos = VectorFns.cosineSql("a.embedding", "b.embedding")
    s"""WITH c2 AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings),
       |    list_prepend(embedding[1] + CAST(0.1 AS DOUBLE), CAST(embedding[2:] AS DOUBLE[]))
       |  FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round($cos, 6) AS sim_r
       |FROM c2 a, c2 b
       |WHERE a.vec_id < b.vec_id AND $cos >= 0.9
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  // ---- q60: PQ ADC search over fixed codebooks -------------------------

  /** PQ-compressed ANN, the SEARCH half under a full value oracle:
    * codebooks are the deterministic Lloyd's INIT (`iters = 0` — the
    * ksub lowest-id vectors' chunks, code = id rank), which DuckDB can
    * reconstruct in pure SQL, so encode → LUT → ADC → top-k is pinned
    * rows+schema+hash. Lloyd's refinement itself is iterative k-means
    * (not SQL-expressible — same precedent as `trainCentroids`) and
    * stays spec-pinned: PqSpec proves ADC ≡ brute L2 on a lossless
    * corpus and IVF-PQ ≡ full ADC at nprobe = numCentroids, with
    * trained codebooks. Both engines fold floats in the same
    * left-to-right order (per-chunk fold, then chunk-ordered fold), so
    * the hash comparison is exact, not tolerance-based.
    */
  def pqAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pq
    val e = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val cb = Pq.trainCodebooks(e, m = 4, ksub = 8, iters = 0)
    val codes = Pq.encode(e, cb, m = 4)
    Pq.adcTopK(codes, e.filter(col("vec_id") < 10), cb, m = 4, k = 3)
      .sortOnce(col("query_id"), col("rnk"))
  }

  /** DuckDB left-to-right squared-L2 fold — same association as
    * [[graft.operators.Pq]]'s `aggregate(zip_with(...))` (init 0 + x₁
    * ≡ x₁ exactly, so a no-init list_reduce matches bit-for-bit). */
  private def l2FoldSql(a: String, b: String): String =
    s"list_reduce([($a[i] - $b[i]) * ($a[i] - $b[i]) for i in range(1, len($a) + 1)], (x, y) -> x + y)"

  /** Shared PQ oracle CTEs: double-cast corpus, m=4 chunk slices, the
    * iters=0 init codebook (8 lowest ids, code = rank), per-(vec,chunk)
    * argmin encoding, and the vec_id<10 query LUT. Mirrors
    * `Pq.chunks`/`trainCodebooks(iters=0)`/`encode`/`queryLut`. */
  private val pqBaseCtes: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |chunks AS (
       |  SELECT vec_id, ch.chunk,
       |         emb[ch.chunk * (len(emb) // 4) + 1 : (ch.chunk + 1) * (len(emb) // 4)] AS sub
       |  FROM e, (SELECT unnest(range(4)) AS chunk) ch),
       |ids AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code
       |        FROM e ORDER BY vec_id LIMIT 8),
       |cb AS (SELECT c.chunk, i.code, c.sub AS centroid
       |       FROM chunks c JOIN ids i USING (vec_id)),
       |enc AS (
       |  SELECT vec_id, chunk, code FROM (
       |    SELECT c.vec_id, c.chunk, cb.code,
       |           row_number() OVER (PARTITION BY c.vec_id, c.chunk
       |             ORDER BY ${l2FoldSql("c.sub", "cb.centroid")}, cb.code) AS rn
       |    FROM chunks c JOIN cb ON c.chunk = cb.chunk) WHERE rn = 1),
       |qd AS (SELECT c.vec_id AS query_id, c.chunk, cb.code,
       |              ${l2FoldSql("c.sub", "cb.centroid")} AS d
       |       FROM chunks c JOIN cb ON c.chunk = cb.chunk
       |       WHERE c.vec_id < 10)""".stripMargin

  private val q60Oracle: String =
    s"""WITH $pqBaseCtes,
       |scored AS (
       |  SELECT q.query_id, en.vec_id,
       |         list_reduce(list(q.d ORDER BY q.chunk), (x, y) -> x + y) AS adist
       |  FROM enc en JOIN qd q ON en.chunk = q.chunk AND en.code = q.code
       |  WHERE en.vec_id <> q.query_id
       |  GROUP BY 1, 2)
       |SELECT query_id, rnk, vec_id AS neighbor_id, round(adist, 6) AS adist
       |FROM (SELECT query_id, vec_id, adist,
       |             row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rnk
       |      FROM scored)
       |WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin

  // ---- q80: IVF-PQ routed search over fixed codebooks ------------------

  /** IVF-PQ search under a full value oracle — the bucket-ROUTING half
    * that q60 doesn't cover: every vector is assigned its L2-nearest
    * coarse centroid (10 corpus vectors, ids ≡ 0 mod 50), each query
    * probes its nprobe=2 nearest buckets, and ADC runs only inside
    * them. Same fixed iters=0 codebooks as q60 so DuckDB replays
    * assignment, probing, and ADC arithmetic exactly; tie-breaks
    * (distance, then centroid/neighbor id) are pinned on both sides.
    */
  def ivfPqAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Pq
    val e = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val cb = Pq.trainCodebooks(e, m = 4, ksub = 8, iters = 0)
    val cents = e.filter(col("vec_id") % 50 === 0)
    val index = Pq.bucketedEncode(e, cents, cb, m = 4)
    Pq.ivfAdcTopK(index, e.filter(col("vec_id") < 10), cents, cb, m = 4, k = 3, nprobe = 2)
      .sortOnce(col("query_id"), col("rnk"))
  }

  private val q80Oracle: String =
    s"""WITH $pqBaseCtes,
       |cents AS (SELECT vec_id AS centroid_id, emb AS cent FROM e WHERE vec_id % 50 = 0),
       |assign AS (SELECT vec_id, centroid_id FROM (
       |    SELECT e.vec_id, c.centroid_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${l2FoldSql("e.emb", "c.cent")}, c.centroid_id) AS rn
       |    FROM e, cents c) WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, centroid_id FROM (
       |    SELECT e.vec_id, c.centroid_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${l2FoldSql("e.emb", "c.cent")}, c.centroid_id) AS rn
       |    FROM e, cents c WHERE e.vec_id < 10) WHERE rn <= 2),
       |scored AS (
       |  SELECT q.query_id, en.vec_id,
       |         list_reduce(list(q.d ORDER BY q.chunk), (x, y) -> x + y) AS adist
       |  FROM enc en
       |  JOIN assign a ON en.vec_id = a.vec_id
       |  JOIN probes p ON a.centroid_id = p.centroid_id
       |  JOIN qd q ON q.query_id = p.query_id AND en.chunk = q.chunk AND en.code = q.code
       |  WHERE en.vec_id <> p.query_id
       |  GROUP BY 1, 2)
       |SELECT query_id, rnk, vec_id AS neighbor_id, round(adist, 6) AS adist
       |FROM (SELECT query_id, vec_id, adist,
       |             row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rnk
       |      FROM scored)
       |WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin

  // ---- q38: rolling-hash document fingerprint --------------------------

  /** Karp–Rabin rolling hash over the character stream (mod 1e9+7,
    * base 257): content fingerprint cheaper than md5 to maintain
    * incrementally. The char array is projected before the fold so the
    * split runs once per row.
    */
  def rollingHash(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), "").as("chars"))
      .select(col("doc_id"),
        aggregate(transform(col("chars"), c => ascii(c).cast("long")),
          lit(0L), (acc, x) => (acc * 257 + x) % 1000000007L).as("rhash"))

  private val q38Oracle: String =
    """SELECT doc_id,
      | list_reduce(
      |   list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |   (a, b) -> (a * 257 + b) % 1000000007) AS rhash
      |FROM documents""".stripMargin

  // ---- q63: train/test decontamination ---------------------------------

  /** Decontamination sweep: the corpus split into train (doc_id % 17 ≠
    * 0) and a small eval set (doc_id % 17 = 0); flag every train doc
    * sharing ≥ 3 distinct 3-shingles with any eval doc — the bipartite
    * inverted-index membership check run before every evaluation, so
    * leaked eval content can be purged from training data.
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.contaminationPairs(
      d.filter(col("doc_id") % 17 =!= 0), col("doc_id"), col("text"),
      d.filter(col("doc_id") % 17 === 0), col("doc_id"), col("text"),
      w = 3, minShared = 3)
      .sortOnce(col("train_id"), col("test_id"))
  }

  private val q63Oracle: String =
    s"""WITH $shingleBaseCtes,
      |tr AS (SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id % 17 <> 0),
      |te AS (SELECT doc_id AS test_id, shingle FROM sh WHERE doc_id % 17 = 0)
      |SELECT train_id, test_id, COUNT(*) AS n_shared
      |FROM tr JOIN te USING (shingle)
      |GROUP BY 1, 2 HAVING COUNT(*) >= 3
      |ORDER BY train_id, test_id""".stripMargin

  // ---- q64–q66: deterministic sampling ---------------------------------

  /** Deterministic 20% Bernoulli sample of the corpus by content hash —
    * the replayable subsample a pipeline can audit (same rows in every
    * run/cluster/engine; `df.sample`'s per-partition RNG cannot promise
    * that). The oracle re-derives the identical selection in DuckDB
    * through the shared bit-for-bit hash60.
    */
  def deterministicSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.deterministicSample(
        docs(s, dir), col("doc_id"), fraction = 0.2, seed = 7)
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  private val q64Oracle: String = {
    val h = TextFns.seededHashSql(7, "CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id FROM documents
       |WHERE $h < ${graft.operators.Sampling.threshold(0.2)}
       |ORDER BY doc_id""".stripMargin
  }

  /** Stratified deterministic sampling — the data-mixing primitive:
    * per-event-type keep rates (purchases kept whole, clicks 25%,
    * views 10%, the rest 50%) applied as a zero-shuffle hash filter,
    * reduced to per-type sampled counts.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedSample(
        Tables(s, dir, "events"), col("event_type"), col("event_id"),
        Map("purchase" -> 1.0, "click" -> 0.25, "view" -> 0.1),
        defaultFraction = 0.5, seed = 3)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("event_type"))

  private val q65Oracle: String = {
    import graft.operators.Sampling.threshold
    val h = TextFns.seededHashSql(3, "CAST(event_id AS VARCHAR)")
    s"""SELECT event_type, COUNT(*) AS n_sampled FROM events
       |WHERE $h < CASE event_type
       |  WHEN 'purchase' THEN ${threshold(1.0)}
       |  WHEN 'click' THEN ${threshold(0.25)}
       |  WHEN 'view' THEN ${threshold(0.1)}
       |  ELSE ${threshold(0.5)} END
       |GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** Deterministic per-stratum reservoir: exactly 4 events per type,
    * chosen by seeded hash order — per-group "random" examples that
    * stay identical across runs (eval-set construction, debugging
    * samples).
    */
  def reservoirSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.reservoirPerKey(
        Tables(s, dir, "events"), col("event_type"), col("event_id"), n = 4, seed = 5)
      .select(col("event_type"), col("event_id"))
      .orderBy(col("event_type"), col("event_id"))

  private val q66Oracle: String = {
    val h = TextFns.seededHashSql(5, "CAST(event_id AS VARCHAR)")
    s"""SELECT event_type, event_id FROM events
       |QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY $h, event_id) <= 4
       |ORDER BY event_type, event_id""".stripMargin
  }

  // ---- q67: the training-data pipeline, end-to-end ---------------------

  /** The whole training-data curation pipeline as ONE declarative
    * composition — the flagship integration query: train/eval split →
    * near-dup purge (q22's exact-Jaccard pairs → q53's components →
    * canonical keep) → decontamination against the eval set (q63) →
    * quality gate (q26's metrics) → deterministic 50% subsample (q64) —
    * reported as a per-stage funnel of document and token counts. Each
    * stage is lazily materialized once (`localCheckpoint(false)`) and
    * shared by all downstream branches, so the five summaries don't
    * recompute the chain. The oracle rebuilds the identical funnel in
    * DuckDB from the shared shingle CTEs, a recursive-CTE closure, and
    * the bit-identical sampling hash.
    */
  def trainingPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val d = docs(s, dir)
    val train = d.filter(col("doc_id") % 17 =!= 0).localCheckpoint(false)
    val evalSet = d.filter(col("doc_id") % 17 === 0)
    val deduped = Dedup.purgeNearDups(train, col("doc_id"),
        Dedup.nearDupPairs(train, col("doc_id"), col("text"), threshold = 0.8))
      .localCheckpoint(false)
    val contamIds = Dedup.contaminationPairs(train, col("doc_id"), col("text"),
        evalSet, col("doc_id"), col("text"), minShared = 3)
      .select(col("train_id").as("__contam_id")).distinct()
    val decontamed = deduped
      .join(contamIds, col("doc_id") === col("__contam_id"), "left_anti")
      .localCheckpoint(false)
    val toks = TextFns.tokens(col("text"))
    val quality = decontamed.filter(size(toks) >= 8 &&
        round(size(array_distinct(toks)).cast("double") / size(toks), 6) >= 0.5)
      .localCheckpoint(false)
    val sampled = Sampling.deterministicSample(quality, col("doc_id"), 0.5, seed = 11)
    def summary(stage: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs"),
          sum(size(TextFns.tokens(col("text"))).cast("long")).as("n_tokens"))
        .select(lit(stage).as("stage"), col("n_docs"), col("n_tokens"))
    summary("1_train_split", train)
      .unionByName(summary("2_after_dedup", deduped))
      .unionByName(summary("3_after_decontam", decontamed))
      .unionByName(summary("4_after_quality", quality))
      .unionByName(summary("5_after_sample", sampled))
      .orderBy(col("stage"))
  }

  /** Everything downstream of the `texact` train-pair CTE — shared by
    * the self-contained oracle and the STAGED sf1 variant (pairs from
    * the Spark-verified q22 dump), so the replays can never fork. */
  private val q67OracleBody: String =
    s"""nodes AS (SELECT doc_a AS n FROM texact UNION SELECT doc_b FROM texact),
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM texact
       |          UNION SELECT doc_b, doc_a FROM texact),
       |reach AS (
       |  WITH RECURSIVE r(src, dst) AS (
       |    SELECT n, n FROM nodes
       |    UNION
       |    SELECT r.src, e.v FROM r JOIN edges e ON e.u = r.dst)
       |  SELECT * FROM r),
       |cc AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY 1),
       |purge AS (SELECT doc_id FROM cc WHERE doc_id <> component),
       |contam AS (SELECT DISTINCT doc_id FROM (
       |  SELECT a.doc_id, b.doc_id AS eid FROM tsh a JOIN esh b ON a.shingle = b.shingle
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)),
       |s1 AS (SELECT * FROM documents WHERE doc_id % 17 <> 0),
       |s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM purge)),
       |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
       |s4 AS (SELECT * FROM s3 WHERE len(string_split(text, ' ')) >= 8
       |        AND round(len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')), 6) >= 0.5),
       |s5 AS (SELECT * FROM s4
       |       WHERE ${TextFns.seededHashSql(11, "CAST(doc_id AS VARCHAR)")}
       |             < ${graft.operators.Sampling.threshold(0.5)})
       |SELECT * FROM (
       |  SELECT '1_train_split' AS stage, COUNT(*) AS n_docs,
       |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens FROM s1
       |  UNION ALL SELECT '2_after_dedup', COUNT(*),
       |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) FROM s2
       |  UNION ALL SELECT '3_after_decontam', COUNT(*),
       |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) FROM s3
       |  UNION ALL SELECT '4_after_quality', COUNT(*),
       |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) FROM s4
       |  UNION ALL SELECT '5_after_sample', COUNT(*),
       |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) FROM s5
       |) ORDER BY stage""".stripMargin

  private val q67Oracle: String =
    s"""WITH $shingleBaseCtes,
       |tsh AS (SELECT * FROM sh WHERE doc_id % 17 <> 0),
       |esh AS (SELECT * FROM sh WHERE doc_id % 17 = 0),
       |tsizes AS (SELECT doc_id, COUNT(*) AS n FROM tsh GROUP BY 1),
       |tpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
       |           FROM tsh a JOIN tsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |texact AS (SELECT doc_a, doc_b FROM tpairs
       |           JOIN tsizes sa ON sa.doc_id = doc_a JOIN tsizes sb ON sb.doc_id = doc_b
       |           WHERE c / (sa.n + sb.n - c) >= 0.8),
       |$q67OracleBody""".stripMargin

  /** STAGED sf1 replay: Jaccard is pairwise, so the train-side pair set
    * is EXACTLY the corpus-wide q22 pair set restricted to train
    * endpoints — the Spark q22 dump (hash-verified by the same sweep)
    * replaces the one CTE DuckDB cannot afford at sf1 (the shingle
    * self-join, 93 GiB OOM); the contamination join, closure, quality
    * gate and sampling hash all still replay from scratch. */
  private val q67StagedOracle: String =
    s"""WITH $shingleBaseCtes,
       |tsh AS (SELECT * FROM sh WHERE doc_id % 17 <> 0),
       |esh AS (SELECT * FROM sh WHERE doc_id % 17 = 0),
       |texact AS (SELECT doc_a, doc_b FROM q22_neardup
       |           WHERE doc_a % 17 <> 0 AND doc_b % 17 <> 0),
       |$q67OracleBody""".stripMargin

  // ---- q69/q70: sequence packing (training-data export) ----------------

  private val PackBudget = 512L

  /** Concat-and-chunk sequence packing over the corpus in doc_id order:
    * each document's global token span and the training sequence(s) it
    * lands in, via [[graft.operators.Packing.packOffsets]]'s two-phase
    * scalable prefix sum (range buckets + local window cumsums + tiny
    * bucket-offset broadcast — never a single-reducer global window).
    * The oracle recomputes the spans with DuckDB's global running sum,
    * so a green run proves the distributed prefix sum equals the
    * sequential scan.
    */
  def seqPacking(s: SparkSession, dir: String): DataFrame =
    packedOffsets(s, dir).orderBy(col("pack_id"))

  private def packedOffsets(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.packOffsets(
      docs(s, dir), col("doc_id"), size(TextFns.tokens(col("text"))),
      budget = PackBudget)

  private val packOracleCtes: String = {
    // mirrors packOffsets' zero-token anchor rule: an n_tok=0 doc
    // (start_off == end_off) anchors at start_off-1 clamped to 0, so a
    // doc sitting exactly on a cut attaches to the PRECEDING sequence.
    // Untriggerable on this corpus (split(text,' ') never yields an
    // empty array) but mirrored anyway so operator and oracle cannot
    // silently disagree on a future zero-token input.
    val anchor = "CASE WHEN n_tok = 0 THEN GREATEST(end_off - 1, 0) ELSE end_off - n_tok END"
    s"""t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |       FROM documents),
       |c AS (SELECT doc_id AS pack_id, n_tok,
       |        CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       |             AS BIGINT) AS end_off
       |      FROM t),
       |o AS (SELECT pack_id, n_tok, end_off - n_tok AS start_off, end_off,
       |        CAST(FLOOR(($anchor) / $PackBudget) AS BIGINT) AS first_seq,
       |        GREATEST(CAST(FLOOR(($anchor) / $PackBudget) AS BIGINT),
       |                 CAST(FLOOR((end_off - 1) / $PackBudget) AS BIGINT)) AS last_seq
       |      FROM c)""".stripMargin
  }

  private val q69Oracle: String =
    s"""WITH $packOracleCtes
       |SELECT pack_id, n_tok, start_off, end_off, first_seq, last_seq,
       |       first_seq <> last_seq AS split
       |FROM o ORDER BY pack_id""".stripMargin

  /** The per-sequence packing manifest (the writer-side view before
    * emitting fixed-length examples): docs per training sequence,
    * boundary-split count, filled token count, doc range. The oracle
    * explodes each doc's `first_seq..last_seq` with generate_series and
    * re-aggregates — pinning the explode + fill arithmetic exactly.
    */
  def packManifest(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.packManifest(packedOffsets(s, dir), PackBudget)
      .orderBy(col("seq"))

  private val q70Oracle: String =
    s"""WITH $packOracleCtes,
       |e AS (SELECT pack_id, start_off, end_off,
       |        unnest(generate_series(first_seq, last_seq)) AS seq,
       |        first_seq <> last_seq AS split
       |      FROM o)
       |SELECT seq, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN split THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
       |  CAST(SUM(LEAST(end_off, (seq + 1) * $PackBudget)
       |         - GREATEST(start_off, seq * $PackBudget)) AS BIGINT) AS n_tok,
       |  MIN(pack_id) AS first_doc, MAX(pack_id) AS last_doc
       |FROM e GROUP BY seq ORDER BY seq""".stripMargin

  // ---- q71: sliding-window chunking ------------------------------------

  /** Context-length preparation: every document split into 16-token
    * windows at stride 12 (overlapping, the retrieval-embedding shape)
    * via [[graft.operators.Chunking.slidingWindows]] — a narrow bounded
    * explode, no shuffle. The oracle recomputes every window with
    * DuckDB's strided range + list slicing, pinning window starts,
    * short-tail lengths, and the reassembled chunk text byte-for-byte.
    */
  def chunking(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.slidingWindows(
        docs(s, dir), col("doc_id"), col("text"), window = 16, stride = 12)
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val q71Oracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |s AS (SELECT doc_id, t, unnest(range(0, len(t), 12)) AS start_tok FROM toks)
      |SELECT doc_id, start_tok // 12 AS chunk_idx, start_tok,
      |  CAST(LEAST(16, len(t) - start_tok) AS BIGINT) AS n_tok,
      |  array_to_string(t[start_tok + 1:start_tok + 16], ' ') AS chunk
      |FROM s ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- q72: within-doc repetition metrics (Gopher-style) ---------------

  /** Gopher-style repetition gates per document: total bigrams, the
    * most frequent bigram (count ties broken by lexicographically
    * greatest gram, deterministically), its fraction, and the duplicate
    * bigram fraction. The oracle rebuilds the same counts from a list
    * comprehension and re-derives the arg-max with an ordered
    * row_number.
    */
  def repetition(s: SparkSession, dir: String): DataFrame =
    graft.operators.Repetition.ngramStats(docs(s, dir), col("doc_id"), col("text"), n = 2)
      .orderBy(col("doc_id"))

  private val q72Oracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS g
      |      FROM toks WHERE len(t) >= 2),
      |c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2),
      |a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams, MAX(c) AS top_n,
      |        CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_n
      |      FROM c GROUP BY 1),
      |top AS (SELECT doc_id, g AS top_gram FROM (
      |          SELECT doc_id, g,
      |            row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g DESC) AS rn
      |          FROM c)
      |        WHERE rn = 1)
      |SELECT d.doc_id, COALESCE(a.n_grams, 0) AS n_grams, top.top_gram,
      |  round(a.top_n / a.n_grams, 6) AS top_gram_frac,
      |  round(a.dup_n / a.n_grams, 6) AS dup_gram_frac
      |FROM documents d
      |LEFT JOIN a ON d.doc_id = a.doc_id
      |LEFT JOIN top ON d.doc_id = top.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ---- q73: deterministic corpus shuffle --------------------------------

  /** Replayable "random" training order: every doc's 1-based position in
    * seeded-hash order, assigned by
    * [[graft.operators.Sampling.deterministicShuffle]]'s two-phase
    * distributed rank (range buckets + per-bucket row_number + tiny
    * offset broadcast — never a single-reducer global window). The
    * oracle re-derives every position with a sequential `row_number()
    * OVER (ORDER BY hash, doc_id)` on the bit-identical hash.
    */
  def corpusShuffle(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.deterministicShuffle(
        docs(s, dir).select(col("doc_id")), col("doc_id"), seed = 7)
      .select(col("doc_id"), col("shuffle_pos"))
      .orderBy(col("shuffle_pos"))

  private val q73Oracle: String = {
    val h = TextFns.seededHashSql(7, "CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id,
       |  CAST(row_number() OVER (ORDER BY $h, doc_id) AS BIGINT) AS shuffle_pos
       |FROM documents ORDER BY shuffle_pos""".stripMargin
  }

  // ---- q78: shuffled-corpus export (shuffle ∘ clustered write) ---------

  /** The training-export materialization end-to-end: deterministic
    * corpus shuffle (q73's operator) written range-clustered on
    * `shuffle_pos` ([[graft.operators.Layout.writeClustered]] — the
    * files a trainer then reads SEQUENTIALLY in shuffle order, each
    * covering a disjoint position range) and read back from parquet.
    * Shares q73's oracle: a green run proves the write→read round-trip
    * preserves every (doc_id, shuffle_pos) assignment; file-range
    * disjointness itself is LayoutSpec's footer-verified contract.
    */
  def shuffledExport(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Layout, Sampling}
    val out = workDir("shuffled", dir)
    val shuffled = Sampling.deterministicShuffle(
        docs(s, dir).select(col("doc_id"), col("text")), col("doc_id"), seed = 7)
      .select(col("doc_id"), col("shuffle_pos"), col("text"))
    // writeClustered, not ensureClustered: the export WRITE is part of
    // what this query demonstrates (and times), and an _SUCCESS-gated
    // reuse would silently serve stale assignments if the corpus or
    // shuffle seed ever changed under the fixed tmp path (q62's reuse
    // is deliberate — amortized layout — this one must be fresh).
    Layout.writeClustered(shuffled, out, Seq("shuffle_pos"),
      numRanges = 8, maxRecordsPerFile = 100000L)
    s.read.parquet(out)
      .select(col("doc_id"), col("shuffle_pos"))
      .orderBy(col("shuffle_pos"))
  }

  // ---- q79: text normalization -----------------------------------------

  /** Canonicalization round-trip ([[TextFns.normalize]]): each document
    * is wrapped in realistic noise — leading tab+spaces, CASE flipped to
    * upper, trailing space+CRLF — and normalized back; `ok` proves the
    * result equals the canonical corpus text byte-for-byte in BOTH
    * engines (the normalization a dedup pass runs before content
    * hashing, where one stray \\r is a different md5).
    */
  def normalizeText(s: SparkSession, dir: String): DataFrame = {
    val raw = concat(lit("\t  "), upper(col("text")), lit(" \r\n "))
    docs(s, dir).select(
      col("doc_id"),
      (TextFns.normalize(raw) === col("text")).as("ok"),
      length(TextFns.normalize(raw)).cast("long").as("n_chars_norm"))
      .orderBy(col("doc_id"))
  }

  private val q79Oracle: String = {
    val rawSql = "chr(9) || '  ' || upper(text) || ' ' || chr(13) || chr(10) || ' '"
    s"""SELECT doc_id,
       |  ${TextFns.normalizeSql(rawSql)} = text AS ok,
       |  LENGTH(${TextFns.normalizeSql(rawSql)}) AS n_chars_norm
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---- q74: PII redaction ----------------------------------------------

  /** PII scrub over the corpus with injected identifying spans (the
    * documents table is synthetic prose with no PII, so each doc gets a
    * deterministic email + URL + long digit run appended — mirrored in
    * the oracle). [[graft.operators.Redaction.scrub]] applies the
    * default rules in order; the oracle replays the same sequential
    * regex passes in DuckDB, so counts AND the scrubbed text itself are
    * pinned byte-for-byte across the two regex engines.
    */
  def piiRedaction(s: SparkSession, dir: String): DataFrame = {
    val injected = docs(s, dir).select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or https://site"), col("doc_id").cast("string"),
        lit(".example/path id "),
        (col("doc_id").cast("long") * 123456789L).cast("string")).as("text"))
    graft.operators.Redaction.scrub(injected, col("text"))
      .select(col("doc_id"), col("n_email"), col("n_url"), col("n_number"), col("redacted"))
      .orderBy(col("doc_id"))
  }

  private val q74Oracle: String = {
    val rules = graft.operators.Redaction.DefaultRules
    val Seq(email, url, number) = rules.map(_.pattern)
    s"""WITH base AS (SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR)
       |         || '@example.com or https://site' || CAST(doc_id AS VARCHAR)
       |         || '.example/path id '
       |         || CAST(CAST(doc_id AS BIGINT) * 123456789 AS VARCHAR) AS t
       |  FROM documents),
       |r1 AS (SELECT doc_id,
       |         CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_email,
       |         regexp_replace(t, '$email', '<EMAIL>', 'g') AS t FROM base),
       |r2 AS (SELECT doc_id, n_email,
       |         CAST(len(regexp_extract_all(t, '$url')) AS BIGINT) AS n_url,
       |         regexp_replace(t, '$url', '<URL>', 'g') AS t FROM r1),
       |r3 AS (SELECT doc_id, n_email, n_url,
       |         CAST(len(regexp_extract_all(t, '$number')) AS BIGINT) AS n_number,
       |         regexp_replace(t, '$number', '<NUMBER>', 'g') AS t FROM r2)
       |SELECT doc_id, n_email, n_url, n_number, t AS redacted
       |FROM r3 ORDER BY doc_id""".stripMargin
  }

  // ---- q76: vocabulary build + OOV scoring -----------------------------

  private val MinDocFrac = 0.78

  /** Corpus-level OOV quality gate: the vocabulary is built from the
    * corpus itself (tokens in ≥ 78% of documents), then every document
    * is scored by the fraction of its token occurrences outside it —
    * [[graft.operators.Vocab]]. The oracle rebuilds the document-
    * frequency vocabulary and the per-doc join in SQL, so the whole
    * two-pass build→broadcast→score pipeline is value-pinned, boundary
    * tokens included (both engines evaluate the identical
    * `df >= 0.78 · n_docs` comparison).
    */
  def vocabOov(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Vocab
    val d = docs(s, dir)
    val vocab = Vocab.buildByDocFreq(d, col("doc_id"), col("text"), MinDocFrac)
    Vocab.oovStats(d, col("doc_id"), col("text"), vocab)
      .orderBy(col("doc_id"))
  }

  private val q76Oracle: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |dt AS (SELECT doc_id, unnest(list_distinct(t)) AS tok FROM toks),
       |dfreq AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |vocab AS (SELECT tok FROM dfreq, n
       |          WHERE df >= CAST($MinDocFrac AS DOUBLE) * n_docs),
       |alltok AS (SELECT doc_id, unnest(t) AS tok FROM toks)
       |SELECT a.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_tok,
       |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  round(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) / COUNT(*), 6) AS oov_frac
       |FROM alltok a LEFT JOIN vocab v ON a.tok = v.tok
       |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin

  // ---- q53: dedup clusters (connected components) ----------------------

  /** Near-dup pairs → dedup clusters: connected components over the
    * exact-Jaccard pair list (q22's machinery), reduced to per-component
    * canonical keeper + member count — the final step of a dedup
    * pipeline (keep `component`, purge the rest). The oracle recomputes
    * components as a recursive-CTE transitive closure over the same
    * pairs.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.nearDupPairs(docs(s, dir), col("doc_id"), col("text"), threshold = 0.8)
    Dedup.connectedComponents(pairs)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("component"))
  }

  private val q53Oracle: String =
    s"""WITH $shingleCtes,
       |nodes AS (SELECT doc_a AS n FROM exact UNION SELECT doc_b FROM exact),
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM exact
       |          UNION SELECT doc_b, doc_a FROM exact),
       |reach AS (
       |  WITH RECURSIVE r(src, dst) AS (
       |    SELECT n, n FROM nodes
       |    UNION
       |    SELECT r.src, e.v FROM r JOIN edges e ON e.u = r.dst)
       |  SELECT * FROM r),
       |cc AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY 1)
       |SELECT component, COUNT(*) AS n_members
       |FROM cc GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q86: deep-diameter clusters via star contraction ----------------

  /** Connected components on a HIGH-DIAMETER graph — 200-hop chains of
    * consecutive doc ids — via [[Dedup.connectedComponentsStar]]'s
    * alternating star contraction. Min-label propagation would need
    * ~200 shuffle rounds here (its default maxIter=20 throws); star
    * contraction converges in ~log² rounds. The oracle recomputes the
    * same components with a recursive-CTE transitive closure, so a
    * green row pins the contraction's labels on exactly the graph
    * shape the diameter-bound variant cannot handle.
    */
  def dedupClustersDeep(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"))
    val pairs = d.filter(col("doc_id") % 200 =!= 199)
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"))
      .join(d.select(col("doc_id").as("doc_b")), "doc_b") // endpoint must exist
    Dedup.connectedComponentsStar(pairs)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("component"))
  }

  private val q86Oracle: String =
    """WITH d AS (SELECT doc_id FROM documents),
      |e0 AS (SELECT a.doc_id AS u, a.doc_id + 1 AS v
      |       FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
      |       WHERE a.doc_id % 200 <> 199),
      |nodes AS (SELECT u AS n FROM e0 UNION SELECT v FROM e0),
      |edges AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
      |reach AS (
      |  WITH RECURSIVE r(src, dst) AS (
      |    SELECT n, n FROM nodes
      |    UNION
      |    SELECT r.src, e.v FROM r JOIN edges e ON e.u = r.dst)
      |  SELECT * FROM r),
      |cc AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY 1)
      |SELECT component, COUNT(*) AS n_members
      |FROM cc GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q77: quality-aware cluster purge --------------------------------

  /** [[Dedup.purgeNearDupsBy]] end-to-end: q22's near-dup pairs →
    * clusters → each cluster keeps its HIGHEST-quality member
    * (`n_chars` as the quality signal; ties break on greatest id) —
    * the curation-pipeline keep rule when a quality score exists,
    * versus q53's min-id canonical. Output: the surviving member of
    * every cluster with its score. The oracle re-derives clusters via
    * the recursive-CTE closure and the keeper via an ordered
    * row_number, so the per-cluster arg-max is value-pinned.
    */
  def qualityPurge(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.nearDupPairs(d, col("doc_id"), col("text"), threshold = 0.8)
      .select(col("doc_a"), col("doc_b"))
    // membership computed ONCE and shared by the purge and the pin —
    // the iterative propagation is the expensive part
    val members = Dedup.connectedComponents(pairs)
    val survivors = Dedup.purgeNearDupsByMembers(d, col("doc_id"), col("n_chars"), members)
    survivors.join(members, "doc_id")
      .select(col("component"), col("doc_id").as("keep_id"), col("n_chars"))
      .sortOnce(col("component"))
  }

  private val q77Oracle: String =
    s"""WITH $shingleCtes,
       |nodes AS (SELECT doc_a AS n FROM exact UNION SELECT doc_b FROM exact),
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM exact
       |          UNION SELECT doc_b, doc_a FROM exact),
       |reach AS (
       |  WITH RECURSIVE r(src, dst) AS (
       |    SELECT n, n FROM nodes
       |    UNION
       |    SELECT r.src, e.v FROM r JOIN edges e ON e.u = r.dst)
       |  SELECT * FROM r),
       |cc AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY 1),
       |scored AS (SELECT cc.doc_id, cc.component, d.n_chars
       |           FROM cc JOIN documents d ON d.doc_id = cc.doc_id)
       |SELECT component, doc_id AS keep_id, n_chars FROM (
       |  SELECT *, row_number() OVER (PARTITION BY component
       |                               ORDER BY n_chars DESC, doc_id DESC) AS rn
       |  FROM scored)
       |WHERE rn = 1 ORDER BY component""".stripMargin

  // ---- q49: salted skew join -------------------------------------------

  /** The skew-mitigation join through `Joins.saltedJoin` (left side
    * fanned over synthetic sub-keys, right side replicated `salts`×):
    * events ⋈ per-user dim. The salt must be result-invariant — the
    * oracle is the plain unsalted join, so a green run proves salting
    * changes the shuffle layout and nothing else.
    */
  def saltedUserJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events").select(col("user_id"), col("value"))
    val dim = Tables(s, dir, "events")
      .groupBy(col("user_id")).agg((min(col("event_id")) % 7).as("user_bucket"))
    graft.operators.Joins.saltedJoin(e, dim, "user_id", salts = 8)
      .groupBy(col("user_bucket"))
      .agg(graft.functions.ExactAgg.dsum(col("value")).as("sum_value"),
        count(lit(1)).as("n"))
      .orderBy(col("user_bucket"))
  }

  private val q49Oracle: String =
    """WITH dim AS (SELECT user_id, MIN(event_id) % 7 AS user_bucket FROM events GROUP BY user_id)
      |SELECT user_bucket,
      | CAST(SUM(CAST(e.value AS DECIMAL(38,2))) AS DOUBLE) AS sum_value,
      | COUNT(*) AS n
      |FROM events e JOIN dim USING (user_id)
      |GROUP BY user_bucket ORDER BY user_bucket""".stripMargin

  // ---- q39/q40: range join + as-of join --------------------------------

  /** Binned range join: ±0.1% price intervals around a sample of orders
    * against every order's price; per-interval match counts.
    */
  def rangeJoinCounts(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val intervals = orders.filter(col("o_orderkey") < 500)
      .select(col("o_orderkey").as("ival_key"),
        (col("o_totalprice") * 0.999).as("lo"),
        (col("o_totalprice") * 1.001).as("hi"))
    val points = orders.select(col("o_totalprice").as("price"))
    graft.operators.Joins.rangeJoin(points, col("price"), intervals, col("lo"), col("hi"),
      binSize = 1000.0)
      .groupBy(col("ival_key"))
      .agg(count(lit(1)).as("n_in_range"))
      .orderBy(col("ival_key"))
  }

  private val q39Oracle: String =
    """SELECT i.ival_key, COUNT(*) AS n_in_range
      |FROM (SELECT o_orderkey AS ival_key, o_totalprice * 0.999 AS lo, o_totalprice * 1.001 AS hi
      |      FROM orders WHERE o_orderkey < 500) i
      |JOIN orders p ON p.o_totalprice BETWEEN i.lo AND i.hi
      |GROUP BY i.ival_key ORDER BY i.ival_key""".stripMargin

  /** As-of join: each purchase paired with the user's most recent click
    * at-or-before the purchase instant. Oracle = DuckDB's native ASOF
    * LEFT JOIN.
    */
  def asofClicks(s: SparkSession, dir: String): DataFrame = {
    val events = Tables(s, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    graft.operators.Joins.asofJoin(purchases, clicks, key = "user_id",
      leftTs = "ts", rightTs = "ts", rightPayload = Seq("click_id"))
      .select(col("purchase_id"), col("user_id"), col("asof_click_id").as("click_id"))
      .orderBy(col("purchase_id"))
  }

  private val q40Oracle: String =
    """SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY purchase_id""".stripMargin

  // ---- q91: bloom-prefiltered incremental exact dedup ------------------

  /** Today's-crawl-vs-history at the no-history-shuffle scale: history =
    * the corpus; the new batch replants every 7th doc verbatim (true
    * duplicates the bloom must catch) and every 9th≡4 doc with fresh
    * content appended (genuinely new docs the bloom must not lose).
    * [[Dedup.bloomNewDocs]] prunes with the sketch, verifies positives
    * with two broadcast probes, and must return EXACTLY the plain
    * anti-join answer — which is what the oracle computes.
    */
  def bloomIncrement(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val newBatch = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000).as("new_id"), col("text"))
      .unionAll(d.filter(col("doc_id") % 9 === 4)
        .select((col("doc_id") + 3000000).as("new_id"),
          concat(col("text"), lit(" fresh crawl content")).as("text")))
    Dedup.bloomNewDocs(newBatch, d, col("text"),
        expectedItems = 100000, fpp = 0.01)
      .select(col("new_id"))
      .orderBy(col("new_id"))
  }

  private val q91Oracle: String =
    """WITH newbatch AS (
      |  SELECT doc_id + 2000000 AS new_id, text FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 3000000, text || ' fresh crawl content' FROM documents WHERE doc_id % 9 = 4)
      |SELECT new_id FROM newbatch
      |WHERE md5(text) NOT IN (SELECT md5(text) FROM documents)
      |ORDER BY new_id""".stripMargin

  // ---- q92: token-budget corpus selection ------------------------------

  private val SelectBudget = 5000L

  /** Best-documents-first curation cut: score docs by type-token ratio,
    * order quality-descending (doc_id tiebreak), and keep the maximal
    * prefix whose token total fits a 5000-token budget — the running
    * total coming from the two-phase prefix sum, never a single-reducer
    * window. The oracle replays the identical cut with a plain window
    * sum (total order ⇒ RANGE/ROWS frames agree).
    */
  def budgetSelect(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val scored = docs(s, dir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tok"),
      (size(array_distinct(toks)) / size(toks)).as("ttr"))
    graft.operators.Sampling.selectByTokenBudget(
        scored, struct((-col("ttr")).as("nttr"), col("doc_id")), col("n_tok"),
        budget = SelectBudget)
      .select(col("doc_id"), col("n_tok"), round(col("ttr"), 6).as("ttr"), col("cum_tok"))
      .orderBy(col("doc_id"))
  }

  private val q92Oracle: String =
    s"""WITH scored AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
       |         len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) AS ttr
       |  FROM documents),
       |cum AS (
       |  SELECT *, CAST(SUM(n_tok) OVER (ORDER BY ttr DESC, doc_id) AS BIGINT) AS cum_tok
       |  FROM scored)
       |SELECT doc_id, n_tok, round(ttr, 6) AS ttr, cum_tok FROM cum
       |WHERE cum_tok <= $SelectBudget ORDER BY doc_id""".stripMargin

  // ---- q93: self-calibrating balanced mixture --------------------------

  private val MixTarget = 12L

  /** Data mixing to a target: ~12 docs from EVERY source, the keep rate
    * derived in-plan from each source's own cardinality (q65's
    * stratified sampling needs the rates handed in). Selection stays
    * engine-exact through the rational-arithmetic membership rule
    * `hash·n < target·2^60` — no floating-point threshold to disagree
    * on — which the oracle replays in HUGEINT.
    */
  def balancedMix(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.balancedSample(
        docs(s, dir), col("source"), col("doc_id"),
        targetPerStratum = MixTarget, seed = 11)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("source"))

  private val q93Oracle: String = {
    val h = TextFns.seededHashSql(11, "CAST(doc_id AS VARCHAR)")
    s"""WITH n AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source)
       |SELECT source, COUNT(*) AS n_sampled
       |FROM documents JOIN n USING (source)
       |WHERE CAST($h AS HUGEINT) * n_src
       |      < CAST($MixTarget AS HUGEINT) * CAST(${graft.operators.Sampling.MaxHash} AS HUGEINT)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- q94: corpus-level boilerplate-line removal ----------------------

  private val BoilerMaxDocs = 50L

  /** C4-style cleanup: the corpus is re-rendered as multi-line pages
    * with injected chrome — every even doc gets a cookie banner, every
    * third doc a subscription prompt — and
    * [[graft.operators.Boilerplate.removeFrequentLines]] must strip
    * exactly the lines occurring in more than 50 distinct docs while
    * preserving content-line order. The oracle rebuilds the identical
    * pages and replays the frequency rule with a window-free
    * unnest + string_agg.
    */
  def boilerplate(s: SparkSession, dir: String): DataFrame = {
    val t = TextFns.tokens(col("text"))
    val pages = docs(s, dir).select(
      col("doc_id"),
      concat_ws("\n",
        array_join(slice(t, 1, 12), " "),
        when(col("doc_id") % 2 === 0, lit("accept all cookies to continue")),
        // guard the second content line explicitly: an out-of-range
        // slice is [] (→ '' line) in Spark but NULL (→ no line) in
        // DuckDB, so neither engine's default is portable
        when(size(t) >= 13, array_join(slice(t, 13, 12), " ")),
        when(col("doc_id") % 3 === 0, lit("subscribe to our newsletter"))).as("page"))
    graft.operators.Boilerplate.removeFrequentLines(
        pages, col("doc_id"), col("page"), maxDocs = BoilerMaxDocs)
      .orderBy(col("bp_id"))
  }

  private val q94Oracle: String =
    s"""WITH pages AS (
       |  SELECT doc_id AS bp_id,
       |    concat_ws(chr(10),
       |      array_to_string(t[1:12], ' '),
       |      CASE WHEN doc_id % 2 = 0 THEN 'accept all cookies to continue' END,
       |      CASE WHEN len(t) >= 13 THEN array_to_string(t[13:24], ' ') END,
       |      CASE WHEN doc_id % 3 = 0 THEN 'subscribe to our newsletter' END) AS page
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
       |lines AS (
       |  SELECT bp_id, unnest(range(1, len(ls) + 1)) AS pos, unnest(ls) AS line
       |  FROM (SELECT bp_id, string_split(page, chr(10)) AS ls FROM pages)),
       |bp AS (
       |  SELECT line FROM lines GROUP BY line
       |  HAVING COUNT(DISTINCT bp_id) > $BoilerMaxDocs),
       |tagged AS (
       |  SELECT l.bp_id, l.pos, l.line, (b.line IS NOT NULL) AS is_bp
       |  FROM lines l LEFT JOIN bp b USING (line))
       |SELECT bp_id,
       |  COALESCE(string_agg(CASE WHEN NOT is_bp THEN line END, chr(10) ORDER BY pos), '') AS clean_text,
       |  COUNT(*) AS n_lines,
       |  CAST(SUM(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
       |FROM tagged GROUP BY bp_id ORDER BY bp_id""".stripMargin

  // ---- q97: curation export, end-to-end --------------------------------

  /** The curation counterpart to q67's cleaning funnel, composing the
    * round-5 operators end-to-end: balanced source mixture (~8 docs per
    * source, rates self-calibrated) → quality scoring → token-budget cut
    * (best docs first until 4 000 tokens) → deterministic corpus shuffle
    * → range-clustered export on `shuffle_pos` → read back. Every stage
    * is engine-exact (rational mixture rule, window-free prefix sums,
    * seeded-hash shuffle order), so the oracle replays the WHOLE chain —
    * selection, cut, and every shuffle position — through the parquet
    * round-trip.
    */
  def curationExport(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Layout, Sampling}
    val out = workDir("curation", dir)
    val toks = TextFns.tokens(col("text"))
    val picked = Sampling.balancedSample(docs(s, dir), col("source"), col("doc_id"),
      targetPerStratum = 8, seed = 13)
    val scored = picked.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tok"),
      (size(array_distinct(toks)) / size(toks)).as("ttr"))
    val cut = Sampling.selectByTokenBudget(
      scored, struct((-col("ttr")).as("nttr"), col("doc_id")), col("n_tok"), budget = 4000)
    val shuffled = Sampling.deterministicShuffle(
      cut.select(col("doc_id"), col("n_tok"), col("cum_tok")), col("doc_id"),
      seed = 5, numRanges = 8)
    // fresh write on purpose (same reasoning as q78): a reused export
    // would silently serve stale positions if corpus or seeds changed
    Layout.writeClustered(shuffled, out, Seq("shuffle_pos"),
      numRanges = 4, maxRecordsPerFile = 100000L)
    s.read.parquet(out)
      .select(col("shuffle_pos"), col("doc_id"), col("n_tok"), col("cum_tok"))
      .orderBy(col("shuffle_pos"))
  }

  private val q97Oracle: String = {
    val hMix = TextFns.seededHashSql(13, "CAST(doc_id AS VARCHAR)")
    val hShuf = TextFns.seededHashSql(5, "CAST(doc_id AS VARCHAR)")
    s"""WITH picked AS (
       |  SELECT d.* FROM documents d
       |  JOIN (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source) n USING (source)
       |  WHERE CAST($hMix AS HUGEINT) * n_src
       |        < CAST(8 AS HUGEINT) * CAST(${graft.operators.Sampling.MaxHash} AS HUGEINT)),
       |scored AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
       |         len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) AS ttr
       |  FROM picked),
       |cum AS (
       |  SELECT *, CAST(SUM(n_tok) OVER (ORDER BY ttr DESC, doc_id) AS BIGINT) AS cum_tok
       |  FROM scored),
       |cut AS (SELECT * FROM cum WHERE cum_tok <= 4000)
       |SELECT CAST(row_number() OVER (ORDER BY $hShuf, doc_id) AS BIGINT) AS shuffle_pos,
       |       doc_id, n_tok, cum_tok
       |FROM cut ORDER BY shuffle_pos""".stripMargin
  }

  // ---- q98: symmetric-delete fuzzy vocabulary matching -----------------

  /** Typo clustering over the corpus vocabulary: distinct tokens plus
    * planted last-char-dropped typos of every token of length ≥ 5, then
    * [[Dedup.editDistOnePairs]] finds every pair at edit distance
    * exactly 1 through deletion-neighborhood equi-joins (never an
    * all-pairs product). The oracle brute-forces the same vocabulary
    * with DuckDB's `levenshtein` — both engines implement the classic
    * DP distance, so candidate-generation completeness is what a green
    * row proves.
    */
  def fuzzyVocab(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(explode(TextFns.distinctTokens(col("text"))).as("s"))
      .distinct()
    val vocab = toks.unionByName(
      toks.filter(length(col("s")) >= 5)
        .select(expr("substring(s, 1, length(s) - 1)").as("s")))
    graft.operators.Dedup.editDistOnePairs(vocab, col("s"))
      .orderBy(col("tok_a"), col("tok_b"))
  }

  private val q98Oracle: String =
    """WITH toks AS (
      |  SELECT DISTINCT unnest(string_split(text, ' ')) AS s FROM documents),
      |vocab AS (
      |  SELECT s FROM toks
      |  UNION
      |  SELECT substr(s, 1, len(s) - 1) FROM toks WHERE len(s) >= 5)
      |SELECT a.s AS tok_a, b.s AS tok_b, CAST(1 AS BIGINT) AS dist
      |FROM vocab a JOIN vocab b ON a.s < b.s AND levenshtein(a.s, b.s) = 1
      |ORDER BY tok_a, tok_b""".stripMargin

  // ---- q102: exact shared-span (substring) dedup -----------------------

  /** Span-level exact duplication across documents: every 9th≡2 doc is
    * replanted with its first 25 tokens plus a unique tail, so each
    * (original, plant) pair shares an exactly-25-token span (shorter
    * docs share their whole prefix) while random word-soup pairs can
    * collide on a 5-gram but essentially never sustain a 10-token run.
    * [[Dedup.sharedSpans]] must report exactly the qualifying pairs
    * with exact maximal span lengths; the oracle replays the full
    * construction — positional gram hashes, the maxDf stop-gram rule,
    * diagonals, gaps-and-islands — in DuckDB.
    */
  def sharedSpanDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val t = TextFns.tokens(col("text"))
    val planted = d.filter(col("doc_id") % 9 === 2)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(array_join(slice(t, 1, 25), " "),
          lit(" unique tail marker "), col("doc_id").cast("string")).as("text"))
    Dedup.sharedSpans(d.unionAll(planted), col("doc_id"), col("text"),
        n = 5, minTokens = 10, maxDf = 1000)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val q102Oracle: String = {
    val gramHash = TextFns.hash60Sql("array_to_string(t[i+1:i+5], ' ')")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 500000,
       |         array_to_string(t[1:25], ' ') || ' unique tail marker ' || CAST(doc_id AS VARCHAR)
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
       |  WHERE doc_id % 9 = 2),
       |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
       |grams AS (
       |  SELECT doc_id, unnest(range(0, len(t) - 4)) AS pos,
       |         unnest([$gramHash for i in range(0, len(t) - 4)]) AS h
       |  FROM toks WHERE len(t) >= 5),
       |keep AS (SELECT h FROM grams GROUP BY h HAVING COUNT(*) <= 1000),
       |g2 AS (SELECT doc_id, pos, h FROM grams JOIN keep USING (h)),
       |m AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
       |         a.pos - b.pos AS diag
       |  FROM g2 a JOIN g2 b ON a.h = b.h AND a.doc_id < b.doc_id),
       |isl AS (
       |  SELECT doc_a, doc_b, diag, pa,
       |         pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS island
       |  FROM m),
       |sp AS (
       |  SELECT doc_a, doc_b, CAST(COUNT(*) + 4 AS BIGINT) AS span_tokens
       |  FROM isl GROUP BY doc_a, doc_b, diag, island
       |  HAVING COUNT(*) + 4 >= 10)
       |SELECT doc_a, doc_b, CAST(MAX(span_tokens) AS BIGINT) AS max_span,
       |       COUNT(*) AS n_spans
       |FROM sp GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---- q106: shared-span EXCISION --------------------------------------

  /** q102's curation ACTION: the same planted corpus, but instead of
    * reporting shared spans, [[Dedup.removeSharedSpans]] excises every
    * qualifying span from the higher-id doc of each pair (keep-earliest)
    * and reassembles the survivors order-preserving. The oracle replays
    * q102's whole span ledger in DuckDB, converts each island to the
    * loser-side token interval, anti-filters positions, and rebuilds
    * every document's text byte-for-byte — fingerprint plus length, so
    * an off-by-one at either span edge or a dropped/duplicated token
    * anywhere in any doc flips the row.
    */
  def spanExcision(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val t = TextFns.tokens(col("text"))
    val planted = d.filter(col("doc_id") % 9 === 2)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(array_join(slice(t, 1, 25), " "),
          lit(" unique tail marker "), col("doc_id").cast("string")).as("text"))
    Dedup.removeSharedSpans(d.unionAll(planted), col("doc_id"), col("text"),
        n = 5, minTokens = 10, maxDf = 1000)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        md5(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  private val q106Oracle: String = {
    val gramHash = TextFns.hash60Sql("array_to_string(t[i+1:i+5], ' ')")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 500000,
       |         array_to_string(t[1:25], ' ') || ' unique tail marker ' || CAST(doc_id AS VARCHAR)
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
       |  WHERE doc_id % 9 = 2),
       |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
       |grams AS (
       |  SELECT doc_id, unnest(range(0, len(t) - 4)) AS pos,
       |         unnest([$gramHash for i in range(0, len(t) - 4)]) AS h
       |  FROM toks WHERE len(t) >= 5),
       |keep AS (SELECT h FROM grams GROUP BY h HAVING COUNT(*) <= 1000),
       |g2 AS (SELECT doc_id, pos, h FROM grams JOIN keep USING (h)),
       |m AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
       |         a.pos - b.pos AS diag
       |  FROM g2 a JOIN g2 b ON a.h = b.h AND a.doc_id < b.doc_id),
       |isl AS (
       |  SELECT doc_a, doc_b, diag, pa,
       |         pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS island
       |  FROM m),
       |sp2 AS (
       |  SELECT doc_b AS doc_id, MIN(pa) - diag AS s,
       |         MIN(pa) - diag + COUNT(*) + 4 - 1 AS e
       |  FROM isl GROUP BY doc_a, doc_b, diag, island
       |  HAVING COUNT(*) + 4 >= 10),
       |tk AS (SELECT doc_id, unnest(range(0, len(t))) AS pos, unnest(t) AS tok FROM toks),
       |kept AS (
       |  SELECT tk.doc_id, tk.pos, tk.tok FROM tk
       |  WHERE NOT EXISTS (SELECT 1 FROM sp2
       |                    WHERE sp2.doc_id = tk.doc_id AND tk.pos BETWEEN sp2.s AND sp2.e)),
       |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS sa
       |        FROM kept GROUP BY doc_id)
       |SELECT c.doc_id, CAST(LENGTH(COALESCE(a.sa, '')) AS BIGINT) AS n_chars,
       |       md5(COALESCE(a.sa, '')) AS fp
       |FROM corpus c LEFT JOIN agg a USING (doc_id)
       |ORDER BY c.doc_id""".stripMargin
  }

  // ---- q101: mixture-recipe sampling (per-stratum targets) -------------

  /** The mixture-recipe form of q93: explicit per-source targets (src0
    * capped hard at 3, src1 oversubscribed at 1 000 000 → kept whole,
    * src2 excluded with target 0, every other source at the default 6),
    * rates derived in-plan and membership decided by the exact rational
    * rule. The oracle replays the identical CASE-table in HUGEINT.
    */
  def mixtureRecipe(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.balancedSampleTargets(
        docs(s, dir), col("source"), col("doc_id"),
        targets = Map("src0" -> 3L, "src1" -> 1000000L, "src2" -> 0L),
        defaultTarget = 6L, seed = 17)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("source"))

  private val q101Oracle: String = {
    val h = TextFns.seededHashSql(17, "CAST(doc_id AS VARCHAR)")
    val max = graft.operators.Sampling.MaxHash
    s"""WITH n AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source)
       |SELECT source, COUNT(*) AS n_sampled
       |FROM documents JOIN n USING (source)
       |WHERE CAST($h AS HUGEINT) * n_src <
       |  CAST(CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 1000000
       |       WHEN 'src2' THEN 0 ELSE 6 END AS HUGEINT) * CAST($max AS HUGEINT)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- q100: trie tokenizer, driver-pinned -----------------------------

  /** The production subword tokenizer gets DRIVER-VISIBLE evidence (its
    * equivalence to the HOF form was spec-only until now): greedy
    * longest-match segmentation of every document against a fixed
    * 21-piece vocabulary through the codegen'd [[graft.catalyst
    * .TrieTokenize]] trie walk, words longer than 6 chars passing
    * through whole. The oracle re-implements greedy longest-match as a
    * DuckDB RECURSIVE CTE (per word: the longest vocab piece prefixing
    * the remainder, single-char fallback) and fingerprints the full
    * piece sequence — a green row pins every piece boundary of every
    * word of every doc.
    */
  private val TrieVocab = Seq(
    "table", "tab", "le", "scan", "sc", "an", "row", "val", "value",
    "batch", "bat", "ch", "win", "dow", "window", "stream", "str", "eam",
    "er", "key", "ey")
  private val TrieMaxWord = 6

  def trieTokens(s: SparkSession, dir: String): DataFrame = {
    val pieces = graft.catalyst.TrieTokenize(col("text"), TrieVocab, TrieMaxWord)
    docs(s, dir).select(
        col("doc_id"),
        size(pieces).cast("long").as("n_pieces"),
        md5(array_join(pieces, "|")).as("fp"))
      .orderBy(col("doc_id"))
  }

  private val q100Oracle: String = {
    val vocabValues = TrieVocab.map(v => s"('$v')").mkString(",")
    s"""WITH RECURSIVE
       |vocab(v) AS (SELECT * FROM (VALUES $vocabValues) t(v)),
       |words AS (
       |  SELECT doc_id, unnest(range(1, len(ws) + 1)) AS w_ord, unnest(ws) AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |seg AS (
       |  SELECT doc_id, w_ord, w, 1 AS pos, '' AS tok, 0 AS step
       |  FROM words WHERE len(w) > 0 AND len(w) <= $TrieMaxWord
       |  UNION ALL
       |  SELECT doc_id, w_ord, w, pos + len(tok2), tok2, step + 1
       |  FROM (
       |    SELECT doc_id, w_ord, w, pos, step,
       |      COALESCE((SELECT v FROM vocab WHERE v = substr(w, pos, len(v))
       |                ORDER BY len(v) DESC LIMIT 1),
       |               substr(w, pos, 1)) AS tok2
       |    FROM seg WHERE pos <= len(w)) t),
       |pieces AS (
       |  SELECT doc_id, w_ord, step, tok FROM seg WHERE step >= 1
       |  UNION ALL
       |  SELECT doc_id, w_ord, 1 AS step, w AS tok FROM words WHERE len(w) > $TrieMaxWord)
       |SELECT d.doc_id, COUNT(p.doc_id) AS n_pieces,
       |       md5(COALESCE(string_agg(p.tok, '|' ORDER BY p.w_ord, p.step), '')) AS fp
       |FROM documents d LEFT JOIN pieces p USING (doc_id)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }

  // ---- q104: BPE merge-rank tokenizer, driver-pinned -------------------

  /** The second production tokenizer shape gets the q100 treatment: BPE
    * merge-rank segmentation ([[graft.catalyst.BpeTokenize]] behind the
    * `Tokenizer` seam) of every document against a fixed creation-
    * ordered 23-merge table — each word explodes to single characters,
    * then the lowest-ranked adjacent pair merges (leftmost occurrence)
    * until no pair is ranked. The oracle replays the merge loop as a
    * DuckDB RECURSIVE CTE over piece LISTS — per step it finds the
    * lowest-ranked pair present (correlated subquery over the rank
    * VALUES), merges it at its leftmost position with list slices, and
    * stops at the fixed point — then fingerprints the full piece
    * sequence, anchored on ALL documents (q100's totality lesson). A
    * green row pins every merge decision of every word of every doc.
    */
  private val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "a", "ta" -> "b", "l" -> "e", "tab" -> "le", "s" -> "c",
    "sc" -> "a", "sca" -> "n", "e" -> "r", "i" -> "n", "in" -> "d",
    "w" -> "ind", "o" -> "w", "wind" -> "ow", "a" -> "l", "v" -> "al",
    "u" -> "e", "val" -> "ue", "s" -> "t", "st" -> "r", "r" -> "e",
    "a" -> "m", "e" -> "am", "str" -> "eam")
  private val BpeMaxWord = 12

  def bpeTokens(s: SparkSession, dir: String): DataFrame = {
    val bpe = graft.functions.Tokenizer.MergeRank(BpeMerges, BpeMaxWord)
    val pieces = bpe.tokenize(col("text"))
    docs(s, dir).select(
        col("doc_id"),
        size(pieces).cast("long").as("n_pieces"),
        md5(array_join(pieces, "|")).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** The WITH RECURSIVE body replaying [[graft.functions.Tokenizer
    * .MergeRank]] word-by-word in DuckDB, up through `allw` (one row
    * per word with its final piece list) — shared by q104 (per-doc
    * pieces) and q123 (per-language fertility) so the BPE replay can
    * never fork between them. */
  private lazy val bpeReplayCtes: String = {
    val rankValues = BpeMerges.zipWithIndex
      .map { case ((a, b), i) => s"('$a|$b', $i)" }.mkString(",")
    s"""ranks(pair, rnk) AS (SELECT * FROM (VALUES $rankValues) t(pair, rnk)),
       |words AS (
       |  SELECT doc_id, unnest(range(1, len(ws) + 1)) AS w_ord, unnest(ws) AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |init AS (
       |  SELECT doc_id, w_ord, list_transform(range(1, len(w) + 1), i -> w[i]) AS p
       |  FROM words WHERE len(w) > 0 AND len(w) <= $BpeMaxWord),
       |seg AS (
       |  SELECT doc_id, w_ord, p, 0 AS step FROM init
       |  UNION ALL
       |  SELECT doc_id, w_ord,
       |    COALESCE(p[1:bi-1], []) || [p[bi] || p[bi+1]] || COALESCE(p[bi+2:], []) AS p,
       |    step + 1
       |  FROM (
       |    SELECT doc_id, w_ord, p, step,
       |      list_position(pr,
       |        (SELECT r.pair FROM ranks r WHERE list_contains(pr, r.pair)
       |         ORDER BY r.rnk LIMIT 1)) AS bi
       |    FROM (SELECT doc_id, w_ord, p, step,
       |            list_transform(range(1, len(p)), i -> p[i] || '|' || p[i+1]) AS pr
       |          FROM seg) t) u
       |  WHERE bi IS NOT NULL),
       |fin AS (
       |  SELECT doc_id, w_ord, p FROM seg s
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM ranks r WHERE list_contains(
       |      list_transform(range(1, len(s.p)), i -> s.p[i] || '|' || s.p[i+1]), r.pair))),
       |allw AS (
       |  SELECT doc_id, w_ord, p FROM fin
       |  UNION ALL
       |  SELECT doc_id, w_ord, [w] AS p FROM words WHERE len(w) > $BpeMaxWord)""".stripMargin
  }

  private val q104Oracle: String =
    s"""WITH RECURSIVE
       |$bpeReplayCtes
       |SELECT d.doc_id, CAST(COALESCE(SUM(len(p)), 0) AS BIGINT) AS n_pieces,
       |       md5(COALESCE(string_agg(array_to_string(p, '|'), '|' ORDER BY w_ord), ''))
       |         AS fp
       |FROM documents d LEFT JOIN allw USING (doc_id)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  // ---- q160: BPE trainer, driver-pinned ---------------------------------

  /** The one-job BPE TRAINER ([[graft.functions.Tokenizer
    * .learnMergesBatched]], VERDICT r7 #5's fix) graduates from
    * spec-pinned to oracle-pinned (VERDICT r8 #3): its learned
    * (rank, a, b) merge table over the documents corpus is emitted and
    * the oracle REPLAYS TRAINING ITSELF in DuckDB — q104 replays merge
    * INFERENCE under a fixed table; this replays merge SELECTION. Per
    * step k: weighted adjacent-pair counts over the current vocabulary
    * segmentation (per-position, overlaps included), argmax under the
    * exact rule (count desc, then UTF-8-binary a, b — DuckDB's memcmp
    * string order ≡ Spark's UTF8String order), `minPairCount`
    * exhaustion, then a recursive CTE merges the adopted pair
    * leftmost-first to the fixed point (one occurrence per recursion
    * step — equivalent to the trainer's single-pass non-overlapping
    * merge, since a merged piece can never recreate its own left
    * element). A green row pins every selection decision of every
    * training step; drift between the batched trainer and these
    * semantics — the risk VERDICT r8 #3 names — turns the row red.
    */
  private val BpeTrainSteps = 10
  private val BpeTrainMaxWord = 12

  def bpeTrainer(s: SparkSession, dir: String): DataFrame = {
    val merges = graft.functions.Tokenizer.learnMergesBatched(
      docs(s, dir), col("text"),
      numMerges = BpeTrainSteps, maxWordChars = BpeTrainMaxWord, minPairCount = 2L)
    import s.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("rank", "a", "b")
      .orderBy(col("rank"))
  }

  private val q160Oracle: String = {
    val mw = BpeTrainMaxWord
    val steps = (1 to BpeTrainSteps).map { k =>
      val prev = s"seg${k - 1}"
      s"""cnt$k AS MATERIALIZED (
         |  SELECT p[i] AS a, p[i + 1] AS b, CAST(SUM(n) AS BIGINT) AS c
         |  FROM (SELECT n, p, unnest(range(1, len(p))) AS i FROM $prev)
         |  GROUP BY 1, 2),
         |best$k AS MATERIALIZED (SELECT a, b FROM cnt$k WHERE c >= 2 ORDER BY c DESC, a, b LIMIT 1),
         |app$k AS (
         |  SELECT w, n, p FROM $prev
         |  UNION ALL
         |  SELECT w, n,
         |    COALESCE(p[1:bi-1], []) || [p[bi] || p[bi+1]] || COALESCE(p[bi+2:], []) AS p
         |  FROM (
         |    SELECT w, n, p, list_position(
         |        list_transform(range(1, len(p)), i -> p[i] || '|' || p[i+1]),
         |        (SELECT a || '|' || b FROM best$k)) AS bi
         |    FROM app$k) u
         |  WHERE bi > 0),
         |seg$k AS MATERIALIZED (
         |  SELECT w, n, p FROM app$k s
         |  WHERE NOT EXISTS (SELECT 1 FROM best$k r WHERE list_contains(
         |    list_transform(range(1, len(s.p)), i -> s.p[i] || '|' || s.p[i+1]),
         |    r.a || '|' || r.b)))""".stripMargin
    }.mkString(",\n")
    val ranks = (1 to BpeTrainSteps)
      .map(k => s"SELECT CAST(${k - 1} AS BIGINT) AS rank, a, b FROM best$k")
      .mkString("\n  UNION ALL ")
    s"""WITH RECURSIVE
       |words AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY w),
       |seg0 AS MATERIALIZED (
       |  SELECT w, n, list_transform(range(1, len(w) + 1), i -> w[i]) AS p
       |  FROM words WHERE len(w) <= $mw AND len(w) >= 2),
       |$steps
       |SELECT rank, a, b FROM (
       |  $ranks)
       |ORDER BY rank""".stripMargin
  }

  // ---- q308/q311: unigram-LM tokenizer trainer + segmentation ----------

  /** q308: unigram-LM (SentencePiece-style) tokenizer TRAINING
    * ([[graft.functions.Tokenizer.learnUnigramLm]]) — the third
    * production trainer family pinned end-to-end, after trie inference
    * (q100) and BPE training (q160). Hard-EM with integer-exact
    * ilog2 scoring (the q108 fixed-point idiom): seed = all ≤4-char
    * substrings of the vocabulary, then per round a Viterbi
    * re-segmentation of every vocabulary word under
    * cost = ilog2(total) − ilog2(cnt) (unique optimum via the
    * (cost, #pieces, UTF-8 piece list) lexicographic order), piece
    * re-count, and prune-except-single-chars. One corpus-sized job
    * (word frequency) + a Zipf-bounded driver replay — the
    * learnMergesBatched scale shape. The oracle REPLAYS TRAINING
    * ITSELF in DuckDB: seeding, both EM rounds (each a recursive-CTE
    * Viterbi DP over the vocabulary carrying the full DP state list),
    * pruning, and the final scoring — a green row pins every EM
    * decision of every round.
    */
  private val UniMaxPiece = 4
  private val UniMaxWord = 12
  private val UniRounds = 2

  private def unigramModel(s: SparkSession, dir: String) =
    graft.functions.Tokenizer.learnUnigramLm(docs(s, dir), col("text"),
      maxPieceLen = UniMaxPiece, maxWordChars = UniMaxWord, rounds = UniRounds)

  def unigramTrainer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    unigramModel(s, dir).pieces.toDF("piece", "cnt", "cost")
      .orderBy(col("piece"))
  }

  /** The training-replay CTE chain shared by q308 (learned table) and
    * q311 (per-doc segmentation) so the EM semantics can never fork
    * between them: words → seed costs → per-round (edges → recursive
    * Viterbi DP → segmentation → counts → prune → costs). Ends with
    * `tbl$UniRounds` / `tot$UniRounds` / `cost$UniRounds` and a
    * `seg${UniRounds + 1}` serving segmentation under the final costs.
    */
  private lazy val unigramReplayCtes: String = {
    def dpBlock(it: Int, costCte: String) =
      s"""edges$it AS MATERIALIZED (
         |  SELECT w, n, list(struct_pack(i := s.i, l := s.l, p := s.sub, c := c.c)) AS es
         |  FROM (
         |    SELECT w, n, i, l, substr(w, i, l) AS sub
         |    FROM words, LATERAL (SELECT unnest(range(1, len(w)+1)) AS i),
         |         LATERAL (SELECT unnest(range(1, ${UniMaxPiece + 1})) AS l)
         |    WHERE i + l - 1 <= len(w)) s
         |  JOIN $costCte c ON s.sub = c.p
         |  GROUP BY w, n),
         |dp$it AS (
         |  SELECT w, n, es, 0 AS j,
         |    [struct_pack(c := CAST(0 AS BIGINT), k := CAST(0 AS BIGINT),
         |                 ps := CAST([] AS VARCHAR[]))] AS best
         |  FROM edges$it
         |  UNION ALL
         |  SELECT w, n, es, j + 1,
         |    best || [ (list_sort(list_transform(
         |        list_filter(es, e -> e.i + e.l = j + 2),
         |        e -> struct_pack(c := best[e.i].c + e.c, k := best[e.i].k + 1,
         |                         ps := best[e.i].ps || [e.p]))))[1] ]
         |  FROM dp$it WHERE j < len(w)),
         |seg$it AS MATERIALIZED (
         |  SELECT w, n, best[len(w)+1].ps AS ps FROM dp$it WHERE j = len(w))""".stripMargin
    def tableBlock(it: Int) =
      s"""cnts$it AS (
         |  SELECT p, CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM (SELECT n, unnest(ps) AS p FROM seg$it) GROUP BY p),
         |tbl$it AS MATERIALIZED (
         |  SELECT p, cnt FROM cnts$it
         |  UNION ALL
         |  SELECT c.p, CAST(0 AS BIGINT) FROM chars c ANTI JOIN cnts$it k ON c.p = k.p),
         |tot$it AS (SELECT SUM(cnt) AS t FROM tbl$it),
         |cost$it AS MATERIALIZED (
         |  SELECT p, (len(bin(t)) - 1)
         |    - (CASE WHEN cnt >= 1 THEN len(bin(cnt)) - 1 ELSE -1 END) AS c
         |  FROM tbl$it, tot$it)""".stripMargin
    val blocks = Seq(
      s"""words AS MATERIALIZED (
         |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE len(w) > 0 AND len(w) <= $UniMaxWord GROUP BY w)""".stripMargin,
      s"""chars AS MATERIALIZED (
         |  SELECT DISTINCT substr(w, i, 1) AS p
         |  FROM words, LATERAL (SELECT unnest(range(1, len(w)+1)) AS i)),
         |seed AS (
         |  SELECT substr(w, i, l) AS p, CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM words, LATERAL (SELECT unnest(range(1, len(w)+1)) AS i),
         |       LATERAL (SELECT unnest(range(1, ${UniMaxPiece + 1})) AS l)
         |  WHERE i + l - 1 <= len(w) GROUP BY 1),
         |tot0 AS (SELECT SUM(cnt) AS t FROM seed),
         |cost0 AS MATERIALIZED (
         |  SELECT p, (len(bin(t)) - 1) - (len(bin(cnt)) - 1) AS c
         |  FROM seed, tot0)""".stripMargin) ++
      (1 to UniRounds).flatMap(it => Seq(dpBlock(it, s"cost${it - 1}"), tableBlock(it))) ++
      Seq(dpBlock(UniRounds + 1, s"cost$UniRounds"))
    blocks.mkString(",\n")
  }

  private lazy val q308Oracle: String =
    s"""WITH RECURSIVE
       |$unigramReplayCtes
       |SELECT p AS piece, cnt,
       |  (SELECT len(bin(t)) - 1 FROM tot$UniRounds)
       |    - (CASE WHEN cnt >= 1 THEN len(bin(cnt)) - 1 ELSE -1 END) AS cost
       |FROM tbl$UniRounds ORDER BY piece""".stripMargin

  /** q311: per-document segmentation UNDER the q308-learned unigram
    * table — the inference leg (q104's role for the BPE family):
    * every document's words segment by the model's final Viterbi
    * (memoized per UNIQUE vocabulary word and served through a
    * broadcast word→pieces join — the Zipf-bounded serving shape; the
    * corpus never re-runs the DP), words over the char cap pass
    * through whole, and the per-doc piece stream fingerprints exactly
    * like q104 (totality anchored on ALL documents). A green row pins
    * the serving segmentation of every word of every doc against the
    * oracle's independent DP replay.
    */
  def unigramSegment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wp = unigramModel(s, dir).wordPieces.toDF("w", "ps")
    val d = docs(s, dir)
    val words = d
      .select(col("doc_id"),
        posexplode(graft.functions.TextFns.tokens(col("text"))).as(Seq("w_ord", "w")))
      .filter(length(col("w")) > 0)
    // chars-fallback keeps the join total even under a maxVocabWords
    // cap (unreached at pinned scales: the collected vocab is complete)
    val fallback = when(length(col("w")) > UniMaxWord, array(col("w")))
      .otherwise(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))))
    val perDoc = words
      .join(broadcast(wp), Seq("w"), "left")
      .select(col("doc_id"), col("w_ord"), coalesce(col("ps"), fallback).as("ps"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("w_ord"), col("ps")))).as("wps"))
      .select(col("doc_id"),
        flatten(transform(col("wps"), x => x.getField("ps"))).as("flat"))
    d.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(size(col("flat")), lit(0)).cast("long").as("n_pieces"),
        md5(coalesce(array_join(col("flat"), "|"), lit(""))).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** Per-doc word explode + serving-segmentation CTEs shared by q311
    * (fingerprints) and q315 (packing under piece counts) — one
    * definition so the serving semantics (vocab join + over-cap
    * pass-through) can never fork between the two oracles. */
  private lazy val unigramDocWordCtes: String =
    s"""dwords AS (
       |  SELECT doc_id, unnest(range(1, len(ws) + 1)) AS w_ord, unnest(ws) AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |allw AS (
       |  SELECT d.doc_id, d.w_ord, s.ps
       |  FROM dwords d JOIN seg${UniRounds + 1} s USING (w)
       |  UNION ALL
       |  SELECT doc_id, w_ord, [w] AS ps FROM dwords WHERE len(w) > $UniMaxWord)""".stripMargin

  private lazy val q311Oracle: String =
    s"""WITH RECURSIVE
       |$unigramReplayCtes,
       |$unigramDocWordCtes
       |SELECT d.doc_id, CAST(COALESCE(SUM(len(ps)), 0) AS BIGINT) AS n_pieces,
       |       md5(COALESCE(string_agg(array_to_string(ps, '|'), '|' ORDER BY w_ord), ''))
       |         AS fp
       |FROM documents d LEFT JOIN allw USING (doc_id)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** q315: sequence packing UNDER THE UNIGRAM TOKENIZER — the seam
    * payoff VERDICT r15 #4 asked for: [[graft.functions.Tokenizer
    * .UnigramLm]] now sits behind the same `Tokenizer` trait as
    * `MergeRank`/`LongestMatch`, so the q69 packing operator runs
    * under unigram PIECE counts by swapping the tokenizer — zero
    * packing-code change. Serving is the memoized word→pieces table
    * inside a custom expression ([[graft.catalyst.UnigramSegment]],
    * O(1)/word at any vocab size); the oracle replays EM training,
    * the serving segmentation, AND the q69 running-sum packing
    * arithmetic end-to-end — a green row pins the whole
    * train→serve→pack chain under one statement.
    */
  def unigramPacking(s: SparkSession, dir: String): DataFrame = {
    val tok = graft.functions.Tokenizer.UnigramLm(unigramModel(s, dir))
    graft.operators.Packing.packOffsets(
        docs(s, dir), col("doc_id"), size(tok.tokenize(col("text"))),
        budget = UniPackBudget)
      .orderBy(col("pack_id"))
  }

  private val UniPackBudget = 512L

  private lazy val q315Oracle: String = {
    // mirrors packOffsets' zero-token anchor rule (see q69's oracle)
    val anchor =
      s"CASE WHEN n_tok = 0 THEN GREATEST(end_off - 1, 0) ELSE end_off - n_tok END"
    s"""WITH RECURSIVE
       |$unigramReplayCtes,
       |$unigramDocWordCtes,
       |npc AS (SELECT d.doc_id, CAST(COALESCE(SUM(len(ps)), 0) AS BIGINT) AS n_tok
       |        FROM documents d LEFT JOIN allw USING (doc_id) GROUP BY d.doc_id),
       |c AS (SELECT doc_id AS pack_id, n_tok,
       |        CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       |             AS BIGINT) AS end_off
       |      FROM npc),
       |o AS (SELECT pack_id, n_tok, end_off - n_tok AS start_off, end_off,
       |        CAST(FLOOR(($anchor) / $UniPackBudget) AS BIGINT) AS first_seq,
       |        GREATEST(CAST(FLOOR(($anchor) / $UniPackBudget) AS BIGINT),
       |                 CAST(FLOOR((end_off - 1) / $UniPackBudget) AS BIGINT)) AS last_seq
       |      FROM c)
       |SELECT pack_id, n_tok, start_off, end_off, first_seq, last_seq,
       |       first_seq <> last_seq AS split
       |FROM o ORDER BY pack_id""".stripMargin
  }

  // ---- q165: fixed-point PageRank ---------------------------------------

  /** Link-graph PageRank — the page-importance signal web-corpus
    * curation ranks crawl frontiers and quality priors with (the
    * harmonic-centrality/PageRank family CommonCrawl publishes): five
    * power iterations over a deterministic synthetic 3-out-regular
    * graph on the documents table (edges u → (31u + 17j) mod N,
    * j ∈ 0..2 — multi-edges kept, no dangling nodes by construction).
    * ALL arithmetic is integer fixed-point (total mass 10¹² units,
    * damping 85/100, every division an integer floor): a float
    * PageRank's low bits depend on the aggregation tree shape, this
    * one is partitioning- and engine-exact. The Spark shape is the
    * Lloyd's-iteration discipline: per iteration ONE edge-key join +
    * ONE dst-key aggregation (both map-side combinable), ranks
    * localCheckpointed so the plan never grows; control flow on the
    * driver, data flow distributed — at 100 TB the same loop runs with
    * edges pre-bucketed on src (q47) so the join never reshuffles the
    * edge table.
    */
  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id")).localCheckpoint(false)
    val n = d.count() // graph order: one bounded driver scalar
    val mass = 1000000000000L
    val init = mass / n
    val base = init * 15 / 100
    def idiv(a: Column, b: Long) = call_function("div", a, lit(b))
    val edges = d.select(col("doc_id").as("src"),
        explode(array((0 to 2).map(j =>
          (col("doc_id") * 31 + lit(j * 17)) % n): _*)).as("dst"))
      .localCheckpoint(false)
    var ranks = d.select(col("doc_id"), lit(init).as("r"))
    for (_ <- 1 to 5) {
      val contrib = edges
        .join(ranks.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst"), idiv(col("r"), 3L).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      ranks = d
        .join(contrib.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(base) + idiv(coalesce(col("in_sum"), lit(0L)) * 85, 100L)).as("r"))
        .localCheckpoint(false)
    }
    ranks.orderBy(col("doc_id"))
  }

  private val q165Oracle: String = {
    val mass = 1000000000000L
    val iters = (1 to 5).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT d.doc_id,
         |    (SELECT (($mass // n.n) * 15) // 100 FROM n)
         |      + (COALESCE(c.in_sum, 0) * 85) // 100 AS r
         |  FROM documents d LEFT JOIN (
         |    SELECT e.dst, SUM(p.r // 3) AS in_sum
         |    FROM e JOIN r${i - 1} p ON p.doc_id = e.src GROUP BY e.dst) c
         |  ON c.dst = d.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH n AS MATERIALIZED (SELECT COUNT(*) AS n FROM documents),
       |e AS MATERIALIZED (
       |  SELECT doc_id AS src, (doc_id * 31 + j * 17) % (SELECT n FROM n) AS dst
       |  FROM documents, (SELECT unnest(range(0, 3)) AS j)),
       |r0 AS MATERIALIZED (
       |  SELECT doc_id, $mass // (SELECT n FROM n) AS r FROM documents),
       |$iters
       |SELECT doc_id, CAST(r AS BIGINT) AS r FROM r5 ORDER BY doc_id""".stripMargin
  }

  // ---- q170: PMI collocation mining --------------------------------------

  /** Pointwise-mutual-information collocations — the phrase/multi-word-
    * expression miner vocabulary curation runs before merging tokens
    * (collocations with high PMI become tokenizer merge candidates and
    * stop-phrase lists): score(a,b) = 1024·log2(c_ab·N / (c_a·c_b)) in
    * the repo's integer fixed-point log2 (each factor's L taken
    * separately — no product overflow to ~8·10^15 tokens), over
    * adjacent-bigram occurrences with a min-support floor, top-20 by
    * (score desc, a, b). Shape: one bigram-key aggregate + one
    * unigram-key aggregate; the unigram table is vocabulary-sized and
    * broadcasts back twice (cap discipline as in [[graft.operators
    * .Drift.unigramKl]] if a corpus defeats Zipf); top-k is a
    * TakeOrdered, never a global sort.
    */
  def pmiCollocations(s: SparkSession, dir: String): DataFrame = {
    def lfp(x: Column): Column = {
      val e = (length(bin(x)) - 1).cast("int")
      e.cast("long") * 1024 + call_function("shiftright", x * 1024, e) - 1024
    }
    val toks = docs(s, dir).select(TextFns.tokens(col("text")).as("t"))
      .localCheckpoint(false) // feeds the unigram AND bigram aggregates
    val uni = toks.select(explode(col("t")).as("a"))
      .groupBy(col("a")).agg(count(lit(1)).as("c"))
    val bg = toks.select(explode(TextFns.ngramsOf(col("t"), 2)).as("bg"))
      .select(split(col("bg"), " ").getItem(0).as("a"),
        split(col("bg"), " ").getItem(1).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    val nBig = toks.select(explode(TextFns.ngramsOf(col("t"), 2)).as("bg"))
      .agg(count(lit(1)).as("n"))
    bg
      .join(broadcast(uni.select(col("a"), col("c").as("ca"))), "a")
      .join(broadcast(uni.select(col("a").as("b"), col("c").as("cb"))), "b")
      .crossJoin(broadcast(nBig))
      .select(col("a"), col("b"), col("c_ab"),
        (lfp(col("c_ab")) + lfp(col("n")) - lfp(col("ca")) - lfp(col("cb")))
          .as("score_fp"))
      .orderBy(col("score_fp").desc, col("a"), col("b"))
      .limit(20)
  }

  private val q170Oracle: String =
    s"""WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
       |uni AS (SELECT unnest(t) AS a FROM toks),
       |ca AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY 1),
       |bg AS (SELECT t[i] AS a, t[i+1] AS b
       |       FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)),
       |cab AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
       |        FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5),
       |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bg),
       |sc AS (
       |  SELECT cab.a, cab.b, cab.c_ab,
       |    ${lfpSql("cab.c_ab")} + ${lfpSql("nb.n")}
       |      - ${lfpSql("x.c")} - ${lfpSql("y.c")} AS score_fp
       |  FROM cab JOIN ca x ON x.a = cab.a JOIN ca y ON y.a = cab.b, nb)
       |SELECT a, b, c_ab, CAST(score_fp AS BIGINT) AS score_fp
       |FROM sc ORDER BY score_fp DESC, a, b LIMIT 20""".stripMargin

  // ---- q171: per-node triangle counting -----------------------------------

  /** Triangle counts over the q165 link graph — the local clustering
    * signal link-spam and template-farm detection key on (triangle-rich
    * neighborhoods = mutually-linking clusters): edges canonicalized
    * undirected (self-loops dropped, parallels deduped), then the
    * node-iterator join — wedges (a<b)×(b<c) joined on the middle node,
    * closed by probing (a,c) against the edge set — and each closed
    * triangle credits all three corners. Two equi-joins + one aggregate,
    * no cartesian; at scale the canonical order is by DEGREE-then-id
    * (documented) so high-degree hubs never anchor the wedge explosion
    * — id order suffices here (3-out-regular ⇒ degree ≤ 6).
    */
  def triangleCounts(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id")).localCheckpoint(false)
    val n = d.count()
    val raw = d.select(col("doc_id").as("u"),
      explode(array((0 to 2).map(j =>
        (col("doc_id") * 31 + lit(j * 17)) % n): _*)).as("v"))
    val edges = raw.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .distinct()
      .localCheckpoint(false) // wedge build probes it three ways
    val wedges = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tris = wedges
      .join(edges.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
      .localCheckpoint(false) // credited to three corners below
    val credit = tris.select(col("x").as("doc_id"))
      .unionAll(tris.select(col("y").as("doc_id")))
      .unionAll(tris.select(col("z").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tri"))
    d.join(credit, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .orderBy(col("doc_id"))
  }

  private val q171Oracle: String =
    """WITH n AS (SELECT COUNT(*) AS n FROM documents),
      |raw AS (
      |  SELECT doc_id AS u, (doc_id * 31 + j * 17) % (SELECT n FROM n) AS v
      |  FROM documents, (SELECT unnest(range(0, 3)) AS j)),
      |e AS (
      |  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      |  FROM raw WHERE u <> v),
      |tri AS (
      |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM e e1 JOIN e e2 ON e1.b = e2.a
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |credit AS (
      |  SELECT x AS doc_id FROM tri
      |  UNION ALL SELECT y FROM tri
      |  UNION ALL SELECT z FROM tri)
      |SELECT d.doc_id,
      |  CAST(COALESCE((SELECT COUNT(*) FROM credit c WHERE c.doc_id = d.doc_id), 0)
      |    AS BIGINT) AS n_tri
      |FROM documents d ORDER BY d.doc_id""".stripMargin

  // ---- q222: multi-source BFS shortest paths ------------------------------

  /** Multi-source BFS distances over the q165 link graph — "how many
    * hops is every page from the nearest trusted seed", the
    * TrustRank/seed-distance signal crawl prioritization and spam
    * demotion rank with. Seeds are doc_id ≡ 0 (mod 100); six
    * synchronous frontier expansions, each ONE src-keyed equi-join of
    * the frontier against the (deduped) edge table + ONE anti-join
    * against the settled set — the frontier never revisits settled
    * nodes, so total work is O(Σ|frontier_i|·out-degree), not
    * O(levels·|E|). Control flow on the driver, every set
    * localCheckpointed so the plan stays flat; at 100 TB the edge
    * table is bucketed on src (q47) and each expansion is a
    * zero-reshuffle bucket join. Unreached nodes report dist −1.
    */
  def bfsDistances(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id")).localCheckpoint(false)
    val n = d.count()
    val edges = d.select(col("doc_id").as("src"),
        explode(array((0 to 2).map(j =>
          (col("doc_id") * 31 + lit(j * 17)) % n): _*)).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(false)
    var dist = d.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id"), lit(0L).as("dist")).localCheckpoint(false)
    var frontier = dist.select(col("doc_id"))
    for (i <- 1 to 6) {
      val neigh = frontier.join(edges, col("doc_id") === col("src"))
        .select(col("dst").as("doc_id")).distinct()
      val fresh = neigh.join(dist, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit(i.toLong).as("dist"))
        .localCheckpoint(false)
      dist = dist.unionByName(fresh).localCheckpoint(false)
      frontier = fresh.select(col("doc_id"))
    }
    d.join(dist, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("dist"), lit(-1L)).as("dist"))
      .orderBy(col("doc_id"))
  }

  private val q222Oracle: String = {
    val levels = (1 to 6).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT DISTINCT e.dst AS doc_id
         |  FROM e JOIN r${i - 1} f ON e.src = f.doc_id)""".stripMargin
    }.mkString(",\n")
    val union = (0 to 6).map(i => s"SELECT doc_id, $i AS lev FROM r$i")
      .mkString("\n  UNION ALL ")
    s"""WITH n AS MATERIALIZED (SELECT COUNT(*) AS n FROM documents),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT doc_id AS src,
       |    (doc_id * 31 + j * 17) % (SELECT n FROM n) AS dst
       |  FROM documents, (SELECT unnest(range(0, 3)) AS j)
       |  WHERE doc_id <> (doc_id * 31 + j * 17) % (SELECT n FROM n)),
       |r0 AS MATERIALIZED (
       |  SELECT doc_id FROM documents WHERE doc_id % 100 = 0),
       |$levels,
       |lv AS ($union)
       |SELECT d.doc_id,
       |  CAST(COALESCE((SELECT MIN(lev) FROM lv WHERE lv.doc_id = d.doc_id), -1)
       |    AS BIGINT) AS dist
       |FROM documents d ORDER BY d.doc_id""".stripMargin
  }

  // ---- q230: weighted shortest paths (Bellman-Ford rounds) ----------------

  /** Weighted seed distances — q222's BFS generalized to edge COSTS
    * (crawl politeness budgets, weighted trust propagation): the same
    * link graph with integer weight (src+dst) mod 7 + 1 per edge, six
    * synchronous Bellman-Ford relaxation rounds from the mod-100
    * seeds. Each round is ONE src-keyed join producing candidate
    * relaxations + ONE dst-keyed min-aggregate + ONE left join back
    * onto the vertex table — the min-plus matrix-vector product, all
    * map-side combinable, plan kept flat by localCheckpoint. Costs are
    * pure integers so the fixpoint is engine-exact; nodes a 6-round
    * horizon never reaches report −1.
    */
  def weightedDistances(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id")).localCheckpoint(false)
    val n = d.count()
    val edges = d.select(col("doc_id").as("src"),
        explode(array((0 to 2).map(j =>
          (col("doc_id") * 31 + lit(j * 17)) % n): _*)).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .withColumn("w", (col("src") + col("dst")) % 7 + 1)
      .localCheckpoint(false)
    var dist = d.select(col("doc_id"),
        when(col("doc_id") % 100 === 0, 0L).otherwise(lit(null).cast("long")).as("dist"))
      .localCheckpoint(false)
    for (_ <- 1 to 6) {
      val relax = dist.filter(col("dist").isNotNull)
        .join(edges, col("doc_id") === col("src"))
        .groupBy(col("dst"))
        .agg(min(col("dist") + col("w")).as("best"))
      dist = dist
        .join(relax.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("best").isNull, col("dist"))
            .when(col("dist").isNull || col("best") < col("dist"), col("best"))
            .otherwise(col("dist")).as("dist"))
        .localCheckpoint(false)
    }
    dist.select(col("doc_id"), coalesce(col("dist"), lit(-1L)).as("cost"))
      .orderBy(col("doc_id"))
  }

  private val q230Oracle: String = {
    val rounds = (1 to 6).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT dd.doc_id,
         |    CASE WHEN m.best IS NULL THEN dd.dist
         |         WHEN dd.dist IS NULL OR m.best < dd.dist THEN m.best
         |         ELSE dd.dist END AS dist
         |  FROM d${i - 1} dd LEFT JOIN (
         |    SELECT e.dst AS doc_id, MIN(p.dist + e.w) AS best
         |    FROM e JOIN d${i - 1} p ON p.doc_id = e.src
         |    WHERE p.dist IS NOT NULL GROUP BY e.dst) m
         |  ON m.doc_id = dd.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH n AS MATERIALIZED (SELECT COUNT(*) AS n FROM documents),
       |e AS MATERIALIZED (
       |  SELECT src, dst, (src + dst) % 7 + 1 AS w FROM (
       |    SELECT DISTINCT doc_id AS src,
       |      (doc_id * 31 + j * 17) % (SELECT n FROM n) AS dst
       |    FROM documents, (SELECT unnest(range(0, 3)) AS j))
       |  WHERE src <> dst),
       |d0 AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 100 = 0 THEN CAST(0 AS BIGINT) ELSE NULL END AS dist
       |  FROM documents),
       |$rounds
       |SELECT doc_id, CAST(COALESCE(dist, -1) AS BIGINT) AS cost
       |FROM d6 ORDER BY doc_id""".stripMargin
  }

  // ---- q253: critical-path DAG layering (longest path) --------------------

  /** Critical-path layering — q222's BFS inverted to LONGEST path over
    * a DAG: the build-system / task-DAG scheduling depth, and the
    * "earliest epoch a derived dataset can materialize" question in a
    * lineage graph. Edges (u → 2u + suppkey%2, capped at the max part
    * key) strictly increase the node id, so the graph is acyclic by
    * construction and every path at least doubles its node value —
    * depth ≤ ceil(log2(maxKey)), so the loop terminates in
    * O(log maxKey) synchronous rounds. The loop runs until the
    * frontier empties rather than to a precomputed count, so the
    * depth bound is a termination guarantee, not a truncation.
    * Unlike BFS the settled set can't prune (a longer path may still
    * arrive), so each round re-derives the frontier and the final
    * per-node MAX over all (node, round) states picks the layer; state
    * count is ≤ N·depth, never path-enumerating (the naive all-paths
    * walk is 2^depth). At 100 TB the edge table is bucketed on u and
    * each round is one co-located join; the per-round isEmpty probe
    * reads one checkpointed partition, not a recount of the graph.
    */
  def criticalPath(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir, "part").select(col("p_partkey").as("node"))
      .localCheckpoint(false)
    val mx = p.agg(max(col("node")).as("mx"))
    val edges = Tables(s, dir, "lineitem")
      .select(col("l_partkey").as("u"),
        (col("l_partkey") * 2 + pmod(col("l_suppkey"), lit(2L))).as("v"))
      .crossJoin(broadcast(mx))
      .filter(col("v") <= col("mx") && col("v") > col("u"))
      .select(col("u"), col("v")).distinct()
      .localCheckpoint(false)
    val roots = p.join(edges.select(col("v").as("node")).distinct(),
      Seq("node"), "left_anti").localCheckpoint(false)
    var frontier = roots
    var acc = roots.select(col("node"), lit(0L).as("len"))
    var i = 0
    var done = false
    while (!done) {
      i += 1
      frontier = frontier.join(edges, col("node") === col("u"))
        .select(col("v").as("node")).distinct().localCheckpoint(false)
      if (frontier.isEmpty) done = true
      else acc = acc.unionByName(frontier.select(col("node"), lit(i.toLong).as("len")))
    }
    acc.groupBy(col("node")).agg(max(col("len")).as("level"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("sum_nodes"))
      .orderBy(col("level"))
  }

  // Recursive CTE with UNION (not UNION ALL): DuckDB dedups each step's
  // (node, len) states against everything seen, so the walk carries at
  // most N·depth states and terminates when a round adds nothing new —
  // the same until-frontier-empty semantics as the Spark loop, with no
  // round count baked in.
  private val q253Oracle: String =
    s"""WITH RECURSIVE e AS MATERIALIZED (
       |  SELECT DISTINCT l_partkey AS u, l_partkey * 2 + (l_suppkey % 2) AS v
       |  FROM lineitem
       |  WHERE l_partkey * 2 + (l_suppkey % 2) <= (SELECT MAX(p_partkey) FROM part)
       |    AND l_partkey * 2 + (l_suppkey % 2) > l_partkey),
       |lv AS (
       |  SELECT p_partkey AS node, 0 AS len FROM part
       |  WHERE p_partkey NOT IN (SELECT v FROM e)
       |  UNION
       |  SELECT e.v AS node, lv.len + 1 AS len FROM e JOIN lv ON e.u = lv.node),
       |mx AS (SELECT node, MAX(len) AS level FROM lv GROUP BY 1)
       |SELECT CAST(level AS BIGINT) AS level, COUNT(*) AS n_nodes,
       |  CAST(SUM(node) AS BIGINT) AS sum_nodes
       |FROM mx GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q256: sparse matrix multiply (SpMM) --------------------------------

  /** Distributed sparse matrix multiply — the doc-term × term-topic
    * product behind LDA-style topic scoring, embedding projection, and
    * co-occurrence factorization, in its scale-correct join form:
    * A(doc, term, count) ⋈ B(term, topic, weight) on term, then one
    * hash aggregation to C(doc, topic). B derives deterministically
    * from the vocabulary (length-keyed weights mod 7), so it is
    * vocabulary-bounded and never materializes outside the plan. The
    * per-topic argmax uses the max-then-join-back two-pass (q184's
    * discipline) instead of a 5-partition window — no skew, no global
    * sort. All integer.
    */
  def sparseMatmul(s: SparkSession, dir: String): DataFrame = {
    val a = docs(s, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("av"))
    val b = a.select(col("term")).distinct()
      .withColumn("k", explode(array((0 to 4).map(k => lit(k.toLong)): _*)))
      .withColumn("w",
        pmod(length(col("term")) * (col("k") * 2 + 3) + col("k") + 1, lit(7L)))
    val cCells = a.join(b, "term")
      .groupBy(col("doc_id"), col("k")).agg(sum(col("av") * col("w")).as("cv"))
      .localCheckpoint(false)
    val tops = cCells.groupBy(col("k"))
      .agg(sum(col("cv")).as("total"),
        sum(when(col("cv") > 0, 1L).otherwise(0L)).as("n_nonzero"),
        max(col("cv")).as("max_cell"))
    val arg = cCells
      .join(tops.select(col("k"), col("max_cell").as("mc")), "k")
      .filter(col("cv") === col("mc"))
      .groupBy(col("k")).agg(min(col("doc_id")).as("top_doc"))
    tops.join(arg, "k")
      .select(col("k"), col("total"), col("n_nonzero"), col("max_cell"),
        col("top_doc"))
      .orderBy(col("k"))
  }

  private val q256Oracle: String =
    """WITH a AS (
      |  SELECT doc_id, term, COUNT(*) AS av FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |    FROM documents) t GROUP BY 1, 2),
      |b AS (
      |  SELECT term, k, (length(term) * (k * 2 + 3) + k + 1) % 7 AS w
      |  FROM (SELECT DISTINCT term FROM a) v,
      |       (SELECT unnest(range(0, 5)) AS k) ks),
      |c AS (
      |  SELECT doc_id, k, SUM(a.av * b.w) AS cv
      |  FROM a JOIN b USING (term) GROUP BY 1, 2),
      |tops AS (
      |  SELECT k, CAST(SUM(cv) AS BIGINT) AS total,
      |    SUM(CASE WHEN cv > 0 THEN 1 ELSE 0 END) AS n_nonzero,
      |    MAX(cv) AS max_cell
      |  FROM c GROUP BY 1),
      |arg AS (
      |  SELECT c.k, MIN(c.doc_id) AS top_doc
      |  FROM c JOIN tops ON tops.k = c.k AND c.cv = tops.max_cell
      |  GROUP BY 1)
      |SELECT CAST(tops.k AS BIGINT) AS k, tops.total,
      |  CAST(tops.n_nonzero AS BIGINT) AS n_nonzero,
      |  CAST(tops.max_cell AS BIGINT) AS max_cell, arg.top_doc
      |FROM tops JOIN arg ON arg.k = tops.k ORDER BY k""".stripMargin

  // ---- q257: k-means centroid training, driver-pinned ---------------------

  /** Lloyd's k-means TRAINING pinned end-to-end (q60 pinned PQ search by
    * fixing iters=0 codebooks; this pins the training loop itself):
    * [[Similarity.trainCentroids]] with k=4, iters=2 over the embeddings
    * table, the trained centroids posexploded to scalar (centroid_id,
    * pos, value) rows. The oracle replays both Lloyd's rounds as CTEs —
    * argmax-cosine assignment (ties → lowest centroid id, exactly
    * [[Similarity.assign]]'s max_by ordering) then per-dimension AVG —
    * so init, assignment metric, tie-break, and the mean update are all
    * hash-checked, not just the search that consumes them. round(…,6)
    * absorbs the ≤1e-13 summation-order skew of double AVG between
    * engines (q24's discipline); assignments themselves are exact
    * because centroid gaps are O(1e-2), nine decades above the noise.
    */
  def kmeansTrain(s: SparkSession, dir: String): DataFrame = {
    Similarity.trainCentroids(emb(s, dir), 4, 2)
      .select(col("vec_id").as("centroid_id"),
        posexplode(col("embedding").cast("array<double>")))
      .select(col("centroid_id"), col("pos").cast("long").as("pos"),
        round(col("col"), 6).as("val_r"))
      .sortOnce(col("centroid_id"), col("pos"))
  }

  private val q257Oracle: String = {
    def assignRound(cents: String, out: String) = {
      val cos = "list_cosine_similarity(CAST(v.embedding AS DOUBLE[]), i.c)"
      s"""$out AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT v.vec_id, v.embedding, i.cid,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY $cos DESC, i.cid) AS rn
         |    FROM embeddings v, $cents i) WHERE rn = 1)""".stripMargin
    }
    def meanRound(assigned: String, out: String) =
      s"""$out AS (
         |  SELECT cid, pos, AVG(x) AS m FROM (
         |    SELECT cid,
         |      generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS pos,
         |      unnest(CAST(embedding AS DOUBLE[])) AS x
         |    FROM $assigned) t GROUP BY 1, 2)""".stripMargin
    s"""WITH init AS (
       |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
       |  FROM embeddings ORDER BY vec_id LIMIT 4),
       |${assignRound("init", "a1")},
       |${meanRound("a1", "g1")},
       |c1 AS (
       |  SELECT cid, list(m ORDER BY pos) AS c FROM g1 GROUP BY 1
       |  UNION ALL
       |  SELECT cid, c FROM init WHERE cid NOT IN (SELECT cid FROM g1)),
       |${assignRound("c1", "a2")},
       |${meanRound("a2", "g2")},
       |outv AS (
       |  SELECT cid, pos, m FROM g2
       |  UNION ALL
       |  SELECT cid, generate_subscripts(c, 1) - 1 AS pos, unnest(c) AS m
       |  FROM c1 WHERE cid NOT IN (SELECT cid FROM g2))
       |SELECT CAST(cid AS BIGINT) AS centroid_id, CAST(pos AS BIGINT) AS pos,
       |  round(m, 6) AS val_r
       |FROM outv ORDER BY 1, 2""".stripMargin
  }

  // ---- q258: incremental perceptual-fingerprint maintenance ---------------

  /** Incremental phash maintenance pinned incremental ≡ full (q203's
    * SCD2-apply discipline): a previous crawl is simulated as the corpus
    * minus `doc_id % 7 = 3` (added since), with `doc_id % 5 = 0`
    * payloads byte-different (changed since; their old image comes from
    * a shifted generator seed) and a batch of since-removed ids beyond
    * the corpus. Its [[graft.operators.Multimodal.phashStore]] is
    * PERSISTED (parquet under Staging.ensureFresh, keyed on the corpus
    * source-sig — repeat runs never re-bootstrap), then
    * [[graft.operators.Multimodal.incrementalPhash]] maintains it
    * against the full corpus: only added/changed payloads are decoded
    * (the spec asserts the decode set exactly; the operator `observe`s
    * it), unchanged ids keep their stored phash, removed ids drop. The
    * oracle predicts every output phash in closed form from q113's
    * cell-image bit model and the decoded/retained provenance from the
    * delta definition — so a green row proves the maintained store is
    * bit-identical to a full recompute while doing O(delta) decode work.
    */
  def incrPhashMaintain(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val d = docs(s, dir).select(col("doc_id"))
    val isOld = col("doc_id") % 7 =!= 3
    val isChanged = (col("doc_id") % 5 === 0) && isOld
    // shifted generator seeds for changed/removed fakes must land OUTSIDE
    // the corpus id range — a fixed shift collided with the sf1 replica
    // offsets (doc_id + k*1e7) and duplicated media ids
    val shift = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val oldMedia = Multimodal.syntheticCellImages(d.filter(isOld && !isChanged))
      .unionByName(Multimodal.syntheticCellImages(
          d.filter(isChanged).select((col("doc_id") + shift).as("doc_id")))
        .withColumn("media_id", col("media_id") - shift))
      .unionByName(Multimodal.syntheticCellImages(
        d.filter(col("doc_id") % 13 === 1).select((col("doc_id") + 2 * shift).as("doc_id"))))
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val storeP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"phash_store_v2_$tag")
    graft.Staging.ensureFresh(
      java.nio.file.Paths.get(dir, "documents.parquet"), storeP) {
      Multimodal.phashStore(oldMedia, Multimodal.imagePhash)
        .write.mode("overwrite").parquet(storeP.toString)
    }
    val prevStore = s.read.parquet(storeP.toString)
    val newMedia = Multimodal.syntheticCellImages(d)
    Multimodal.incrementalPhash(newMedia, prevStore, Multimodal.imagePhash)
      .select(col("media_id"), col("phash"), col("src"))
      .sortOnce(col("media_id"))
  }

  private val q258Oracle: String =
    s"""WITH bits AS (
       |  SELECT doc_id, r.r * 8 + c.c AS pos,
       |    CASE WHEN
       |      ${cellHashSql("c.c + 1")} % 200
       |        + CASE WHEN doc_id % 3 = 2 AND c.c + 1 = 4 AND r.r < 2 THEN 55 ELSE 0 END
       |      > ${cellHashSql("c.c")} % 200
       |        + CASE WHEN doc_id % 3 = 2 AND c.c = 4 AND r.r < 2 THEN 55 ELSE 0 END
       |    THEN 1 ELSE 0 END AS bit
       |  FROM (SELECT doc_id, doc_id // 3 AS seed FROM documents),
       |       (SELECT unnest(range(8)) AS r) r,
       |       (SELECT unnest(range(8)) AS c) c),
       |ph AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN pos < 63 THEN CAST(bit AS BIGINT) << pos ELSE 0 END) AS BIGINT)
       |    + CASE WHEN MAX(CASE WHEN pos = 63 THEN bit ELSE 0 END) = 1
       |        THEN CAST(-9223372036854775807 AS BIGINT) - 1 ELSE 0 END AS fp
       |  FROM bits GROUP BY doc_id)
       |SELECT doc_id AS media_id, fp AS phash,
       |  CASE WHEN doc_id % 7 = 3 OR doc_id % 5 = 0 THEN 'decoded'
       |       ELSE 'retained' END AS src
       |FROM ph ORDER BY media_id""".stripMargin

  // ---- q259: incremental MinHash signature-store maintenance --------------

  /** Incremental MinHash signature maintenance pinned incremental ≡ full
    * (q258's discipline applied to the TEXT dedup index): a previous
    * crawl is simulated as the corpus minus `doc_id % 7 = 3` (added
    * since), with `doc_id % 5 = 0` texts carrying an older revision
    * (changed since) and a batch of since-removed ids beyond the corpus.
    * Its [[graft.operators.Dedup.signatureStore]] is PERSISTED (parquet
    * under Staging.ensureFresh, keyed on the corpus source-sig), then
    * [[graft.operators.Dedup.incrementalSignatures]] maintains it
    * against the full corpus: only added/changed texts are re-shingled
    * (the spec asserts the compute set exactly; the operator `observe`s
    * it), unchanged ids keep their stored slots, removed ids drop. The
    * oracle recomputes every MinHash slot from scratch over the full
    * corpus (q23's signature CTE) and the computed/retained provenance
    * from the delta definition — a green row proves the maintained
    * store is bit-identical to a full re-index at O(delta) cost.
    */
  def incrSigMaintain(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val isOld = col("doc_id") % 7 =!= 3
    val isChanged = (col("doc_id") % 5 === 0) && isOld
    // removed-doc fake ids must land OUTSIDE the corpus id range at any
    // SF (q258's sf1 lesson: fixed shifts collide with replica offsets)
    val shift = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val prevCrawl = d.filter(isOld && !isChanged)
      .unionByName(d.filter(isChanged)
        .select(col("doc_id"), concat(col("text"), lit(" legacy rev")).as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 2 * shift).as("doc_id"), col("text")))
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val storeP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"sig_store_$tag")
    graft.Staging.ensureFresh(
      java.nio.file.Paths.get(dir, "documents.parquet"), storeP) {
      Dedup.signatureStore(prevCrawl, col("doc_id"), col("text"), NumPerms)
        .write.mode("overwrite").parquet(storeP.toString)
    }
    val prevStore = s.read.parquet(storeP.toString)
    Dedup.incrementalSignatures(d, prevStore, col("doc_id"), col("text"), NumPerms)
      .select(col("doc_id"),
        concat_ws("_", (0 until NumPerms).map(i => col(s"sig$i")): _*).as("sig_key"),
        col("src"))
      .sortOnce(col("doc_id"))
  }

  private val q259Oracle: String = {
    val sigCols = (0 until NumPerms)
      .map(i => s"MIN(${TextFns.minhashPermSql(i, "h")}) AS s$i").mkString(", ")
    val key = (0 until NumPerms).map(i => s"CAST(s$i AS VARCHAR)").mkString(" || '_' || ")
    s"""WITH $shingleBaseCtes,
       |hashed AS (SELECT doc_id, ${TextFns.hash60Sql("shingle")} AS h FROM sh),
       |sigs AS (SELECT doc_id, $sigCols FROM hashed GROUP BY doc_id)
       |SELECT doc_id, $key AS sig_key,
       |  CASE WHEN doc_id % 7 = 3 OR doc_id % 5 = 0 THEN 'computed'
       |       ELSE 'retained' END AS src
       |FROM sigs ORDER BY doc_id""".stripMargin
  }

  // ---- q260: leakage-safe grouped split -----------------------------------

  /** Train/val/test split that is leakage-safe BY CONSTRUCTION
    * ([[graft.operators.Sampling.groupedSplit]]): the split is decided
    * by hashing the GROUP key (here: the user behind each event), so an
    * entity's rows can never straddle splits — the classic eval-leak
    * when row-level sampling puts half a user's history in train and
    * half in test. The query audits its own guarantee from the DATA
    * (count of users observed in >1 split — must be 0) rather than
    * trusting the construction, and the oracle replays the hash-ranged
    * assignment bit-for-bit.
    */
  def groupedSplitAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val ev = Tables(s, dir, "events")
    val labeled = Sampling.groupedSplit(
      ev.select(col("user_id"), col("event_id")), col("user_id"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val leak = labeled.groupBy(col("user_id"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1)
      .agg(count(lit(1)).as("n_leaky_users"))
    labeled.groupBy(col("split"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .crossJoin(broadcast(leak))
      .orderBy(col("split"))
  }

  private val q260Oracle: String = {
    val b = TextFns.hash60Sql("CAST(user_id AS VARCHAR)")
    s"""WITH labeled AS (
       |  SELECT user_id, event_id,
       |    CASE WHEN $b % 100 < 80 THEN 'train'
       |         WHEN $b % 100 < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM events),
       |leak AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_leaky_users FROM (
       |    SELECT user_id FROM labeled GROUP BY user_id
       |    HAVING COUNT(DISTINCT split) > 1))
       |SELECT split, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |  CAST(COUNT(*) AS BIGINT) AS n_events, n_leaky_users
       |FROM labeled, leak GROUP BY split, n_leaky_users ORDER BY split""".stripMargin
  }

  // ---- q261: epoch-capped mixture water-filling ---------------------------

  /** Epoch-capped data mixture ([[graft.operators.Sampling
    * .epochCappedMixture]]): a 2×-corpus token budget split across
    * sources ∝ a per-source weight (1–5, derived from the source id),
    * but no source upsampled past 2.5 epochs — the surplus from clamped
    * sources re-flows to the rest by exact integer water-filling
    * (closed-form prefix decision + largest-remainder, Σ alloc ≡
    * budget). The oracle replays the whole computation — ratio-sorted
    * window prefix sums, the capping inequality in int64
    * cross-multiplies, floor shares, remainder ranks — so a green row
    * pins the allocation algebra itself, not just row counts.
    */
  def epochCappedMix(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val d = docs(s, dir)
    val budget = 2L * d.agg(sum(col("n_chars"))).head.getLong(0)
    Sampling.epochCappedMixture(d, col("source"), col("n_chars"),
        (substring(col("source"), 4, 10).cast("int") % 5 + 1).cast("long"),
        budget, maxEpochsMilli = 2500L)
      .orderBy(col("stratum"))
  }

  private val q261Oracle: String =
    """WITH strata AS (
      |  SELECT source AS stratum, CAST(SUM(n_chars) AS BIGINT) AS avail_tok,
      |    CAST(CAST(substr(source, 4) AS INT) % 5 + 1 AS BIGINT) AS weight
      |  FROM documents GROUP BY source),
      |tot AS (SELECT 2 * CAST(SUM(avail_tok) AS BIGINT) AS budget FROM strata),
      |capd AS (
      |  SELECT stratum, avail_tok, weight, avail_tok * 2500 // 1000 AS cap
      |  FROM strata),
      |marked AS (
      |  SELECT s.*, budget,
      |    COALESCE(SUM(cap) OVER (ORDER BY CAST(cap AS DOUBLE) / weight, stratum
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pref_cap,
      |    SUM(weight) OVER (ORDER BY CAST(cap AS DOUBLE) / weight, stratum
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS suf_w
      |  FROM capd s, tot),
      |flagged AS (
      |  SELECT *, cap * suf_w <= (budget - pref_cap) * weight AS capped
      |  FROM marked),
      |totals AS (
      |  SELECT SUM(CASE WHEN capped THEN cap ELSE 0 END) AS capped_tok,
      |    SUM(CASE WHEN capped THEN 0 ELSE weight END) AS unc_w FROM flagged),
      |shared AS (
      |  SELECT f.*, GREATEST(budget - capped_tok, 0) AS remaining, unc_w
      |  FROM flagged f, totals),
      |based AS (
      |  SELECT *,
      |    CASE WHEN capped THEN cap ELSE remaining * weight // unc_w END AS base,
      |    CASE WHEN capped THEN -1 ELSE (remaining * weight) % unc_w END AS frac
      |  FROM shared),
      |ranked AS (
      |  SELECT *, row_number() OVER (ORDER BY frac DESC, stratum) AS extra_rank,
      |    remaining - SUM(CASE WHEN capped THEN 0 ELSE base END) OVER () AS n_extra
      |  FROM based)
      |SELECT stratum, avail_tok, weight, capped,
      |  CAST(base + CASE WHEN NOT capped AND extra_rank <= n_extra THEN 1 ELSE 0 END
      |    AS BIGINT) AS alloc_tok,
      |  CAST((base + CASE WHEN NOT capped AND extra_rank <= n_extra THEN 1 ELSE 0 END)
      |    * 1000 // avail_tok AS BIGINT) AS epochs_milli
      |FROM ranked ORDER BY stratum""".stripMargin

  // ---- q262: delta-scoped LSH pair maintenance ----------------------------

  /** Incremental banded-LSH candidate maintenance pinned incremental ≡
    * full — the pair leg completing q259's signature leg: the same
    * simulated previous crawl yields a prev signature store AND its
    * full banding pair set; [[graft.operators.Dedup
    * .incrementalLshPairs]] then maintains the pairs against the
    * maintained store, expanding ONLY buckets containing a computed
    * (added/changed) doc and re-using prev pairs whose endpoints are
    * both retained. The oracle recomputes the ENTIRE banding from
    * scratch over the current corpus (q23's CTE chain) and classifies
    * origin purely from the delta definition — a green row proves the
    * delta-scoped union reproduces the full quadratic recompute exactly,
    * which is the property that makes per-crawl dedup-index refresh
    * O(delta-touched buckets) instead of O(corpus²/buckets) at 100 TB.
    */
  def incrLshMaintain(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val isOld = col("doc_id") % 7 =!= 3
    val isChanged = (col("doc_id") % 5 === 0) && isOld
    val shift = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    // EAGER checkpoints (q290's measured lesson): these shared stages
    // fan out to several consumer stages of one action, and stages racing
    // a not-yet-persisted lazy checkpoint recompute its subtree.
    val prevCrawl = d.filter(isOld && !isChanged)
      .unionByName(d.filter(isChanged)
        .select(col("doc_id"), concat(col("text"), lit(" legacy rev")).as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 2 * shift).as("doc_id"), col("text")))
    val prevStore = Dedup.signatureStore(prevCrawl, col("doc_id"), col("text"), NumPerms)
      .localCheckpoint(true) // two consumers: prev banding + the diff side
    val prevPairs = Dedup.lshCandidates(prevStore, NumPerms, RowsPerBand)
    val store = Dedup.incrementalSignatures(d, prevStore, col("doc_id"), col("text"), NumPerms)
    // The CHECKED variant: cap-crossing detection + auto re-expansion is
    // part of the maintenance step itself, so the incremental ≡ full pin
    // holds unconditionally, not just in the no-crossing regime.
    Dedup.incrementalLshPairsChecked(prevStore, store, prevPairs, NumPerms, RowsPerBand)
      .sortOnce(col("doc_a"), col("doc_b"))
  }

  private val q262Oracle: String = {
    val sigCols = (0 until NumPerms)
      .map(i => s"MIN(${TextFns.minhashPermSql(i, "h")}) AS s$i").mkString(", ")
    val bandSelects = (0 until NumPerms / RowsPerBand).map { bnd =>
      val key = (0 until RowsPerBand)
        .map(r => s"CAST(s${bnd * RowsPerBand + r} AS VARCHAR)").mkString(" || '_' || ")
      s"SELECT doc_id, $bnd AS band, $key AS key FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shingleBaseCtes,
       |hashed AS (SELECT doc_id, ${TextFns.hash60Sql("shingle")} AS h FROM sh),
       |sigs AS (SELECT doc_id, $sigCols FROM hashed GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cands AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  CASE WHEN doc_a % 7 <> 3 AND doc_a % 5 <> 0
       |        AND doc_b % 7 <> 3 AND doc_b % 5 <> 0 THEN 'survivor'
       |       ELSE 'new' END AS origin
       |FROM cands ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---- q265: incremental component maintenance ------------------------------

  /** Crawl-incremental CLUSTER maintenance pinned incremental ≡ full
    * ([[graft.operators.Dedup.incrementalComponents]], closing the
    * q259→q262 chain): the same simulated crawl delta, its previous
    * labels from a full propagation over the previous pair set, then
    * the maintained store + maintained pairs feed the contracted
    * O(delta + dirty) propagation — clean components ride along as
    * single representative nodes, only components that lost a member
    * re-propagate, merges happen on the contracted graph. The oracle
    * recomputes per-doc labels from scratch (banding → recursive-CTE
    * closure → min label → singleton coalesce), so a green row proves
    * label maintenance including SPLITS (a changed doc's old edges
    * vanish) and MERGES (new pairs joining old clusters) is exact.
    */
  def incrComponents(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val isOld = col("doc_id") % 7 =!= 3
    val isChanged = (col("doc_id") % 5 === 0) && isOld
    val shift = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    // EAGER checkpoints (q290's measured lesson): these shared stages
    // fan out to several consumer stages of one action, and stages racing
    // a not-yet-persisted lazy checkpoint recompute its subtree.
    val prevCrawl = d.filter(isOld && !isChanged)
      .unionByName(d.filter(isChanged)
        .select(col("doc_id"), concat(col("text"), lit(" legacy rev")).as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 2 * shift).as("doc_id"), col("text")))
      .localCheckpoint(true) // feeds the store AND the prev-label coalesce
    val prevStore = Dedup.signatureStore(prevCrawl, col("doc_id"), col("text"), NumPerms)
      .localCheckpoint(true)
    val prevPairs = Dedup.lshCandidates(prevStore, NumPerms, RowsPerBand)
      .localCheckpoint(true) // feeds prev labels AND pair maintenance
    val prevLabels = prevCrawl.select(col("doc_id"))
      .join(Dedup.connectedComponents(prevPairs), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
    val store = Dedup.incrementalSignatures(d, prevStore, col("doc_id"), col("text"), NumPerms)
      .localCheckpoint(true) // feeds pair maintenance AND component maintenance
    val pairs = Dedup.incrementalLshPairsChecked(prevStore, store, prevPairs,
        NumPerms, RowsPerBand)
      .localCheckpoint(true) // the maintained pair set feeds propagation twice
    Dedup.incrementalComponents(prevLabels, store, pairs)
      .sortOnce(col("doc_id"))
  }

  private val q265Oracle: String = {
    val sigCols = (0 until NumPerms)
      .map(i => s"MIN(${TextFns.minhashPermSql(i, "h")}) AS s$i").mkString(", ")
    val bandSelects = (0 until NumPerms / RowsPerBand).map { bnd =>
      val key = (0 until RowsPerBand)
        .map(r => s"CAST(s${bnd * RowsPerBand + r} AS VARCHAR)").mkString(" || '_' || ")
      s"SELECT doc_id, $bnd AS band, $key AS key FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shingleBaseCtes,
       |hashed AS (SELECT doc_id, ${TextFns.hash60Sql("shingle")} AS h FROM sh),
       |sigs AS (SELECT doc_id, $sigCols FROM hashed GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cands AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2),
       |nodes AS (SELECT doc_a AS n FROM cands UNION SELECT doc_b FROM cands),
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM cands
       |          UNION SELECT doc_b, doc_a FROM cands),
       |reach AS (
       |  WITH RECURSIVE r(src, dst) AS (
       |    SELECT n, n FROM nodes
       |    UNION
       |    SELECT r.src, e.v FROM r JOIN edges e ON e.u = r.dst)
       |  SELECT * FROM r),
       |cc AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY 1)
       |SELECT d.doc_id, COALESCE(cc.component, d.doc_id) AS component
       |FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---- q266: GloVe-style co-occurrence matrix -------------------------------

  /** Distance-weighted co-occurrence counts ([[graft.operators.Cooccur
    * .pairWeights]], window 3, exact ×60 weights): the corpus statistic
    * GloVe-style embedding training consumes, built as one per-row
    * codegen comprehension + one pair-keyed shuffle. The ×60 fixed
    * point makes every 1/d weight an integer, so the aggregated matrix
    * replays cell-exact in DuckDB's nested list comprehension; the
    * HAVING floor prunes the singleton tail on both engines identically
    * (an exact output contract, not a sample).
    */
  def cooccurMatrix(s: SparkSession, dir: String): DataFrame =
    graft.operators.Cooccur.pairWeights(docs(s, dir), col("text"),
        window = 3, minWeight60 = 600L)
      .sortOnce(col("a"), col("b"))

  private val q266Oracle: String =
    """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
      |pairs AS (
      |  SELECT unnest(flatten(
      |    [[{'a': least(t[i], t[j]), 'b': greatest(t[i], t[j]), 'w': 60 // (j - i)}
      |      for j in range(i + 1, least(i + 3, len(t)) + 1)]
      |     for i in range(1, len(t))])) AS p
      |  FROM toks)
      |SELECT p.a AS a, p.b AS b, CAST(SUM(p.w) AS BIGINT) AS w60,
      |  CAST(COUNT(*) AS BIGINT) AS n_hits
      |FROM pairs WHERE p.a <> p.b
      |GROUP BY 1, 2 HAVING SUM(p.w) >= 600
      |ORDER BY a, b""".stripMargin

  // ---- q267: JL sign projection + recall audit -------------------------------

  /** Random-projection dimensionality reduction with an in-data recall
    * audit ([[graft.operators.Projection.signProject]], 64 → 16 dims):
    * the pre-ANN compression leg of the similarity family. For q24's
    * fixed query batch the exact fixed-point top-3 is computed in BOTH
    * spaces and the per-query overlap reported, next to the query's
    * projected-coordinate checksum — so the oracle pins the projection
    * VALUES bit-for-bit (sign matrix re-derived from the public hash60
    * formula, exact integer Σ ±e) and the ranking arithmetic
    * (int64 dot, IEEE sqrt norms, ×10⁶ round), not just a recall
    * number.
    */
  def jlRecall(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Projection
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < NumQueries)
    val origScored = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
      .join(broadcast(q.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))),
        col("neighbor_id") =!= col("query_id"))
      .withColumn("simfp",
        round(VectorFns.cosine(col("qvec"), col("cvec")) * lit(1000000d), 0).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("simfp").desc, col("neighbor_id"))
    val origTop = origScored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK).select(col("query_id"), col("neighbor_id"))
    val proj = Projection.signProject(e, col("vec_id"), col("embedding"),
        inDim = 64, outDim = 16)
      .localCheckpoint(false) // feeds corpus side, query side, and the checksum
    val pq = proj.select(col("vec_id").as("query_id"), col("proj").as("qp"),
      col("norm2").as("qn")).filter(col("query_id") < NumQueries)
    val projScored = proj.select(col("vec_id").as("neighbor_id"), col("proj").as("cp"),
        col("norm2").as("cn"))
      .join(broadcast(pq), col("neighbor_id") =!= col("query_id"))
      .withColumn("dot",
        aggregate(zip_with(col("qp"), col("cp"), (a, b) => a * b),
          lit(0L), (acc, v) => acc + v))
      .withColumn("psimfp",
        round(col("dot").cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double"))) *
          lit(1000000d), 0).cast("long"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("psimfp").desc, col("neighbor_id"))
    val projTop = projScored.withColumn("rnk", row_number().over(wp))
      .filter(col("rnk") <= TopK).select(col("query_id"), col("neighbor_id"))
    val overlap = origTop.join(projTop, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
    val chk = pq.select(col("query_id"),
      aggregate(col("qp"), lit(0L), (acc, v) => acc + v).as("q_proj_sum"))
    chk.join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        col("q_proj_sum"))
      .sortOnce(col("query_id"))
  }

  private val q267Oracle: String = {
    val cos = VectorFns.cosineSql("q.embedding", "c.embedding")
    val sign = "CASE WHEN CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || " +
      "CAST(i - 1 AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END"
    s"""WITH qs AS (SELECT * FROM embeddings WHERE vec_id < $NumQueries),
       |orig AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY CAST(round($cos * 1000000, 0) AS BIGINT) DESC, c.vec_id) AS rnk
       |  FROM qs q JOIN embeddings c ON c.vec_id <> q.vec_id),
       |orig_top AS (SELECT query_id, neighbor_id FROM orig WHERE rnk <= $TopK),
       |efp AS (
       |  SELECT vec_id,
       |    [CAST(round(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT)
       |     for i in range(1, len(embedding) + 1)] AS f
       |  FROM embeddings),
       |proj AS (
       |  SELECT vec_id,
       |    [CAST(list_sum([($sign) * f[i] for i in range(1, len(f) + 1)]) AS BIGINT)
       |     for j in range(0, 16)] AS p
       |  FROM efp),
       |normed AS (
       |  SELECT vec_id, p,
       |    CAST(list_sum([p[i] * p[i] for i in range(1, 17)]) AS BIGINT) AS n2
       |  FROM proj),
       |pscore AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      CAST(round(CAST(list_sum([q.p[i] * c.p[i] for i in range(1, 17)]) AS DOUBLE)
       |        / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE)))
       |        * 1000000, 0) AS BIGINT) DESC, c.vec_id) AS rnk
       |  FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NumQueries),
       |proj_top AS (SELECT query_id, neighbor_id FROM pscore WHERE rnk <= $TopK),
       |overlap AS (
       |  SELECT o.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
       |  FROM orig_top o JOIN proj_top p USING (query_id, neighbor_id)
       |  GROUP BY 1)
       |SELECT n.vec_id AS query_id, COALESCE(ov.n_overlap, 0) AS n_overlap,
       |  CAST(list_sum([n.p[i] for i in range(1, 17)]) AS BIGINT) AS q_proj_sum
       |FROM normed n LEFT JOIN overlap ov ON ov.query_id = n.vec_id
       |WHERE n.vec_id < $NumQueries
       |ORDER BY query_id""".stripMargin
  }

  // ---- q268: typed-Aggregator bounded top-k ---------------------------------

  /** Per-group top-k through the typed `Aggregator` extension surface
    * ([[graft.operators.TopK.perGroup]]): top-5 orders by price cents
    * per order priority. Unlike the `row_number()` window (which
    * shuffles EVERY group row to sort it), the aggregator's bounded
    * buffer participates in map-side partial aggregation — at most ~2k
    * entries per group leave a task, so shuffle bytes scale with
    * k·partitions·groups, not with group sizes. The oracle replays the
    * semantics with the window form, pinning the aggregator's
    * reduce/merge law equal to the sort definition; prices land in
    * exact integer CENTS on both engines.
    */
  def typedTopK(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
      .select(col("o_orderpriority").as("priority"),
        round(col("o_totalprice") * lit(100d), 0).cast("long").as("cents"),
        col("o_orderkey"))
    graft.operators.TopK.perGroup(o, Seq(col("priority")), col("cents"),
        col("o_orderkey"), k = 5)
      .select(col("g0").as("priority"), col("rnk").cast("long").as("rnk"),
        col("id").as("o_orderkey"), col("v").as("cents"))
      .sortOnce(col("priority"), col("rnk"))
  }

  private val q268Oracle: String =
    """WITH o AS (
      |  SELECT o_orderpriority AS priority,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents, o_orderkey
      |  FROM orders),
      |r AS (
      |  SELECT priority, cents, o_orderkey,
      |    row_number() OVER (PARTITION BY priority
      |      ORDER BY cents DESC, o_orderkey) AS rnk
      |  FROM o)
      |SELECT priority, CAST(rnk AS BIGINT) AS rnk, o_orderkey, cents
      |FROM r WHERE rnk <= 5 ORDER BY priority, rnk""".stripMargin

  // ---- q269: incremental JOIN view maintenance -------------------------------

  /** Join-view IVM ([[graft.operators.Joins.incrementalJoinView]]):
    * orders ⋈ lineitem maintained under insert deltas (every-10th
    * order, every-5th lineitem arrive "since the view was built"). The
    * maintained view is audited per DELTA LEG — each output row is
    * classified prev / a_new / b_new / both_new from the same modular
    * conditions the deltas were carved with — and the oracle computes
    * the FULL join with identical leg classification, so a green row
    * proves the four legs partition the new join exactly (no row
    * duplicated, none missed): the algebra that lets a 100 TB stored
    * view absorb a delta by appending ΔV instead of re-joining.
    */
  def joinViewMaintain(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders").select(col("o_orderkey"),
      col("o_orderpriority").as("priority"),
      round(col("o_totalprice") * lit(100d), 0).cast("long").as("cents"))
    val l = Tables(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"),
      col("l_linenumber"), col("l_quantity").cast("long").as("qty"))
    val aNew = col("o_orderkey") % 10 === 7
    // independent moduli: %10 and %7 overlap without implication, so
    // all four legs are non-empty (a %5 carve would make aNew ⊆ bNew)
    val bNew = col("o_orderkey") % 7 === 3
    val (aOld, aDelta) = (o.filter(!aNew), o.filter(aNew))
    val (bOld, bDelta) = (l.filter(!bNew), l.filter(bNew))
    val prevView = aOld.join(bOld, "o_orderkey")
    graft.operators.Joins
      .incrementalJoinView(prevView, aOld, aDelta, bOld, bDelta, "o_orderkey")
      .withColumn("leg",
        when(aNew && bNew, "both_new").when(aNew, "a_new")
          .when(bNew, "b_new").otherwise("prev"))
      .groupBy(col("leg"))
      .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("sum_qty"),
        sum(col("cents")).as("sum_cents"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("leg"))
  }

  private val q269Oracle: String =
    """WITH v AS (
      |  SELECT o.o_orderkey,
      |    CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
      |    CAST(l.l_quantity AS BIGINT) AS qty,
      |    CASE WHEN o.o_orderkey % 10 = 7 AND o.o_orderkey % 7 = 3 THEN 'both_new'
      |         WHEN o.o_orderkey % 10 = 7 THEN 'a_new'
      |         WHEN o.o_orderkey % 7 = 3 THEN 'b_new'
      |         ELSE 'prev' END AS leg
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
      |SELECT leg, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(qty) AS BIGINT) AS sum_qty,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
      |FROM v GROUP BY leg ORDER BY leg""".stripMargin

  // ---- q270: time-respecting temporal reachability ---------------------------

  private val TemporalHops = 6

  /** Temporal-graph earliest arrival ([[graft.operators.TemporalGraph
    * .earliestArrival]]): the q222/q230 graph family's TIME dimension —
    * an edge is traversable only at t ≥ the arrival at its source, so
    * the result is what can actually PROPAGATE (information, contagion,
    * causality), which static reachability overstates. Same bounded-
    * hop discipline as q222: ≤6 hops on both engines, the oracle
    * enumerating each hop level's (node, arrival) pairs and taking the
    * min — a green row proves the dominance-pruned label-correcting
    * rounds equal the full path enumeration.
    */
  def temporalReach(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TemporalGraph
    val d = docs(s, dir).select(col("doc_id")).localCheckpoint(false)
    val n = d.count()
    val edges = d.select(col("doc_id").as("src"),
        explode(array((0 to 2).map(j => struct(
          ((col("doc_id") * 31 + lit(j * 17)) % n).as("dst"),
          ((col("doc_id") * 7 + lit(j * 13)) % 1000).as("t"))): _*)).as("e"))
      .select(col("src"), col("e.dst"), col("e.t"))
      .filter(col("src") =!= col("dst")).distinct()
    val sources = d.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("node"))
    val best = TemporalGraph.earliestArrival(edges, sources, TemporalHops)
    d.join(best, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("arrival"), lit(-1L)).as("arrival"))
      .sortOnce(col("doc_id"))
  }

  private val q270Oracle: String = {
    val levels = (1 to TemporalHops).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT DISTINCT e.dst AS node, e.t AS arr
         |  FROM e JOIN r${i - 1} f ON e.src = f.node AND e.t >= f.arr)""".stripMargin
    }.mkString(",\n")
    val union = (0 to TemporalHops).map(i => s"SELECT node, arr FROM r$i")
      .mkString("\n  UNION ALL ")
    s"""WITH n AS MATERIALIZED (SELECT COUNT(*) AS n FROM documents),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT doc_id AS src,
       |    (doc_id * 31 + j * 17) % (SELECT n FROM n) AS dst,
       |    (doc_id * 7 + j * 13) % 1000 AS t
       |  FROM documents, (SELECT unnest(range(0, 3)) AS j)
       |  WHERE doc_id <> (doc_id * 31 + j * 17) % (SELECT n FROM n)),
       |r0 AS MATERIALIZED (
       |  SELECT doc_id AS node, CAST(0 AS BIGINT) AS arr
       |  FROM documents WHERE doc_id % 100 = 0),
       |$levels,
       |reach AS (
       |  $union)
       |SELECT d.doc_id, COALESCE(MIN(r.arr), -1) AS arrival
       |FROM documents d LEFT JOIN reach r ON r.node = d.doc_id
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }

  // ---- q271: schema + stats drift audit ---------------------------------------

  /** Data-contract drift audit ([[graft.operators.SchemaDrift.audit]]):
    * the previous export is simulated from documents — rows `%9=4`
    * gone, `lang`/`source` columns absent, `text` nulled where
    * `%11=0`, `n_chars` narrowed to int — and audited against the
    * current snapshot. Pins column add/remove detection, the TYPE
    * change, and the exact null/NDV movement of every surviving
    * column; the oracle recomputes all of it from the same derivation
    * rules. Two scans total, no row-level join — the audit's cost is
    * independent of how much data sits between the snapshots.
    */
  def schemaDriftAudit(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val oldSnap = d.filter(col("doc_id") % 9 =!= 4)
      .select(col("doc_id"),
        when(col("doc_id") % 11 =!= 0, col("text")).as("text"),
        col("n_chars").cast("int").as("n_chars"))
    val newSnap = d.select(col("doc_id"), col("text"), col("n_chars"),
      col("lang"), col("source"))
    graft.operators.SchemaDrift.audit(oldSnap, newSnap)
      .sortOnce(col("column"))
  }

  private val q271Oracle: String =
    """WITH old AS (
      |  SELECT doc_id, CASE WHEN doc_id % 11 <> 0 THEN text END AS text, n_chars
      |  FROM documents WHERE doc_id % 9 <> 4),
      |os AS (
      |  SELECT * FROM (VALUES
      |    ('doc_id', 'bigint',
      |      (SELECT COUNT(*) FROM old),
      |      (SELECT COUNT(*) FROM old WHERE doc_id IS NULL),
      |      (SELECT COUNT(DISTINCT doc_id) FROM old)),
      |    ('text', 'string',
      |      (SELECT COUNT(*) FROM old),
      |      (SELECT COUNT(*) FROM old WHERE text IS NULL),
      |      (SELECT COUNT(DISTINCT text) FROM old)),
      |    ('n_chars', 'int',
      |      (SELECT COUNT(*) FROM old),
      |      (SELECT COUNT(*) FROM old WHERE n_chars IS NULL),
      |      (SELECT COUNT(DISTINCT n_chars) FROM old))
      |  ) t(column_name, old_type, old_rows, old_nulls, old_ndv)),
      |ns AS (
      |  SELECT * FROM (VALUES
      |    ('doc_id', 'bigint'), ('text', 'string'), ('n_chars', 'bigint'),
      |    ('lang', 'string'), ('source', 'string')
      |  ) t(column_name, new_type)),
      |nstats AS (
      |  SELECT n.column_name, n.new_type,
      |    (SELECT COUNT(*) FROM documents) AS new_rows,
      |    CASE n.column_name
      |      WHEN 'doc_id' THEN (SELECT COUNT(*) FROM documents WHERE doc_id IS NULL)
      |      WHEN 'text' THEN (SELECT COUNT(*) FROM documents WHERE text IS NULL)
      |      WHEN 'n_chars' THEN (SELECT COUNT(*) FROM documents WHERE n_chars IS NULL)
      |      WHEN 'lang' THEN (SELECT COUNT(*) FROM documents WHERE lang IS NULL)
      |      ELSE (SELECT COUNT(*) FROM documents WHERE source IS NULL) END AS new_nulls,
      |    CASE n.column_name
      |      WHEN 'doc_id' THEN (SELECT COUNT(DISTINCT doc_id) FROM documents)
      |      WHEN 'text' THEN (SELECT COUNT(DISTINCT text) FROM documents)
      |      WHEN 'n_chars' THEN (SELECT COUNT(DISTINCT n_chars) FROM documents)
      |      WHEN 'lang' THEN (SELECT COUNT(DISTINCT lang) FROM documents)
      |      ELSE (SELECT COUNT(DISTINCT source) FROM documents) END AS new_ndv
      |  FROM ns n)
      |SELECT COALESCE(os.column_name, nstats.column_name) AS "column",
      |  CASE WHEN os.old_type IS NULL THEN 'added'
      |       WHEN nstats.new_type IS NULL THEN 'removed'
      |       ELSE 'common' END AS status,
      |  CASE WHEN os.old_type IS NOT NULL AND nstats.new_type IS NOT NULL
      |       THEN os.old_type <> nstats.new_type ELSE false END AS type_changed,
      |  os.old_type, nstats.new_type,
      |  CAST(os.old_rows AS BIGINT) AS old_rows,
      |  CAST(os.old_nulls AS BIGINT) AS old_nulls,
      |  CAST(os.old_ndv AS BIGINT) AS old_ndv,
      |  CAST(nstats.new_rows AS BIGINT) AS new_rows,
      |  CAST(nstats.new_nulls AS BIGINT) AS new_nulls,
      |  CAST(nstats.new_ndv AS BIGINT) AS new_ndv
      |FROM os FULL OUTER JOIN nstats ON nstats.column_name = os.column_name
      |ORDER BY "column"""".stripMargin

  // ---- q272: CUPED variance-reduced A/B readout ------------------------------

  /** CUPED experiment readout ([[graft.operators.Cuped.adjustedMeans]],
    * Deng et al. WSDM'13): users split into two arms by id parity,
    * pre-period spend (first 15 days) as the covariate, post-period
    * spend as the outcome. The oracle replays the unit aggregation,
    * every decimal-exact moment, pooled θ, and the adjusted arm means
    * — pinning the variance-reduction ALGEBRA, not just totals (q239
    * pins exposure accounting; this pins the sensitive readout on
    * top).
    */
  def cupedReadout(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Cuped
    val e = Tables(s, dir, "events")
    val cents = round(col("value") * lit(100d), 0).cast("long")
    val cut = lit("2024-01-16").cast("timestamp")
    Cuped.adjustedMeans(e, col("user_id"), (col("user_id") % 2).as("arm"),
        when(col("ts") < cut, cents).otherwise(lit(0L)),
        when(col("ts") >= cut, cents).otherwise(lit(0L)))
      .sortOnce(col("arm"))
  }

  private val q272Oracle: String =
    """WITH units AS (
      |  SELECT user_id AS unit, user_id % 2 AS arm,
      |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
      |      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS ux,
      |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
      |      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS uy
      |  FROM events GROUP BY 1, 2),
      |grand AS (
      |  -- cross products in HUGEINT, mirroring the operator's decimal(38)
      |  -- build: ux*uy in BIGINT overflows at warehouse unit totals
      |  SELECT COUNT(*) AS n_all, CAST(SUM(ux) AS BIGINT) AS sx_all,
      |    CAST(SUM(uy) AS BIGINT) AS sy_all,
      |    SUM(CAST(ux AS HUGEINT) * uy) AS sxy_all,
      |    SUM(CAST(ux AS HUGEINT) * ux) AS sxx_all
      |  FROM units),
      |arms AS (
      |  SELECT arm, COUNT(*) AS n_units, CAST(SUM(ux) AS BIGINT) AS sum_x,
      |    CAST(SUM(uy) AS BIGINT) AS sum_y
      |  FROM units GROUP BY 1)
      |SELECT arm, n_units, sum_x, sum_y,
      |  round(CAST(sum_y AS DOUBLE) / CAST(n_units AS DOUBLE), 6) AS mean_y_r,
      |  round(CAST(sum_y AS DOUBLE) / CAST(n_units AS DOUBLE)
      |    - (CAST(n_all * sxy_all - CAST(sx_all AS HUGEINT) * sy_all AS DOUBLE)
      |       / CAST(n_all * sxx_all - CAST(sx_all AS HUGEINT) * sx_all AS DOUBLE))
      |      * (CAST(sum_x AS DOUBLE) / CAST(n_units AS DOUBLE)
      |         - CAST(sx_all AS DOUBLE) / CAST(n_all AS DOUBLE)), 6) AS adj_mean_y_r,
      |  round(CAST(n_all * sxy_all - CAST(sx_all AS HUGEINT) * sy_all AS DOUBLE)
      |    / CAST(n_all * sxx_all - CAST(sx_all AS HUGEINT) * sx_all AS DOUBLE), 6) AS theta_r
      |FROM arms, grand ORDER BY arm""".stripMargin

  // ---- q273: multi-epoch shuffle schedule -------------------------------------

  /** Deterministic MULTI-EPOCH data-order schedule: epoch e's order is
    * the corpus sorted by `hash60(e || ':' || id)` (ties on id), each
    * epoch numbered by [[graft.operators.Packing.globalRowNumber]]'s
    * two-phase prefix sum — never a single-reducer window. Training
    * runs need every epoch to be a DIFFERENT deterministic permutation
    * (same-order epochs correlate gradient noise; nondeterministic
    * orders kill reproducibility/resume). Output: each epoch's first
    * ten schedule slots (pinning the ORDER itself) plus an in-data
    * permutation audit — n_rows ≡ distinct positions ≡ max position.
    */
  def epochSchedule(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Packing
    val d = docs(s, dir).select(col("doc_id")).localCheckpoint(false)
    val sched = (0 to 1).map { ep =>
      val ord = struct(
        TextFns.hash60(concat(lit(s"$ep:"), col("doc_id").cast("string"))).as("h"),
        col("doc_id").as("id"))
      Packing.globalRowNumber(d, ord).withColumn("epoch", lit(ep.toLong))
    }.reduce(_ unionByName _).localCheckpoint(false)
    val audit = sched.groupBy(col("epoch")).agg(count(lit(1)).as("n_rows"),
      countDistinct(col("pos")).as("n_distinct_pos"), max(col("pos")).as("max_pos"))
    sched.filter(col("pos") <= 10)
      .join(audit, "epoch")
      .select(col("epoch"), col("pos"), col("doc_id"), col("n_rows"),
        col("n_distinct_pos"), col("max_pos"))
      .sortOnce(col("epoch"), col("pos"))
  }

  private val q273Oracle: String = {
    val h = (ep: Int) => TextFns.hash60Sql(s"'$ep:' || CAST(doc_id AS VARCHAR)")
    s"""WITH sched AS (
       |  SELECT CAST(0 AS BIGINT) AS epoch, doc_id,
       |    row_number() OVER (ORDER BY ${h(0)}, doc_id) AS pos FROM documents
       |  UNION ALL
       |  SELECT CAST(1 AS BIGINT), doc_id,
       |    row_number() OVER (ORDER BY ${h(1)}, doc_id) FROM documents),
       |audit AS (
       |  SELECT epoch, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(COUNT(DISTINCT pos) AS BIGINT) AS n_distinct_pos,
       |    CAST(MAX(pos) AS BIGINT) AS max_pos
       |  FROM sched GROUP BY 1)
       |SELECT s.epoch, s.pos, s.doc_id, a.n_rows, a.n_distinct_pos, a.max_pos
       |FROM sched s JOIN audit a USING (epoch)
       |WHERE s.pos <= 10 ORDER BY epoch, pos""".stripMargin
  }

  // ---- q274: deterministic Poisson bootstrap CI -------------------------------

  /** Poisson-bootstrap confidence intervals
    * ([[graft.operators.Bootstrap.meanCi]], the Chamandy et al.
    * distributed bootstrap): per event type, a 95%-ish percentile CI
    * of the mean per-user spend from 100 deterministic replicas —
    * every (unit, replica) weight is an inverse-CDF draw on
    * `hash60(rep:unit)`, so the oracle replays ALL 100 resamples
    * weight-for-weight and the CI order statistics exactly. The
    * uncertainty-quantification leg the exact-AUC/threshold-sweep
    * family (q251/q252) was missing.
    */
  def bootstrapCi(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bootstrap
    val e = Tables(s, dir, "events")
    Bootstrap.meanCi(e, col("user_id"), col("event_type"),
        round(col("value") * lit(100d), 0).cast("long"),
        b = 100, loIdx = 3, hiIdx = 98)
      .select(col("group").as("event_type"), col("n_units"), col("mean_r"),
        col("lo_r"), col("hi_r"))
      .sortOnce(col("event_type"))
  }

  private val q274Oracle: String = {
    val h = TextFns.hash60Sql(
      "CAST(r.rep AS VARCHAR) || ':' || CAST(u.unit AS VARCHAR)")
    s"""WITH units AS (
       |  SELECT event_type AS grp, user_id AS unit,
       |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS uv
       |  FROM events GROUP BY 1, 2),
       |point AS (
       |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_units,
       |    CAST(SUM(uv) AS BIGINT) AS sv FROM units GROUP BY 1),
       |weighted AS (
       |  SELECT u.grp, u.uv, r.rep,
       |    CASE WHEN $h % 1000000 < 367879 THEN 0
       |         WHEN $h % 1000000 < 735759 THEN 1
       |         WHEN $h % 1000000 < 919699 THEN 2
       |         WHEN $h % 1000000 < 981012 THEN 3
       |         WHEN $h % 1000000 < 996340 THEN 4 ELSE 5 END AS w
       |  FROM units u, (SELECT unnest(range(1, 101)) AS rep) r),
       |reps AS (
       |  SELECT grp, rep, CAST(SUM(w * uv) AS BIGINT) AS swv,
       |    CAST(SUM(w) AS BIGINT) AS sw
       |  FROM weighted GROUP BY 1, 2),
       |ranked AS (
       |  SELECT grp, rep, CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) AS m,
       |    row_number() OVER (PARTITION BY grp
       |      ORDER BY CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE), rep) AS rnk
       |  FROM reps WHERE sw > 0)
       |SELECT p.grp AS event_type, p.n_units,
       |  round(CAST(p.sv AS DOUBLE) / CAST(p.n_units AS DOUBLE), 6) AS mean_r,
       |  round(lo.m, 6) AS lo_r, round(hi.m, 6) AS hi_r
       |FROM point p
       |-- LEFT joins mirror Bootstrap.meanCi: a group whose requested
       |-- order statistic fell to zero-weight replicas surfaces with
       |-- NULL CI bounds instead of vanishing
       |LEFT JOIN ranked lo ON lo.grp = p.grp AND lo.rnk = 3
       |LEFT JOIN ranked hi ON hi.grp = p.grp AND hi.rnk = 98
       |ORDER BY event_type""".stripMargin
  }

  // ---- q275/q276: Welch t and exact Mann–Whitney U ---------------------------

  /** Welch unequal-variance t per event type between the parity arms
    * ([[graft.operators.AbTests.welch]]): the parametric inference leg
    * of the experiment family (q272 CUPED point estimates, q274
    * bootstrap intervals). Exact decimal moments; the oracle replays
    * t and the Welch–Satterthwaite df expression-shape-identically.
    */
  def welchReadout(s: SparkSession, dir: String): DataFrame =
    graft.operators.AbTests.welch(Tables(s, dir, "events"),
        col("user_id"), col("event_type"), (col("user_id") % 2).as("arm"),
        round(col("value") * lit(100d), 0).cast("long"))
      .select(col("group").as("event_type"), col("n0"), col("n1"),
        col("mean0_r"), col("mean1_r"), col("t_r"), col("df_r"))
      .sortOnce(col("event_type"))

  private val q275Oracle: String =
    """WITH units AS (
      |  SELECT event_type AS grp, user_id AS unit, user_id % 2 AS arm,
      |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS uy
      |  FROM events GROUP BY 1, 2, 3),
      |arms AS (
      |  SELECT grp, arm, COUNT(*) AS n, CAST(SUM(uy) AS BIGINT) AS s1,
      |    SUM(CAST(uy AS HUGEINT) * uy) AS s2
      |  FROM units GROUP BY 1, 2),
      |m AS (
      |  SELECT grp, arm, n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
      |      / CAST(n * (n - 1) AS DOUBLE) AS varr
      |  FROM arms),
      |j AS (
      |  SELECT a0.grp, a0.n AS n0, a1.n AS n1, a0.mean AS m0, a1.mean AS m1,
      |    a0.varr / CAST(a0.n AS DOUBLE) AS se0, a1.varr / CAST(a1.n AS DOUBLE) AS se1
      |  FROM m a0 JOIN m a1 ON a1.grp = a0.grp AND a0.arm = 0 AND a1.arm = 1)
      |SELECT grp AS event_type, n0, n1,
      |  round(m0, 6) AS mean0_r, round(m1, 6) AS mean1_r,
      |  round((m0 - m1) / sqrt(se0 + se1), 6) AS t_r,
      |  round((se0 + se1) * (se0 + se1)
      |    / (se0 * se0 / CAST(n0 - 1 AS DOUBLE)
      |       + se1 * se1 / CAST(n1 - 1 AS DOUBLE)), 6) AS df_r
      |FROM j ORDER BY event_type""".stripMargin

  /** Exact tie-corrected Mann–Whitney U per event type
    * ([[graft.operators.AbTests.mannWhitneyU]]): the nonparametric leg
    * — heavy-tailed spend distributions violate the t-test's variance
    * assumptions, and the U statistic is pure integer arithmetic here
    * (×2 double-ranks keep tie-averaged ranks in ℤ), so the pin is
    * hash-exact with no floating point anywhere.
    */
  def mannWhitneyReadout(s: SparkSession, dir: String): DataFrame =
    graft.operators.AbTests.mannWhitneyU(Tables(s, dir, "events"),
        col("user_id"), col("event_type"), (col("user_id") % 2).as("arm"),
        round(col("value") * lit(100d), 0).cast("long"))
      .select(col("group").as("event_type"), col("n0"), col("n1"),
        col("u0_x2"), col("u1_x2"))
      .sortOnce(col("event_type"))

  private val q276Oracle: String =
    """WITH units AS (
      |  SELECT event_type AS grp, user_id AS unit, user_id % 2 AS arm,
      |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS uy
      |  FROM events GROUP BY 1, 2, 3),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY grp ORDER BY uy, unit) AS rnk
      |  FROM units),
      |ties AS (
      |  SELECT grp, uy, MIN(rnk) AS lo, MAX(rnk) AS hi
      |  FROM ranked GROUP BY 1, 2),
      |arms AS (
      |  SELECT r.grp, r.arm, COUNT(*) AS n,
      |    CAST(SUM(t.lo + t.hi) AS BIGINT) AS rsum2
      |  FROM ranked r JOIN ties t ON t.grp = r.grp AND t.uy = r.uy
      |  GROUP BY 1, 2)
      |SELECT a0.grp AS event_type,
      |  a0.n AS n0, a1.n AS n1,
      |  CAST(a0.rsum2 - a0.n * (a0.n + 1) AS BIGINT) AS u0_x2,
      |  CAST(a1.rsum2 - a1.n * (a1.n + 1) AS BIGINT) AS u1_x2
      |FROM arms a0 JOIN arms a1 ON a1.grp = a0.grp AND a0.arm = 0 AND a1.arm = 1
      |ORDER BY event_type""".stripMargin

  // ---- q299: Wald SPRT sequential monitor ------------------------------------

  /** Always-valid sequential monitoring ([[graft.operators.AbTests
    * .sprtMonitor]]) — the "peek every day" leg the fixed-horizon
    * tests (q272–q276) can't cover, deployed as its classic use:
    * sample-ratio-mismatch detection. Two monitored assignments over
    * the event stream — `half` (user_id mod 2, genuinely balanced) and
    * `skew` (user_id mod 4 < 3, a planted 75% imbalance) — each tested
    * H0: p = 1/2 vs H1: p = 3/4 at α = β = 0.05. Micro-log2 constants:
    * success +⌊10⁶·log2(3/2)⌋ = 584962, failure −10⁶ exactly, bound
    * ±⌊10⁶·log2(19)⌋ = 4247927 — all int64, so the oracle replays
    * trial accumulation, crossing detection, and the sticky decision
    * bit-for-bit. The pin exercises all THREE states: `skew` crosses
    * h1 and `half` drifts to h0 within day 1 (hundreds of trials/day
    * dwarf the ~30-trial decision horizon), while `sparse` monitors a
    * ~1% event slice whose daily trial count is small enough that the
    * monitor reports `continue` for several days before deciding — the
    * sequential behavior itself, in-data. One hash aggregate to the
    * (experiment × day) frame; windows on that tiny frame only.
    */
  def sprtSrmMonitor(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
      .select(col("ts"), col("user_id"), col("event_id"))
    val half = e.select(lit("half").as("exp_id"), col("ts"),
      (col("user_id") % 2 === 0).as("succ"))
    val skew = e.select(lit("skew").as("exp_id"), col("ts"),
      (col("user_id") % 4 < 3).as("succ"))
    val sparse = e.filter(col("event_id") % 97 === 0)
      .select(lit("sparse").as("exp_id"), col("ts"),
        (col("user_id") % 2 === 0).as("succ"))
    graft.operators.AbTests.sprtMonitor(
        half.unionByName(skew).unionByName(sparse),
        col("exp_id"), date_trunc("day", col("ts")), col("succ"),
        llrSuccU = 584962L, llrFailU = -1000000L, boundU = 4247927L)
      .sortOnce(col("exp_id"), col("day"))
  }

  private val q299Oracle: String =
    """WITH trials AS (
      |  SELECT 'half' AS exp_id, date_trunc('day', ts) AS day,
      |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS succ FROM events
      |  UNION ALL
      |  SELECT 'skew', date_trunc('day', ts),
      |    CASE WHEN user_id % 4 < 3 THEN 1 ELSE 0 END FROM events
      |  UNION ALL
      |  SELECT 'sparse', date_trunc('day', ts),
      |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END
      |  FROM events WHERE event_id % 97 = 0),
      |daily AS (
      |  SELECT exp_id, day, COUNT(*) AS n_d, SUM(succ) AS s_d
      |  FROM trials GROUP BY 1, 2),
      |cum AS (
      |  SELECT exp_id, day,
      |    CAST(SUM(n_d) OVER w AS BIGINT) AS n,
      |    CAST(SUM(s_d) OVER w AS BIGINT) AS s
      |  FROM daily
      |  WINDOW w AS (PARTITION BY exp_id ORDER BY day ROWS UNBOUNDED PRECEDING)),
      |llr AS (
      |  SELECT exp_id, day, n, s,
      |    CAST(s * 584962 - (n - s) * 1000000 AS BIGINT) AS llr_u
      |  FROM cum),
      |cr AS (
      |  SELECT *,
      |    MIN(CASE WHEN llr_u >= 4247927 THEN day END)
      |      OVER (PARTITION BY exp_id) AS h1_day,
      |    MIN(CASE WHEN llr_u <= -4247927 THEN day END)
      |      OVER (PARTITION BY exp_id) AS h0_day
      |  FROM llr)
      |SELECT exp_id, day, n, s, llr_u,
      |  CASE WHEN h1_day IS NOT NULL AND (h0_day IS NULL OR h1_day <= h0_day)
      |         AND day >= h1_day THEN 'h1'
      |       WHEN h0_day IS NOT NULL AND (h1_day IS NULL OR h0_day < h1_day)
      |         AND day >= h0_day THEN 'h0'
      |       ELSE 'continue' END AS state
      |FROM cr ORDER BY exp_id, day""".stripMargin

  // ---- q277: exact half-life decay scoring -------------------------------------

  /** Recency-weighted engagement scoring with an EXACT half-life: the
    * classic feature `Σ value·2^(−age/h)` is irrational per-day, so
    * engines disagree in the last ulp — the step form
    * `2^(−⌊age_days/h⌋)` keeps the half-life semantics and becomes a
    * pure integer SHIFT in ×2²⁰ fixed point (`1048576 >> steps`,
    * steps capped at 20 — anything older than 20 half-lives
    * contributes an exact 0). Per-row codegen weight, one group
    * shuffle, hash-exact across engines — the decay idiom the
    * EWMA (q226) and dwell (q238) family uses, applied to calendar
    * half-lives.
    */
  def decayScore(s: SparkSession, dir: String): DataFrame = {
    val age = datediff(lit("2024-01-31").cast("date"), col("ts").cast("date"))
    val steps = least(call_function("div", age.cast("long"), lit(7L)), lit(20L))
    val w = call_function("shiftright", lit(1048576L), steps.cast("int"))
    Tables(s, dir, "events")
      .select(col("event_type"), col("user_id"),
        (round(col("value") * lit(100d), 0).cast("long") * w).as("dv"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("dv")).as("score_x220"),
        max_by(col("user_id"), struct(col("dv"), -col("user_id"))).as("top_user"))
      .sortOnce(col("event_type"))
  }

  private val q277Oracle: String =
    """WITH d AS (
      |  SELECT event_type, user_id,
      |    CAST(round(value * 100, 0) AS BIGINT)
      |      * (1048576 >> LEAST(datediff('day', CAST(ts AS DATE), DATE '2024-01-31') // 7, 20))
      |      AS dv
      |  FROM events)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(dv) AS BIGINT) AS score_x220,
      |  (SELECT d2.user_id FROM d d2 WHERE d2.event_type = d.event_type
      |   ORDER BY d2.dv DESC, d2.user_id LIMIT 1) AS top_user
      |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- q278: near-dup label-conflict audit --------------------------------------

  /** Label-noise detector over the near-dup graph: if two documents
    * are near-duplicates but carry DIFFERENT labels, at most one label
    * can be right — and if they straddle train/eval, the model is
    * graded on memorizing a contradiction (the q263 cluster-safe split
    * prevents the straddle; this audit finds the noise itself). Pairs
    * from the exact-Jaccard≥0.8 chain, labels joined from the
    * embedding table's labeled overlap on both endpoints, aggregated
    * into the (label_lo, label_hi) matrix — off-diagonal cells ARE the
    * conflicts. One pair plan + two label joins (the label table
    * broadcasts), nothing all-pairs.
    */
  def labelConflictAudit(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.nearDupPairs(docs(s, dir), col("doc_id"), col("text"),
        threshold = 0.8)
      .select(col("doc_a"), col("doc_b"))
    val lab = emb(s, dir).select(col("vec_id"), col("label").cast("long").as("label"))
    pairs
      .join(lab.select(col("vec_id").as("doc_a"), col("label").as("la")), "doc_a")
      .join(lab.select(col("vec_id").as("doc_b"), col("label").as("lb")), "doc_b")
      .groupBy(least(col("la"), col("lb")).as("label_lo"),
        greatest(col("la"), col("lb")).as("label_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_conflict", col("label_lo") =!= col("label_hi"))
      .sortOnce(col("label_lo"), col("label_hi"))
  }

  private val q278Oracle: String =
    s"""WITH $shingleCtes,
       |lab AS (SELECT vec_id, label FROM embeddings),
       |j AS (
       |  SELECT LEAST(a.label, b.label) AS label_lo,
       |    GREATEST(a.label, b.label) AS label_hi
       |  FROM exact e
       |  JOIN lab a ON a.vec_id = e.doc_a
       |  JOIN lab b ON b.vec_id = e.doc_b)
       |SELECT label_lo, label_hi, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  label_lo <> label_hi AS is_conflict
       |FROM j GROUP BY 1, 2 ORDER BY label_lo, label_hi""".stripMargin

  // ---- q279: rendezvous-hash shard routing ---------------------------------------

  private val ShardList = ('A' to 'I').map(_.toString)

  /** Rendezvous routing with the minimal-disruption law pinned IN-DATA
    * ([[graft.operators.Rendezvous.assign]]): every doc routed under 9
    * shards and under 9+1; per new-topology shard the output carries
    * how many docs MOVED — rendezvous guarantees movement lands ONLY
    * on the added shard (n_moved = n_docs there, exact 0 everywhere
    * else), which the oracle replays assignment-for-assignment. The
    * `key mod N` strawman would remap ~90% of the corpus on the same
    * change.
    */
  def rendezvousShards(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Rendezvous
    val d = docs(s, dir).select(col("doc_id"))
      .withColumn("s9", Rendezvous.assign(col("doc_id"), ShardList))
      .withColumn("s10", Rendezvous.assign(col("doc_id"), ShardList :+ "J"))
    d.groupBy(col("s10").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s9") =!= col("s10"), 1L).otherwise(0L)).as("n_moved"))
      .sortOnce(col("shard"))
  }

  private val q279Oracle: String = {
    val h = TextFns.hash60Sql("s.sh || ':' || CAST(doc_id AS VARCHAR)")
    s"""WITH cand AS (
       |  SELECT doc_id, s.sh, $h AS h
       |  FROM documents, (SELECT unnest(['A','B','C','D','E','F','G','H','I','J']) AS sh) s),
       |a10 AS (
       |  SELECT doc_id, sh AS s10 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, sh DESC) AS rn
       |    FROM cand) WHERE rn = 1),
       |a9 AS (
       |  SELECT doc_id, sh AS s9 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, sh DESC) AS rn
       |    FROM cand WHERE sh <> 'J') WHERE rn = 1)
       |SELECT a10.s10 AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN a9.s9 <> a10.s10 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
       |FROM a10 JOIN a9 USING (doc_id)
       |GROUP BY 1 ORDER BY shard""".stripMargin
  }

  // ---- q280: incremental IVF assignment maintenance ------------------------

  /** Incremental ANN/IVF routing maintenance pinned incremental ≡ full
    * ([[graft.operators.Similarity.incrementalAssignments]] — the
    * vector-index leg closing the crawl-incremental chain of
    * q258/q259/q262/q265): a previous crawl is simulated as the
    * embeddings table minus `vec_id % 7 = 3` (added since), with
    * `vec_id % 5 = 0` vectors carrying an older revision (the REVERSED
    * embedding — changed since, and replayable in SQL), plus a batch of
    * since-removed ids beyond the corpus. Its [[graft.operators
    * .Similarity.assignmentStore]] under the fixed first-8 centroid set
    * is PERSISTED (parquet under Staging.ensureFresh, keyed on the
    * corpus source-sig), then `incrementalAssignments` maintains it
    * against the full table: only added/changed vectors are re-scored
    * (the spec asserts the compute set; the operator `observe`s it),
    * unchanged ids keep their stored bucket, removed ids drop. The
    * output joins the prev store back for a per-vector `moved` flag —
    * the drift signal [[graft.operators.Similarity.assignmentDrift]]
    * aggregates into the retrain trigger. The oracle recomputes every
    * assignment from scratch (q25's argmax-cosine CTE), the provenance
    * from the delta definition, and `moved` by replaying the OLD
    * revision's assignment — a green row proves the maintained routing
    * is bit-identical to a full re-assignment at O(delta) scoring cost.
    */
  def incrAssignMaintain(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < NumCentroids)
    val isOld = col("vec_id") % 7 =!= 3
    // Palindromic embeddings are EXCLUDED from the changed set: their
    // reversed "old revision" is bit-identical, so diffStored correctly
    // classifies them unchanged while a %5-only provenance oracle would
    // hardcode 'computed' — a latent data-dependent divergence. The
    // oracle replays the same exclusion (v <> list_reverse(v)).
    val isChanged = (col("vec_id") % 5 === 0) && isOld &&
      (col("embedding") =!= reverse(col("embedding")))
    // removed-vector fake ids must land OUTSIDE the corpus id range at
    // any SF (q258's sf1 lesson: fixed shifts collide with replica
    // offsets)
    val shift = e.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val prevCrawl = e.filter(isOld && !isChanged)
      .unionByName(e.filter(isChanged)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding")))
      .unionByName(e.filter(col("vec_id") % 13 === 1)
        .select((col("vec_id") + 2 * shift).as("vec_id"), col("embedding")))
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val storeP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"assign_store_$tag")
    graft.Staging.ensureFresh(
      java.nio.file.Paths.get(dir, "embeddings.parquet"), storeP) {
      Similarity.assignmentStore(prevCrawl, cents)
        .write.mode("overwrite").parquet(storeP.toString)
    }
    val prevStore = s.read.parquet(storeP.toString)
    Similarity.incrementalAssignments(e, prevStore, cents)
      .join(prevStore.select(col("vec_id"), col("centroid_id").as("prev_cid")),
        Seq("vec_id"), "left")
      .select(col("vec_id"), col("centroid_id"), col("src"),
        (col("prev_cid").isNotNull && col("prev_cid") =!= col("centroid_id"))
          .as("moved"))
      .sortOnce(col("vec_id"))
  }

  private val q280Oracle: String = {
    val cos = "list_cosine_similarity(t.v, i.c)"
    def argmax(src: String, out: String) =
      s"""$out AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT t.vec_id, i.cid,
         |      row_number() OVER (PARTITION BY t.vec_id
         |        ORDER BY $cos DESC, i.cid) AS rn
         |    FROM $src t, cents i) WHERE rn = 1)""".stripMargin
    s"""WITH cents AS (
       |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
       |  FROM embeddings WHERE vec_id < $NumCentroids),
       |cur AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |old AS (
       |  SELECT vec_id, list_reverse(CAST(embedding AS DOUBLE[])) AS v
       |  FROM embeddings WHERE vec_id % 5 = 0 AND vec_id % 7 <> 3
       |    AND CAST(embedding AS DOUBLE[])
       |      <> list_reverse(CAST(embedding AS DOUBLE[]))),
       |${argmax("cur", "assigned")},
       |${argmax("old", "prev")}
       |SELECT a.vec_id, a.cid AS centroid_id,
       |  CASE WHEN a.vec_id % 7 = 3 OR (a.vec_id % 5 = 0
       |      AND c.v <> list_reverse(c.v)) THEN 'computed'
       |       ELSE 'retained' END AS src,
       |  COALESCE(p.cid <> a.cid, FALSE) AS moved
       |FROM assigned a JOIN cur c USING (vec_id)
       |LEFT JOIN prev p USING (vec_id)
       |ORDER BY a.vec_id""".stripMargin
  }

  // ---- q282: incremental inverted-index maintenance ------------------------

  /** Incremental postings/inverted-index maintenance pinned incremental
    * ≡ full ([[graft.operators.Retrieval.incrementalPostings]] — the
    * RETRIEVAL leg of the crawl-incremental chain, q259/q262/q265/q280's
    * discipline): the same simulated crawl as q259 (1/7 added since,
    * 1/5 carrying an older " legacy rev" revision, a removed batch
    * beyond the id range), its [[graft.operators.Retrieval
    * .postingsStore]] persisted under Staging.ensureFresh, then
    * maintained against the full corpus — only added/changed docs are
    * re-tokenized, unchanged keep their posting rows, removed drop.
    * Output is the per-term index the BM25 scorer actually consumes
    * (df, Σtf) plus per-term computed-doc provenance; the oracle
    * rebuilds the whole index from scratch in DuckDB and derives the
    * provenance from the delta definition — a green row proves index
    * freshness costs O(delta) tokenization, never O(corpus).
    */
  def incrPostingsMaintain(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Retrieval
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val isOld = col("doc_id") % 7 =!= 3
    val isChanged = (col("doc_id") % 5 === 0) && isOld
    val shift = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val prevCrawl = d.filter(isOld && !isChanged)
      .unionByName(d.filter(isChanged)
        .select(col("doc_id"), concat(col("text"), lit(" legacy rev")).as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 2 * shift).as("doc_id"), col("text")))
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val storeP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"postings_store_$tag")
    graft.Staging.ensureFresh(
      java.nio.file.Paths.get(dir, "documents.parquet"), storeP) {
      Retrieval.postingsStore(prevCrawl, col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(storeP.toString)
    }
    val prevStore = s.read.parquet(storeP.toString)
    Retrieval.incrementalPostings(d, prevStore, col("doc_id"), col("text"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_sum"),
        sum((col("src") === "computed").cast("long")).as("n_computed"))
      .sortOnce(col("term"))
  }

  private val q282Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |post AS (
      |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM toks GROUP BY 1, 2)
      |SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
      |  CAST(SUM(tf) AS BIGINT) AS tf_sum,
      |  CAST(SUM(CASE WHEN doc_id % 7 = 3 OR doc_id % 5 = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_computed
      |FROM post GROUP BY term ORDER BY term""".stripMargin

  // ---- q287: incremental VERIFIED near-dup maintenance ----------------------

  /** The verified-pair leg closing the crawl-incremental text-dedup
    * chain ([[graft.operators.Dedup.incrementalMinhashNearDups]] —
    * q259 signatures → q262 candidates → HERE → q265 components): the
    * same simulated crawl, its previous VERIFIED pair set from a full
    * [[graft.operators.Dedup.minhashNearDups]] over the prev crawl,
    * then maintenance: survivor candidates carry their previous Jaccard
    * verbatim (both texts unchanged ⇒ Jaccard unchanged — including
    * previously FAILED survivors staying failed), and only new
    * candidates are verified, re-shingling only the docs those pairs
    * touch. The oracle is q23's full from-scratch replay (banding →
    * candidates → exact Jaccard ≥ 0.8), so a green row proves the
    * maintained verified set — membership AND every jacc value — is
    * bit-identical to a full re-index at O(pair-delta) shingling cost.
    */
  def incrVerifiedNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val isOld = col("doc_id") % 7 =!= 3
    val isChanged = (col("doc_id") % 5 === 0) && isOld
    val shift = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    // EAGER checkpoints (q290's measured lesson): these shared stages
    // fan out to several consumer stages of one action, and stages racing
    // a not-yet-persisted lazy checkpoint recompute its subtree.
    val prevCrawl = d.filter(isOld && !isChanged)
      .unionByName(d.filter(isChanged)
        .select(col("doc_id"), concat(col("text"), lit(" legacy rev")).as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 2 * shift).as("doc_id"), col("text")))
      .localCheckpoint(true) // feeds store AND the prev full verify
    val prevStore = Dedup.signatureStore(prevCrawl, col("doc_id"), col("text"), NumPerms)
      .localCheckpoint(true)
    val prevPairs = Dedup.lshCandidates(prevStore, NumPerms, RowsPerBand)
      .localCheckpoint(true)
    // The prev VERIFIED set, served from the already-materialized store
    // and candidate pairs instead of a second from-scratch signature +
    // banding pass: with every candidate marked 'new' and no survivors,
    // incrementalMinhashNearDups degenerates to exactly minhashNearDups'
    // verification (same candidates — prevPairs IS lshCandidates over
    // the store's signatures — same string-shingle Jaccard, shingling
    // only pair-touched docs). Eager checkpoint keeps its observe node
    // out of the maintenance action's plan (observed-metric names must
    // be unique per query).
    val prevVerified = Dedup.incrementalMinhashNearDups(prevCrawl,
        col("doc_id"), col("text"),
        prevPairs.withColumn("origin", lit("new")),
        prevPairs.select(col("doc_a"), col("doc_b"), lit(0.0).as("jacc")).limit(0),
        threshold = 0.8)
      .localCheckpoint(true)
    val store = Dedup.incrementalSignatures(d, prevStore, col("doc_id"), col("text"), NumPerms)
    // CHECKED maintenance: a cap-crossing bucket's re-expanded pairs
    // arrive as origin=new, so this verify step covers them fresh — the
    // maintained VERIFIED set inherits the unconditional ≡-full pin.
    val pairs = Dedup.incrementalLshPairsChecked(prevStore, store, prevPairs,
      NumPerms, RowsPerBand)
    Dedup.incrementalMinhashNearDups(d, col("doc_id"), col("text"),
        pairs, prevVerified, threshold = 0.8)
      .sortOnce(col("doc_a"), col("doc_b"))
  }

  // ---- q290: incremental containment maintenance -----------------------------

  /** The ASYMMETRIC leg of the crawl-incremental dedup chain pinned
    * incremental ≡ full ([[graft.operators.Dedup
    * .incrementalContainmentPairs]] — q284's directed subset-clone
    * relation under q287's survivor discipline): the same simulated
    * crawl (1/7 added, 1/5 " legacy rev" changed, a removed batch
    * beyond the id range), the previous crawl's [[graft.operators.Dedup
    * .containmentIndex]] + full [[graft.operators.Dedup
    * .containmentPairs]] output, then maintenance: survivor pairs carry
    * BOTH ppm ratios verbatim, computed prefixes probe the whole
    * maintained index while retained prefixes probe only computed
    * postings (the direction computed-only probing provably misses),
    * and only pair-touched docs re-shingle for verification. The oracle
    * is q284's full from-scratch replay at the same threshold, so a
    * green row proves the maintained directed-containment set —
    * membership AND both ppm values — is bit-identical to a full
    * re-probe at O(delta) cost.
    */
  def incrContainmentMaintain(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val isOld = col("doc_id") % 7 =!= 3
    val isChanged = (col("doc_id") % 5 === 0) && isOld
    val shift = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    // EAGER checkpoints, deliberately breaking this file's lazy
    // convention: the shared stages here (prev index, prev full probe,
    // maintained store) are heavy AND fan out to several downstream
    // stages of ONE action — concurrently-launched consumer stages race
    // the not-yet-persisted lazy checkpoint and recompute its subtree
    // (measured 3.4× total cost at sf1ci: 130.8 s lazy vs ~43 s staged).
    // Eager materialization pays each stage exactly once.
    val prevCrawl = d.filter(isOld && !isChanged)
      .unionByName(d.filter(isChanged)
        .select(col("doc_id"), concat(col("text"), lit(" legacy rev")).as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 2 * shift).as("doc_id"), col("text")))
      .localCheckpoint(true) // feeds the prev index AND the prev full probe
    val prevStore = Dedup.containmentIndex(prevCrawl, col("doc_id"), col("text"),
        threshold = 0.9)
      .localCheckpoint(true) // diff slice + retained carry
    // The prev FULL pair set, served from the already-materialized index
    // instead of a second from-scratch posting/df/prefix build: with an
    // all-'computed' store and no survivors, incrementalContainmentPairs
    // degenerates to exactly containmentPairs' candidate generation
    // (every stored prefix probes every stored posting) and the same
    // string-shingle verification — identical pairs and ppm values, one
    // whole index construction saved.
    val noPairs = d.select(col("doc_id").as("doc_a"), col("doc_id").as("doc_b"),
      lit(0L).as("cont_ab_ppm"), lit(0L).as("cont_ba_ppm")).limit(0)
    val prevPairs = Dedup.incrementalContainmentPairs(prevCrawl,
        col("doc_id"), col("text"), prevStore, noPairs, threshold = 0.9)
      .localCheckpoint(true) // survivor join input, built before maintenance runs
    val store = Dedup.incrementalContainmentIndex(d, prevStore,
        col("doc_id"), col("text"), threshold = 0.9)
      .localCheckpoint(true) // probe legs + survivor id slices
    Dedup.incrementalContainmentPairs(d, col("doc_id"), col("text"),
        store, prevPairs, threshold = 0.9)
      .sortOnce(col("doc_a"), col("doc_b"))
  }

  // ---- q296: incremental SimHash near-dup maintenance -------------------------

  /** The HAMMING-family leg closing the crawl-incremental index chain
    * across EVERY fingerprint family ([[graft.operators.Dedup
    * .incrementalHammingNearDups]] — after minhash q259/q262/q287,
    * containment q290, postings q282, IVF q280, phash q258): the same
    * simulated crawl, its previous [[graft.operators.Dedup
    * .simhashStore]] and full q46 pair set, then maintenance — only
    * added/changed docs re-hash, fresh candidates come only from Manku
    * bands containing a computed member, and verification is ONE
    * `bit_count(xor)` per candidate against STORED fingerprints (the
    * hamming family's structural advantage: no re-shingling even at
    * verify time). Survivors carry their hamming verbatim. The oracle
    * is q46's full from-scratch replay — maintained ≡ full at the
    * family's default no-drop cap, unconditionally.
    */
  def incrSimhashMaintain(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val isOld = col("doc_id") % 7 =!= 3
    val isChanged = (col("doc_id") % 5 === 0) && isOld
    val shift = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val prevCrawl = d.filter(isOld && !isChanged)
      .unionByName(d.filter(isChanged)
        .select(col("doc_id"), concat(col("text"), lit(" legacy rev")).as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 2 * shift).as("doc_id"), col("text")))
    // prevCrawl itself is deliberately NOT checkpointed: caching the full
    // text corpus eagerly OOMs the 8g verify JVM at sf1ci, and its two
    // consumers only re-run a narrow union-of-filters parquet scan. The
    // small derived stores below ARE eager (q290's lazy-race lesson).
    val prevStore = Dedup.simhashStore(prevCrawl, col("doc_id"), col("text"))
      .localCheckpoint(true)
    // prevPairs is materialized FIRST and to DISK: left lazy, its giant
    // bucket expansion (43M pairs on the sf1 replica corpus) runs
    // CONCURRENTLY with the fresh leg's expansion inside the one
    // maintenance action — independent stages launch in parallel — and
    // the two explosions together OOM the 8g verify JVM. DISK_ONLY
    // (not localCheckpoint's MEMORY_AND_DISK) because a 43M-row pair
    // set resident on-heap would also starve the fresh leg's per-bucket
    // pair arrays, which allocate outside Spark's managed memory.
    // spareBlocks = 2 on BOTH legs — the same candidate-volume lever
    // q46 carries (3 bands of 2-block keys instead of two 16-bit
    // halves): near-miss twins that keep one 16-bit half intact no
    // longer collide, cutting the verify volume of the 43M-pair prev
    // expansion AND the fresh delta leg. Answer-invariant (pigeonhole
    // completeness at any s; every candidate exact-verified), so the
    // q46-full-replay oracle is untouched.
    // Served from the ALREADY-materialized store fingerprints:
    // simhashNearDups(prevCrawl) ≡ hammingNearDups(simhash(prevCrawl))
    // and prevStore.simhash IS simhash(prevCrawl) — feeding the store
    // avoids re-shingling + re-hashing the whole prev corpus a second
    // time for the pair leg.
    val prevPairs = Dedup.hammingNearDups(
        prevStore.select(col("doc_id"), col("simhash").as("fp")),
        maxHamming = 1, bits = 32, spareBlocks = 2)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    prevPairs.count()
    val store = Dedup.incrementalSimhash(d, prevStore, col("doc_id"), col("text"))
      .localCheckpoint(true)
    Dedup.incrementalHammingNearDups(
        store.select(col("doc_id"), col("simhash").as("fp"), col("src")),
        prevPairs, maxHamming = 1, bits = 32, spareBlocks = 2)
      .sortOnce(col("doc_a"), col("doc_b"))
  }

  // ---- q295: IVF search served from the MAINTAINED routing store -------------

  /** The consumption half of q280's claim, pinned (the ANN sibling of
    * q293): q25's full IVF search battery (first-20 queries, top-3,
    * first-8 centroids) served FROM the incrementally-maintained
    * assignment store — [[graft.operators.Similarity
    * .incrementalAssignments]] over the simulated crawl, then
    * [[graft.operators.Similarity.ivfTopKFromAssignments]] joins the
    * corpus to its STORED buckets by id (zero corpus re-scoring at
    * query time; only the 20 ad-hoc queries score against the
    * broadcast centroids). The oracle is q25's from-scratch replay
    * verbatim — a green row proves a crawl-maintained routing store
    * serves searches bit-identical to re-assigning the corpus.
    */
  def ivfFromMaintained(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = emb(s, dir).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < NumCentroids)
    val isOld = col("vec_id") % 7 =!= 3
    val isChanged = (col("vec_id") % 5 === 0) && isOld &&
      (col("embedding") =!= reverse(col("embedding")))
    val shift = e.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val prevCrawl = e.filter(isOld && !isChanged)
      .unionByName(e.filter(isChanged)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding")))
      .unionByName(e.filter(col("vec_id") % 13 === 1)
        .select((col("vec_id") + 2 * shift).as("vec_id"), col("embedding")))
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val storeP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"assign_store_q295_$tag")
    graft.Staging.ensureFresh(
      java.nio.file.Paths.get(dir, "embeddings.parquet"), storeP) {
      Similarity.assignmentStore(prevCrawl, cents)
        .write.mode("overwrite").parquet(storeP.toString)
    }
    val prevStore = s.read.parquet(storeP.toString)
    val store = Similarity.incrementalAssignments(e, prevStore, cents)
      .localCheckpoint(true) // eager: q290's lazy-race lesson
    Similarity.ivfTopKFromAssignments(e, e.filter(col("vec_id") < NumQueries),
        store, cents, TopK)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("sim"), 6).as("sim_r"))
      .sortOnce(col("query_id"), col("rnk"))
  }

  // ---- q293: BM25 served from the MAINTAINED index ----------------------------

  /** The consumption half of q282's claim, pinned: "df/avgdl/BM25 all
    * derive from the store" becomes a hash-checked fact by serving
    * q115's full ranked-retrieval battery (20 queries × 3 hashed terms,
    * top-10) FROM the incrementally-maintained postings store —
    * [[graft.operators.Retrieval.incrementalPostings]] over the
    * simulated crawl, then [[graft.operators.Retrieval
    * .bm25FromPostings]] with the query-term vocabulary ALSO derived
    * from the store. The oracle is q115's from-scratch replay verbatim,
    * so a green row proves a crawl-maintained index serves rankings
    * bit-identical to re-tokenizing the corpus — the round-trip that
    * makes O(delta) index maintenance actually usable for serving.
    */
  def bm25FromMaintained(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Retrieval
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val isOld = col("doc_id") % 7 =!= 3
    val isChanged = (col("doc_id") % 5 === 0) && isOld
    val shift = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val prevCrawl = d.filter(isOld && !isChanged)
      .unionByName(d.filter(isChanged)
        .select(col("doc_id"), concat(col("text"), lit(" legacy rev")).as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 2 * shift).as("doc_id"), col("text")))
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val storeP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"postings_store_q293_$tag")
    graft.Staging.ensureFresh(
      java.nio.file.Paths.get(dir, "documents.parquet"), storeP) {
      Retrieval.postingsStore(prevCrawl, col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(storeP.toString)
    }
    val prevStore = s.read.parquet(storeP.toString)
    // eager: the maintained store feeds the vocab derivation AND the
    // scoring body's three aggregates (q290's lazy-race lesson)
    val store = Retrieval.incrementalPostings(d, prevStore,
        col("doc_id"), col("text"))
      .localCheckpoint(true)
    // q115's 20×3 hashed query-term construction, with the vocabulary
    // taken FROM the store (everything-derives-from-the-store)
    val vocab = store.select(col("term")).distinct()
      .withColumn("idx", row_number().over(Window.orderBy(col("term"))).cast("long") - 1)
    val vsize = vocab.agg(count(lit(1)).as("vsize"))
    val slots = s.range(20).select(col("id").as("query_id"))
      .crossJoin(s.range(3).select(col("id").as("slot")))
    val qterms = slots.crossJoin(broadcast(vsize))
      .withColumn("idx", TextFns.hash60(concat(lit("qry:"), col("query_id").cast("string"),
        lit(":"), col("slot").cast("string"))) % col("vsize"))
      .join(vocab, "idx")
      .select(col("query_id"), col("term"))
    Retrieval.bm25FromPostings(store, qterms, k = 10)
      .sortOnce(col("query_id"), col("rank"))
  }

  // ---- q297: hybrid sparse+dense retrieval — reciprocal-rank fusion ----------

  /** Hybrid retrieval, the serving shape every production RAG stack
    * runs ([[graft.operators.Retrieval.rrfFuse]]): the SPARSE leg is
    * q115's full BM25 battery (20 queries × 3 hashed terms, top-10) and
    * the DENSE leg is q24's brute cosine top-10 over the same 20 query
    * ids — the two id spaces coincide by construction (doc_id ≡ vec_id
    * for embedded docs), which is exactly how a real hybrid index is
    * keyed. Fusion is integer-ppm reciprocal rank (k_rrf = 60, the
    * published constant), so the fused ranking and its ties replay
    * bit-for-bit in the oracle's from-scratch SQL — both legs' rankers
    * AND the fusion arithmetic pinned in one row set. Scale: both legs
    * are top-k-bounded per query; fusion sees Q·k·2 rows, zero corpus
    * cost beyond the legs themselves.
    */
  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Retrieval
    val sparse = bm25Search(s, dir)
      .select(col("query_id"), col("doc_id").as("id"), col("rank"))
    val e = emb(s, dir)
    val dense = Similarity.bruteTopK(e, e.filter(col("vec_id") < NumQueries), 10)
      .select(col("query_id"), col("neighbor_id").as("id"), col("rnk").as("rank"))
    Retrieval.rrfFuse(Seq(sparse, dense), k = 5)
      .sortOnce(col("query_id"), col("rank"))
  }

  // lazy: embeds q115Oracle, which is declared later in the file
  private lazy val q297Oracle: String = {
    val cos = VectorFns.cosineSql("q.embedding", "c.embedding")
    s"""WITH sparse AS (
       |  SELECT query_id, doc_id AS id, CAST(rank AS BIGINT) AS rank
       |  FROM ($q115Oracle)),
       |dense AS (
       |  SELECT query_id, neighbor_id AS id, CAST(rnk AS BIGINT) AS rank FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC, c.vec_id) AS rnk
       |    FROM embeddings q, embeddings c
       |    WHERE q.vec_id < $NumQueries AND c.vec_id <> q.vec_id)
       |  WHERE rnk <= 10),
       |pooled AS (SELECT * FROM sparse UNION ALL SELECT * FROM dense),
       |fused AS (
       |  SELECT query_id, id,
       |    CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm,
       |    CAST(COUNT(*) AS BIGINT) AS n_legs
       |  FROM pooled GROUP BY 1, 2)
       |SELECT query_id, id, rrf_ppm, n_legs, CAST(rn AS INTEGER) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_ppm DESC, id) AS rn
       |  FROM fused) WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin
  }

  // ---- q303: ranking-churn audit across index maintenance ---------------------

  /** Serving-stability audit after a nightly crawl ([[graft.operators
    * .Retrieval.rankChurn]]): the q115 query battery is ranked against
    * BOTH the previous crawl's postings store and the
    * incrementally-maintained current store (q282/q293's machinery),
    * and per query the audit reports membership churn (docs
    * entering/leaving the top-10) plus ORDER churn over the common
    * docs as exact Kendall pair counts — tau as an exact integer
    * num/den pair (no float division; the numerator can be negative,
    * where floor-vs-trunc division forks engines). Query terms derive
    * from the MAINTAINED store's vocabulary so both rankings answer
    * the same battery. The oracle replays both corpora's fixed-point
    * BM25 chains and the pair counting from scratch. Both rank inputs
    * are k-bounded per query, so churn costs Q·k² — corpus-free.
    */
  def rankChurnAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Retrieval
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val isOld = col("doc_id") % 7 =!= 3
    val isChanged = (col("doc_id") % 5 === 0) && isOld
    val shift = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val prevCrawl = d.filter(isOld && !isChanged)
      .unionByName(d.filter(isChanged)
        .select(col("doc_id"), concat(col("text"), lit(" legacy rev")).as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 2 * shift).as("doc_id"), col("text")))
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val storeP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"postings_store_q303_$tag")
    graft.Staging.ensureFresh(
      java.nio.file.Paths.get(dir, "documents.parquet"), storeP) {
      Retrieval.postingsStore(prevCrawl, col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(storeP.toString)
    }
    val prevStore = s.read.parquet(storeP.toString)
    val store = Retrieval.incrementalPostings(d, prevStore,
        col("doc_id"), col("text"))
      .localCheckpoint(true) // vocab + scoring aggregates fan out (q290 lesson)
    // q115's 20×3 hashed query-term construction over the store vocab
    val vocab = store.select(col("term")).distinct()
      .withColumn("idx", row_number().over(Window.orderBy(col("term"))).cast("long") - 1)
    val vsize = vocab.agg(count(lit(1)).as("vsize"))
    val slots = s.range(20).select(col("id").as("query_id"))
      .crossJoin(s.range(3).select(col("id").as("slot")))
    val qterms = slots.crossJoin(broadcast(vsize))
      .withColumn("idx", TextFns.hash60(concat(lit("qry:"), col("query_id").cast("string"),
        lit(":"), col("slot").cast("string"))) % col("vsize"))
      .join(vocab, "idx")
      .select(col("query_id"), col("term"))
      .localCheckpoint(true) // both rankings consume the same battery
    val prevRank = Retrieval.bm25FromPostings(prevStore, qterms, k = 10)
    val curRank = Retrieval.bm25FromPostings(store, qterms, k = 10)
    Retrieval.rankChurn(prevRank, curRank)
      .sortOnce(col("query_id"))
  }

  /** Fixed-point BM25 scoring chain over CTEs `{pfx}tf`/`{pfx}df` and
    * the shared `qt` battery, ending in `{pfx}rk` (query_id, doc_id,
    * rank) — the q115 arithmetic parameterized by corpus prefix so
    * q303 can rank two corpora in one oracle without forking the
    * formula text. */
  private def bm25RkSql(pfx: String): String =
    s"""${pfx}stats AS (
       |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_tokens
       |  FROM (SELECT DISTINCT doc_id, dl FROM ${pfx}tf)),
       |${pfx}terms AS (
       |  SELECT qt.query_id, tf.doc_id, tf.tf, tf.dl, dfx.df,
       |    st.n_docs, st.total_tokens,
       |    ((st.n_docs + 1) * 1048576) // (dfx.df + 1) AS ratio
       |  FROM ${pfx}tf tf JOIN qt ON tf.term = qt.term
       |  JOIN ${pfx}df dfx ON tf.term = dfx.term, ${pfx}stats st),
       |${pfx}scored AS (
       |  SELECT query_id, doc_id,
       |    (length(format('{:b}', ratio)) - 1) * 1024
       |      + (ratio * 1024) // (CAST(1 AS BIGINT) << (length(format('{:b}', ratio)) - 1))
       |      - 1024 AS widf,
       |    (tf * 2200 * 1000)
       |      // (tf * 1000 + (1200 * (250 + (750 * dl * n_docs) // total_tokens)) // 1000)
       |      AS sat1000
       |  FROM ${pfx}terms),
       |${pfx}sc AS (
       |  SELECT query_id, doc_id, CAST(SUM(widf * sat1000) AS BIGINT) AS score
       |  FROM ${pfx}scored GROUP BY 1, 2),
       |${pfx}rk0 AS (
       |  SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |  FROM ${pfx}sc)""".stripMargin

  private val q303Oracle: String = {
    val qhash = TextFns.hash60Sql(
      "'qry:' || CAST(q.q AS VARCHAR) || ':' || CAST(sl.s AS VARCHAR)")
    s"""WITH prevdocs AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 5 = 0 THEN text || ' legacy rev' ELSE text END AS text
       |  FROM documents WHERE doc_id % 7 <> 3
       |  UNION ALL
       |  SELECT doc_id + 2 * (SELECT MAX(doc_id) + 1 FROM documents), text
       |  FROM documents WHERE doc_id % 13 = 1),
       |ctoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |cpost AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term FROM ctoks),
       |ctf AS (
       |  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM cpost GROUP BY 1, 2, 3),
       |cdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM ctf GROUP BY 1),
       |vocab AS (SELECT term, ROW_NUMBER() OVER (ORDER BY term) - 1 AS idx FROM cdf),
       |vs AS (SELECT COUNT(*) AS vsize FROM vocab),
       |qt AS (
       |  SELECT DISTINCT q.q AS query_id, v.term
       |  FROM (SELECT unnest(range(20)) AS q) q,
       |       (SELECT unnest(range(3)) AS s) sl, vs
       |  JOIN vocab v ON v.idx = $qhash % vs.vsize),
       |ptoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM prevdocs),
       |ppost AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term FROM ptoks),
       |ptf AS (
       |  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM ppost GROUP BY 1, 2, 3),
       |pdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM ptf GROUP BY 1),
       |${bm25RkSql("p")},
       |${bm25RkSql("c")},
       |prk AS (SELECT * FROM prk0 WHERE rank <= 10),
       |crk AS (SELECT * FROM crk0 WHERE rank <= 10),
       |com AS (
       |  SELECT p.query_id, p.doc_id, p.rank AS pr, c.rank AS cr
       |  FROM prk p JOIN crk c ON c.query_id = p.query_id AND c.doc_id = p.doc_id),
       |prs AS (
       |  SELECT a.query_id,
       |    CAST(SUM(CASE WHEN (a.pr < b.pr) = (a.cr < b.cr) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS conc,
       |    CAST(SUM(CASE WHEN (a.pr < b.pr) <> (a.cr < b.cr) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS disc
       |  FROM com a JOIN com b
       |    ON b.query_id = a.query_id AND a.doc_id < b.doc_id
       |  GROUP BY 1),
       |fo AS (
       |  SELECT COALESCE(p.query_id, c.query_id) AS query_id,
       |    CAST(SUM(CASE WHEN p.doc_id IS NOT NULL AND c.doc_id IS NOT NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       |    CAST(SUM(CASE WHEN p.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_new,
       |    CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dropped
       |  FROM prk p FULL OUTER JOIN crk c
       |    ON c.query_id = p.query_id AND c.doc_id = p.doc_id
       |  GROUP BY 1)
       |SELECT f.query_id, n_common, n_new, n_dropped,
       |  COALESCE(conc, 0) AS conc, COALESCE(disc, 0) AS disc,
       |  CASE WHEN n_common >= 2
       |    THEN COALESCE(conc, 0) - COALESCE(disc, 0) END AS tau_num,
       |  CASE WHEN n_common >= 2
       |    THEN n_common * (n_common - 1) // 2 END AS tau_den
       |FROM fo f LEFT JOIN prs USING (query_id) ORDER BY f.query_id""".stripMargin
  }

  // ---- q302: matryoshka truncation-recall audit -------------------------------

  /** Embedding-truncation sizing audit ([[graft.operators.Similarity
    * .truncationRecall]]): exact top-10 recall of prefix-sliced 4- and
    * 16-dim searches against the full 64-dim brute reference over the
    * q24 query battery, in exact integer ppm — the measurement that
    * decides how small a matryoshka index can ship. The 64-dim row is
    * the in-data sanity pin (recall ≡ 10⁶). The oracle replays each
    * sliced search and the ppm arithmetic from scratch.
    */
  def matryoshkaRecall(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.truncationRecall(e, e.filter(col("vec_id") < NumQueries),
        dims = Seq(4, 16, 64), k = 10)
      .sortOnce(col("dims"))
  }

  private val q302Oracle: String = {
    def leg(m: Int, name: String, sliced: Boolean) = {
      val qv = if (sliced) s"q.v[1:$m]" else "q.v"
      val cv = if (sliced) s"c.v[1:$m]" else "c.v"
      s"""$name AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_cosine_similarity($qv, $cv) DESC, c.vec_id) AS rnk
         |    FROM qs q, cs c WHERE c.vec_id <> q.vec_id) WHERE rnk <= 10)""".stripMargin
    }
    def row(m: Int, name: String) =
      s"""SELECT $m AS dims,
         |  CAST(COUNT(DISTINCT l.query_id) AS BIGINT) AS n_queries,
         |  CAST(SUM(CASE WHEN r.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS sum_overlap,
         |  CAST(SUM(CASE WHEN r.query_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
         |    // (COUNT(DISTINCT l.query_id) * 10) AS BIGINT) AS recall_ppm
         |FROM $name l LEFT JOIN ref r
         |  ON r.query_id = l.query_id AND r.neighbor_id = l.neighbor_id""".stripMargin
    s"""WITH qs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id < $NumQueries),
       |cs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${leg(64, "ref", sliced = false)},
       |${leg(4, "leg4", sliced = true)},
       |${leg(16, "leg16", sliced = true)}
       |SELECT * FROM (
       |  ${row(4, "leg4")}
       |  UNION ALL
       |  ${row(16, "leg16")}
       |  UNION ALL
       |  ${row(64, "ref")}
       |) ORDER BY dims""".stripMargin
  }

  // ---- q301: nightly maintenance composite — ONE diff, every text index ------

  /** The nightly job itself, pinned: at 100 TB the crawl-incremental
    * chain (q259/q262/q265/q282/q287/q290/q296) runs as ONE pass — a
    * single snapshot diff of the crawl manifest feeds every text-keyed
    * index's maintenance leg, instead of each leg re-diffing the corpus
    * (the shared-diff `From` variants:
    * [[graft.operators.Dedup.incrementalSignaturesFrom]] /
    * [[graft.operators.Dedup.incrementalSimhashFrom]] /
    * [[graft.operators.Retrieval.incrementalPostingsFrom]]). The
    * previous crawl persists a ~16 B/row (id, fp) MANIFEST plus its
    * three stores; the composite diffs manifest-vs-corpus ONCE (eager —
    * its consumers fan out inside one action, q290's lazy-race lesson)
    * and reports one summary row per family: store cardinality, doc
    * provenance counts, and a family content checksum (Σ signature
    * slots / Σ simhash / Σ tf). The oracle rebuilds all three indexes
    * from scratch and derives the diff row from the delta definition —
    * a green row pins every maintained store AND the shared-diff
    * bookkeeping in one query.
    */
  def nightlyMaintenance(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Retrieval
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val isOld = col("doc_id") % 7 =!= 3
    val isChanged = (col("doc_id") % 5 === 0) && isOld
    val shift = d.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val prevCrawl = d.filter(isOld && !isChanged)
      .unionByName(d.filter(isChanged)
        .select(col("doc_id"), concat(col("text"), lit(" legacy rev")).as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 2 * shift).as("doc_id"), col("text")))
      .localCheckpoint(true) // feeds four staged store builds
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    def staged(name: String)(build: String => Unit): DataFrame = {
      val p = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_work", s"${name}_$tag")
      graft.Staging.ensureFresh(
        java.nio.file.Paths.get(dir, "documents.parquet"), p)(build(p.toString))
      s.read.parquet(p.toString)
    }
    val prevManifest = staged("nightly_manifest") { p =>
      prevCrawl.select(col("doc_id").as("id"),
          TextFns.hash60(col("text")).as("fp"))
        .write.mode("overwrite").parquet(p)
    }
    val prevSig = staged("nightly_sig") { p =>
      Dedup.signatureStore(prevCrawl, col("doc_id"), col("text"), NumPerms)
        .write.mode("overwrite").parquet(p)
    }
    val prevSh = staged("nightly_simhash") { p =>
      Dedup.simhashStore(prevCrawl, col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(p)
    }
    val prevPost = staged("nightly_postings") { p =>
      Retrieval.postingsStore(prevCrawl, col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(p)
    }
    // THE one diff — manifest vs corpus, shared by all three legs
    val diff = graft.operators.SnapshotDiff.diffStored(prevManifest, d,
        col("doc_id"), TextFns.hash60(col("text")))
      .localCheckpoint(true)
    val sig = Dedup.incrementalSignaturesFrom(diff, d, prevSig,
      col("doc_id"), col("text"), NumPerms)
    val sh = Dedup.incrementalSimhashFrom(diff, d, prevSh,
      col("doc_id"), col("text"))
    val post = Retrieval.incrementalPostingsFrom(diff, d,
      prevPost, col("doc_id"), col("text"))
    def summary(name: String, agged: DataFrame): DataFrame =
      agged.select(lit(name).as("family"), col("store_rows"),
        col("n_computed"), col("n_retained"), col("content_sum"))
    val diffSum = summary("diff", diff.agg(
      count(lit(1)).as("store_rows"),
      sum(col("status").isin("added", "changed").cast("long")).as("n_computed"),
      sum((col("status") === "unchanged").cast("long")).as("n_retained"),
      sum((col("status") === "removed").cast("long")).as("content_sum")))
    val sigSum = summary("signatures", sig.agg(
      count(lit(1)).as("store_rows"),
      sum((col("src") === "computed").cast("long")).as("n_computed"),
      sum((col("src") === "retained").cast("long")).as("n_retained"),
      sum((0 until NumPerms).map(i => col(s"sig$i")).reduce(_ + _)).as("content_sum")))
    val shSum = summary("simhash", sh.agg(
      count(lit(1)).as("store_rows"),
      sum((col("src") === "computed").cast("long")).as("n_computed"),
      sum((col("src") === "retained").cast("long")).as("n_retained"),
      sum(col("simhash")).as("content_sum")))
    val postSum = summary("postings", post.agg(
      count(lit(1)).as("store_rows"),
      countDistinct(when(col("src") === "computed", col("doc_id"))).as("n_computed"),
      countDistinct(when(col("src") === "retained", col("doc_id"))).as("n_retained"),
      sum(col("tf")).as("content_sum")))
    diffSum.unionByName(sigSum).unionByName(shSum).unionByName(postSum)
      .orderBy(col("family"))
  }

  private val q301Oracle: String = {
    val sigCols = (0 until NumPerms)
      .map(i => s"MIN(${TextFns.minhashPermSql(i, "h")}) AS s$i").mkString(", ")
    val sigSum = (0 until NumPerms).map(i => s"s$i").mkString(" + ")
    val comp = "doc_id % 7 = 3 OR doc_id % 5 = 0"
    s"""SELECT family, store_rows, n_computed, n_retained, content_sum FROM (
       |  SELECT 'diff' AS family,
       |    (SELECT COUNT(*) FROM documents)
       |      + (SELECT COUNT(*) FROM documents WHERE doc_id % 13 = 1) AS store_rows,
       |    (SELECT COUNT(*) FROM documents WHERE $comp) AS n_computed,
       |    (SELECT COUNT(*) FROM documents WHERE NOT ($comp)) AS n_retained,
       |    (SELECT COUNT(*) FROM documents WHERE doc_id % 13 = 1) AS content_sum
       |  UNION ALL
       |  SELECT * FROM (
       |    WITH $shingleBaseCtes,
       |    hashed AS (SELECT doc_id, ${TextFns.hash60Sql("shingle")} AS h FROM sh),
       |    sigs AS (SELECT doc_id, $sigCols FROM hashed GROUP BY doc_id)
       |    SELECT 'signatures', CAST(COUNT(*) AS BIGINT),
       |      CAST(SUM(CASE WHEN $comp THEN 1 ELSE 0 END) AS BIGINT),
       |      CAST(SUM(CASE WHEN $comp THEN 0 ELSE 1 END) AS BIGINT),
       |      CAST(SUM($sigSum) AS BIGINT)
       |    FROM sigs)
       |  UNION ALL
       |  SELECT * FROM (
       |    $simhashCte
       |    SELECT 'simhash', CAST(COUNT(*) AS BIGINT),
       |      CAST(SUM(CASE WHEN $comp THEN 1 ELSE 0 END) AS BIGINT),
       |      CAST(SUM(CASE WHEN $comp THEN 0 ELSE 1 END) AS BIGINT),
       |      CAST(SUM(simhash) AS BIGINT)
       |    FROM fp)
       |  UNION ALL
       |  SELECT * FROM (
       |    WITH ptoks AS (
       |      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |    post AS (
       |      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |      FROM ptoks GROUP BY 1, 2)
       |    SELECT 'postings', CAST(COUNT(*) AS BIGINT),
       |      CAST(COUNT(DISTINCT CASE WHEN $comp THEN doc_id END) AS BIGINT),
       |      CAST(COUNT(DISTINCT CASE WHEN NOT ($comp) THEN doc_id END) AS BIGINT),
       |      CAST(SUM(tf) AS BIGINT)
       |    FROM post)
       |) ORDER BY family""".stripMargin
  }

  // ---- q291: IVF drift→retrain trigger, end-to-end ---------------------------

  /** Global reassignment fraction that fires the retrain gate (exact
    * ppm). 5% — well under the simulated crawl's ~13% revision churn,
    * so the gate FIRES in this pin; SimilaritySpec pins the quiet side
    * (below-threshold crawl keeps the old centroids verbatim). */
  private val RetrainPpm = 50000L

  /** The retrain HANDOFF pinned end-to-end (closing q280's loop: q280
    * pins that fixed-centroid maintenance is exact and that
    * [[graft.operators.Similarity.assignmentDrift]] measures routing
    * churn; this pins what a pipeline DOES with the signal): maintain
    * the IVF assignment store across the simulated crawl, aggregate the
    * drift audit into the global moved-fraction ppm, compare against
    * [[RetrainPpm]], and on a fired gate retrain the codebook on the
    * maintained corpus ([[graft.operators.Similarity.trainCentroids]],
    * q257's pinned Lloyd loop, k=4 iters=2) and re-bucket every vector.
    * Output: per vector, maintained `prev_cid` → post-decision
    * `next_cid` + `rebucketed`, with the `drift_ppm`/`retrained`
    * decision columns pinned in-data. The oracle replays EVERYTHING
    * from scratch: maintained ≡ full assignment under the old
    * centroids (q280's CTEs), the moved/persisted ppm with the same
    * floor division, both Lloyd rounds (q257's CTEs), the fresh
    * assignment under the retrained codebook, and the threshold CASE —
    * so a green row proves the monitor→decision→retrain→re-bucket
    * chain, not just its pieces.
    */
  def driftRetrain(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = emb(s, dir).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < NumCentroids)
    val isOld = col("vec_id") % 7 =!= 3
    val isChanged = (col("vec_id") % 5 === 0) && isOld &&
      (col("embedding") =!= reverse(col("embedding")))
    val shift = e.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val prevCrawl = e.filter(isOld && !isChanged)
      .unionByName(e.filter(isChanged)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding")))
      .unionByName(e.filter(col("vec_id") % 13 === 1)
        .select((col("vec_id") + 2 * shift).as("vec_id"), col("embedding")))
    // Eager checkpoints (q290's lesson): both stores feed several
    // consumer stages AND driver-side aggregates — lazy checkpoints get
    // recomputed by concurrently-launched consumer stages.
    val prevStore = Similarity.assignmentStore(prevCrawl, cents)
      .localCheckpoint(true)
    val store = Similarity.incrementalAssignments(e, prevStore, cents)
      .localCheckpoint(true)
    // The drift audit feeds the retrain DECISION: global moved fraction
    // = Σ outbound-churn (assignmentDrift) over the persisted overlap,
    // exact ppm. Two 1-row driver aggregates — control flow, not data
    // movement (connectedComponents' convergence-count discipline).
    val movedG = Similarity.assignmentDrift(prevStore, store)
      .agg(coalesce(sum(col("n_moved_out")), lit(0L))).head.getLong(0)
    val persisted = prevStore.select(col("vec_id"))
      .join(store.select(col("vec_id")), "vec_id").count()
    val driftPpm = if (persisted == 0L) 0L else movedG * 1000000L / persisted
    val retrained = driftPpm >= RetrainPpm
    val nextAssign =
      if (retrained)
        Similarity.assign(e, Similarity.trainCentroids(e, 4, 2))
          .select(col("vec_id"), col("centroid_id").as("next_cid"))
      else store.select(col("vec_id"), col("centroid_id").as("next_cid"))
    store.select(col("vec_id"), col("centroid_id").as("prev_cid"))
      .join(nextAssign, "vec_id")
      .select(col("vec_id"), col("prev_cid"), col("next_cid"),
        (col("prev_cid") =!= col("next_cid")).as("rebucketed"),
        lit(driftPpm).as("drift_ppm"), lit(retrained).as("retrained"))
      .sortOnce(col("vec_id"))
  }

  private val q291Oracle: String = {
    val cos = "list_cosine_similarity(t.v, i.c)"
    def argmax(src: String, cents: String, out: String) =
      s"""$out AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT t.vec_id, i.cid,
         |      row_number() OVER (PARTITION BY t.vec_id
         |        ORDER BY $cos DESC, i.cid) AS rn
         |    FROM $src t, $cents i) WHERE rn = 1)""".stripMargin
    def meanRound(assigned: String, out: String) =
      s"""$out AS (
         |  SELECT cid, pos, AVG(x) AS m FROM (
         |    SELECT a.cid,
         |      generate_subscripts(c.v, 1) - 1 AS pos,
         |      unnest(c.v) AS x
         |    FROM $assigned a JOIN cur c USING (vec_id)) t GROUP BY 1, 2)""".stripMargin
    s"""WITH cents AS (
       |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
       |  FROM embeddings WHERE vec_id < $NumCentroids),
       |cur AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |old AS (
       |  SELECT vec_id, list_reverse(CAST(embedding AS DOUBLE[])) AS v
       |  FROM embeddings WHERE vec_id % 5 = 0 AND vec_id % 7 <> 3
       |    AND CAST(embedding AS DOUBLE[])
       |      <> list_reverse(CAST(embedding AS DOUBLE[]))),
       |${argmax("cur", "cents", "assigned")},
       |${argmax("old", "cents", "prevass")},
       |drift AS (
       |  SELECT CAST(1000000 * COUNT(CASE WHEN p.cid <> a.cid THEN 1 END)
       |    // (SELECT COUNT(*) FROM cur WHERE vec_id % 7 <> 3) AS BIGINT)
       |    AS drift_ppm
       |  FROM prevass p JOIN assigned a USING (vec_id)),
       |init AS (
       |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
       |  FROM embeddings ORDER BY vec_id LIMIT 4),
       |${argmax("cur", "init", "a1")},
       |${meanRound("a1", "g1")},
       |c1 AS (
       |  SELECT cid, list(m ORDER BY pos) AS c FROM g1 GROUP BY 1
       |  UNION ALL
       |  SELECT cid, c FROM init WHERE cid NOT IN (SELECT cid FROM g1)),
       |${argmax("cur", "c1", "a2")},
       |${meanRound("a2", "g2")},
       |c2 AS (
       |  SELECT cid, list(m ORDER BY pos) AS c FROM g2 GROUP BY 1
       |  UNION ALL
       |  SELECT cid, c FROM c1 WHERE cid NOT IN (SELECT cid FROM g2)),
       |${argmax("cur", "c2", "newass")}
       |SELECT a.vec_id, a.cid AS prev_cid,
       |  CASE WHEN d.drift_ppm >= $RetrainPpm THEN n.cid ELSE a.cid END
       |    AS next_cid,
       |  CASE WHEN d.drift_ppm >= $RetrainPpm THEN n.cid ELSE a.cid END
       |    <> a.cid AS rebucketed,
       |  d.drift_ppm, d.drift_ppm >= $RetrainPpm AS retrained
       |FROM assigned a JOIN newass n USING (vec_id) CROSS JOIN drift d
       |ORDER BY a.vec_id""".stripMargin
  }

  // ---- q289: corpus concentration audit (Lorenz + Gini) ---------------------

  /** Source-concentration audit of the corpus's token mass — the
    * "how much of my 100 TB comes from how few sources" question a
    * mixture designer asks before weighting (a Gini near 1 means a
    * handful of domains dominate and q93/q118's rebalancing has real
    * work to do; near 0 means the corpus is already flat). Per source:
    * exact token count, ascending (tokens, source) rank, exact
    * cumulative-share ppm (floor division); corpus Gini from the exact
    * rank-weighted sum, `(2·Σrank·x − (n+1)·Σx) / (n·Σx)`, as one
    * fixed-shape rounded double. Source vocabulary is small, so the
    * rank window is a vocabulary-sized frame over a one-pass corpus
    * aggregate — the corpus is never touched per-rank.
    */
  def concentrationAudit(s: SparkSession, dir: String): DataFrame = {
    val perSource = docs(s, dir)
      .groupBy(col("source"))
      .agg(sum(size(TextFns.tokens(col("text"))).cast("long")).as("n_tokens"))
      .localCheckpoint(false) // vocabulary-sized; ranked AND totalled
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_tokens"), col("source"))
    val tot = perSource.agg(sum(col("n_tokens")).as("tot"),
      count(lit(1)).as("n_src"))
    perSource
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"), col("rnk"),
        // Multiply IN decimal(38): cum·1e6 wraps int64 once corpus token
        // mass passes ~9.2e12 — exactly the 100 TB regime this audit is
        // for (the CUPED/AbTests decimal-guard pattern).
        call_function("div",
          col("cum").cast(org.apache.spark.sql.types.DecimalType(38, 0))
            * lit(1000000L), col("tot"))
          .cast("long").as("cum_share_ppm"),
        round((lit(2.0) * sum(col("rnk") * col("n_tokens"))
            .over(org.apache.spark.sql.expressions.Window.rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.unboundedFollowing))
            .cast("double")
          - (col("n_src") + 1L).cast("double") * col("tot").cast("double"))
          / (col("n_src").cast("double") * col("tot").cast("double")), 6)
          .as("gini_r"))
      .sortOnce(col("rnk"))
  }

  private val q289Oracle: String =
    """WITH ps AS (
      |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
      |    AS n_tokens
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
      |  CAST(COUNT(*) AS BIGINT) AS n_src FROM ps),
      |r AS (
      |  SELECT source, n_tokens,
      |    CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT) AS rnk,
      |    CAST(SUM(n_tokens) OVER (ORDER BY n_tokens, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM ps)
      |SELECT source, n_tokens, rnk,
      |  CAST(CAST(cum AS HUGEINT) * 1000000 // tot AS BIGINT)
      |    AS cum_share_ppm,
      |  round((2.0 * CAST((SELECT SUM(rnk * n_tokens) FROM r) AS DOUBLE)
      |    - (n_src + 1) * CAST(tot AS DOUBLE))
      |    / (n_src * CAST(tot AS DOUBLE)), 6) AS gini_r
      |FROM r, t ORDER BY rnk""".stripMargin

  // ---- q288: calibration audit (reliability bins + ECE) ---------------------

  /** Classifier-calibration audit ([[graft.operators.Calibration
    * .eceBins]]) over a calibrated-by-construction synthetic scorer:
    * confidence = hash(event) ‰, outcome drawn by an independent hash
    * under that confidence — so accuracy tracks confidence in every
    * bin up to sampling noise and the audit's gaps/ECE measure exactly
    * that noise. Ten reliability bins with exact integer
    * (n, n_pos, Σconf) and fixed-shape rounded ratios; the oracle
    * replays bin assignment, every exact count, and the n-weighted ECE.
    * Complements q251 (AUC — ranking) and q252 (threshold sweep):
    * calibration is what lets a score gate a pipeline unre-thresholded.
    */
  def calibrationAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Calibration
    val cm = TextFns.hash60(col("event_id")) % 1000L
    val scored = Tables(s, dir, "events")
      .select(cm.as("cm"),
        (TextFns.hash60(concat(lit("lbl:"), col("event_id").cast("string")))
          % 1000L < cm).cast("long").as("y"))
    Calibration.eceBins(scored, col("cm"), col("y"))
      .sortOnce(col("bin"))
  }

  private val q288Oracle: String = {
    val hc = TextFns.hash60Sql("CAST(event_id AS VARCHAR)")
    val hl = TextFns.hash60Sql("'lbl:' || CAST(event_id AS VARCHAR)")
    s"""WITH scored AS (
       |  SELECT $hc % 1000 AS cm,
       |    CASE WHEN $hl % 1000 < $hc % 1000 THEN 1 ELSE 0 END AS y
       |  FROM events),
       |b AS (
       |  SELECT cm // 100 AS bin, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(y) AS BIGINT) AS n_pos,
       |    CAST(SUM(cm) AS BIGINT) AS sum_conf_milli
       |  FROM scored GROUP BY 1),
       |c AS (
       |  SELECT *, sum_conf_milli / (n * 1000.0) AS conf,
       |    n_pos * 1.0 / n AS acc,
       |    ABS(n_pos * 1.0 / n - sum_conf_milli / (n * 1000.0)) AS gap
       |  FROM b),
       |t AS (SELECT SUM(n * gap) AS sg, SUM(n) * 1.0 AS sn FROM c)
       |SELECT bin, n, n_pos, sum_conf_milli,
       |  round(conf, 6) AS conf_r, round(acc, 6) AS acc_r,
       |  round(gap, 6) AS gap_r, round(sg / sn, 6) AS ece_r
       |FROM c, t ORDER BY bin""".stripMargin
  }

  // ---- q283: stratified k-fold with exact balance ---------------------------

  /** Stratified 5-fold cross-validation assignment
    * ([[graft.operators.Sampling.stratifiedKFold]]): per event type,
    * rows dealt round-robin over the (hash60(id), id) deterministic
    * shuffle order, so fold sizes within a stratum differ by AT MOST
    * one — the exact-balance property hash-mod-k only gives in
    * expectation (and visibly violates on small strata). The output
    * carries each stratum's observed max−min fold-size `spread` so the
    * guarantee is pinned IN-DATA (q260's audit discipline), and the
    * oracle replays the full deal — hash order, round-robin, counts,
    * spread — bit-for-bit.
    */
  def stratifiedFolds(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val ev = Tables(s, dir, "events")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    Sampling.stratifiedKFold(ev.select(col("event_type"), col("event_id")),
        col("event_type"), col("event_id"), k = 5)
      .groupBy(col("event_type"), col("fold").cast("long").as("fold"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("spread", max(col("n_rows")).over(w) - min(col("n_rows")).over(w))
      .sortOnce(col("event_type"), col("fold"))
  }

  private val q283Oracle: String = {
    val h = TextFns.hash60Sql("CAST(event_id AS VARCHAR)")
    s"""WITH f AS (
       |  SELECT event_type,
       |    (row_number() OVER (PARTITION BY event_type ORDER BY $h, event_id) - 1)
       |      % 5 AS fold
       |  FROM events),
       |c AS (
       |  SELECT event_type, fold, CAST(COUNT(*) AS BIGINT) AS n_rows
       |  FROM f GROUP BY 1, 2)
       |SELECT event_type, fold, n_rows,
       |  CAST(MAX(n_rows) OVER (PARTITION BY event_type)
       |    - MIN(n_rows) OVER (PARTITION BY event_type) AS BIGINT) AS spread
       |FROM c ORDER BY event_type, fold""".stripMargin
  }

  // ---- q284: containment / clone detection ----------------------------------

  /** Directed containment pairs at 0.9
    * ([[graft.operators.Dedup.containmentPairs]]): the subset-clone
    * relation Jaccard dedup misses — an excerpt embedded in a longer
    * page has near-1 containment at near-0 Jaccard. Both directions in
    * exact ppm; the oracle recomputes every candidate from the shared
    * shingle CTEs with the same floor divisions, so membership AND both
    * ratios are hash-pinned.
    */
  def containmentClones(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(docs(s, dir), col("doc_id"), col("text"),
        threshold = 0.9)
      .sortOnce(col("doc_a"), col("doc_b"))

  private val q284Oracle: String =
    s"""WITH $shingleBaseCtes,
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  CAST(1000000 * c // sa.n AS BIGINT) AS cont_ab_ppm,
       |  CAST(1000000 * c // sb.n AS BIGINT) AS cont_ba_ppm
       |FROM pairs
       |JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE GREATEST(1000000 * c // sa.n, 1000000 * c // sb.n) >= 900000
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- q285: consistent-hash ring routing -----------------------------------

  /** Consistent-hash ring with 8 virtual nodes per shard
    * ([[graft.operators.Rendezvous.ringAssign]] — the ring counterpart
    * to q279's HRW): every doc routed under 9 and under 9+1 nodes; per
    * new-topology shard the output carries how many docs MOVED. The
    * ring law is pinned IN-DATA exactly like q279: movement lands ONLY
    * on the added node (a key moves iff one of J's vnodes claims its
    * arc), and the oracle replays the clockwise-successor pick —
    * wrapped-flag ordering, wraparound minimum and all —
    * assignment-for-assignment.
    */
  def ringShards(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Rendezvous
    val d = docs(s, dir).select(col("doc_id"))
      .withColumn("s9", Rendezvous.ringAssign(col("doc_id"), ShardList, 8))
      .withColumn("s10", Rendezvous.ringAssign(col("doc_id"), ShardList :+ "J", 8))
    d.groupBy(col("s10").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s9") =!= col("s10"), 1L).otherwise(0L)).as("n_moved"))
      .sortOnce(col("shard"))
  }

  private val q285Oracle: String = {
    val ph = TextFns.hash60Sql("n.nd || '#' || CAST(v.v AS VARCHAR)")
    val h = TextFns.hash60Sql("CAST(doc_id AS VARCHAR)")
    def pick(src: String, out: String) =
      s"""$out AS (
         |  SELECT doc_id, node FROM (
         |    SELECT d.doc_id, r.node,
         |      row_number() OVER (PARTITION BY d.doc_id
         |        ORDER BY (r.ph <= d.h), r.ph, r.node) AS rn
         |    FROM d, $src r) WHERE rn = 1)""".stripMargin
    s"""WITH ring AS (
       |  SELECT n.nd AS node, $ph AS ph
       |  FROM (SELECT unnest(['A','B','C','D','E','F','G','H','I','J']) AS nd) n,
       |       (SELECT unnest(range(0, 8)) AS v) v),
       |ring9 AS (SELECT * FROM ring WHERE node <> 'J'),
       |d AS (SELECT doc_id, $h AS h FROM documents),
       |${pick("ring", "a10")},
       |${pick("ring9", "a9")}
       |SELECT a10.node AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN a9.node <> a10.node THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_moved
       |FROM a10 JOIN a9 USING (doc_id)
       |GROUP BY 1 ORDER BY shard""".stripMargin
  }

  // ---- q263: near-dup-cluster-safe split -----------------------------------

  /** Split assignment that cannot leak near-duplicates across
    * train/val/test ([[graft.operators.Sampling.componentSafeSplit]]):
    * q260 closes the ENTITY leak, this closes the CONTENT leak — a
    * near-copy of a training doc in the test set is memorization
    * disguised as generalization (the q63/q186 decontamination family
    * audits it after the fact; this split makes it impossible by
    * construction). Components over the exact-Jaccard≥0.8 near-dup
    * graph, singletons label themselves, split by hashed component.
    * The audit output counts near-dup pairs straddling two splits —
    * pinned ZERO — plus per-split doc/component counts; the oracle
    * replays pairs (q22 chain), components (recursive-CTE closure),
    * hash-range assignment, and the audit join.
    */
  def componentSplitAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val d = docs(s, dir)
    val pairs = Dedup.nearDupPairs(d, col("doc_id"), col("text"), threshold = 0.8)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(false) // feeds components AND the straddle audit
    val labeled = Sampling.componentSafeSplit(
      d.select(col("doc_id")), col("doc_id"), pairs,
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .localCheckpoint(false) // feeds the audit join + per-split stats
    val straddle = pairs
      .join(labeled.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(labeled.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .agg(count(lit(1)).as("n_leaky_pairs"))
    labeled.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("component")).as("n_components"))
      .crossJoin(broadcast(straddle))
      .orderBy(col("split"))
  }

  /** Everything downstream of the `exact` pair CTE — shared verbatim by
    * the self-contained oracle (pairs recomputed from shingles) and the
    * STAGED sf1 oracle (pairs read from the Spark-verified q22 dump),
    * so the two replay variants can never fork semantically. */
  private val q263OracleBody: String = {
    val b = TextFns.hash60Sql("CAST(component AS VARCHAR)")
    s"""nodes AS (SELECT doc_a AS n FROM exact UNION SELECT doc_b FROM exact),
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM exact
       |          UNION SELECT doc_b, doc_a FROM exact),
       |reach AS (
       |  WITH RECURSIVE r(src, dst) AS (
       |    SELECT n, n FROM nodes
       |    UNION
       |    SELECT r.src, e.v FROM r JOIN edges e ON e.u = r.dst)
       |  SELECT * FROM r),
       |cc AS (SELECT src AS doc_id, MIN(dst) AS component FROM reach GROUP BY 1),
       |comp AS (
       |  SELECT d.doc_id, COALESCE(cc.component, d.doc_id) AS component
       |  FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id),
       |labeled AS (
       |  SELECT doc_id, component,
       |    CASE WHEN $b % 100 < 80 THEN 'train'
       |         WHEN $b % 100 < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM comp),
       |leak AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_leaky_pairs
       |  FROM exact e
       |  JOIN labeled a ON a.doc_id = e.doc_a
       |  JOIN labeled b2 ON b2.doc_id = e.doc_b
       |  WHERE a.split <> b2.split)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT component) AS BIGINT) AS n_components, n_leaky_pairs
       |FROM labeled, leak GROUP BY split, n_leaky_pairs ORDER BY split""".stripMargin
  }

  private val q263Oracle: String = s"WITH $shingleCtes,\n$q263OracleBody"

  /** STAGED sf1 replay: the exact-Jaccard pair set — the only stage
    * DuckDB cannot afford at sf1 (>78 GB spill) — is read from the
    * Spark q22 dump that the SAME sweep has already hash-verified, and
    * DuckDB replays everything downstream (closure, hash-range split,
    * straddle audit) from it. See `SparkEntry.stagedOracleSql`. */
  private val q263StagedOracle: String =
    s"WITH exact AS (SELECT doc_a, doc_b FROM q22_neardup),\n$q263OracleBody"

  // ---- q264: margin-based parallel-pair mining ------------------------------

  /** Margin-criterion alignment mining ([[graft.operators.Similarity
    * .marginMutualPairs]], the Artetxe & Schwenk ACL'19 ratio margin):
    * a mining batch (every 10th vector) against a target collection
    * (even vectors), k=4 neighborhood normalization, mutual-best filter,
    * margin ≥ 1.0 (the above-average-alignment gate). The oracle
    * replays the full chain — fixed-point cosines, k-NN sum windows,
    * the single integer division, both best-rank windows — so a green
    * row pins hubness-corrected RANKING, not just pair membership.
    */
  def marginMining(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.operators.Similarity.marginMutualPairs(
        e.filter(col("vec_id") % 10 === 1), e.filter(col("vec_id") % 2 === 0),
        k = 4, minMarginMicro = 1000000L)
      .sortOnce(col("x_id"))
  }

  private val q264Oracle: String = {
    val cos = VectorFns.cosineSql("xv", "yv")
    s"""WITH x AS (SELECT vec_id AS x_id, embedding AS xv FROM embeddings WHERE vec_id % 10 = 1),
       |y AS (SELECT vec_id AS y_id, embedding AS yv FROM embeddings WHERE vec_id % 2 = 0),
       |scored AS (
       |  SELECT x_id, y_id,
       |    CAST(round($cos * 1000000, 0) AS BIGINT) AS simfp
       |  FROM x, y),
       |rk AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY x_id ORDER BY simfp DESC, y_id) AS rx,
       |    row_number() OVER (PARTITION BY y_id ORDER BY simfp DESC, x_id) AS ry
       |  FROM scored),
       |sx AS (SELECT x_id, SUM(simfp) AS sx FROM rk WHERE rx <= 4 GROUP BY 1),
       |sy AS (SELECT y_id, SUM(simfp) AS sy FROM rk WHERE ry <= 4 GROUP BY 1),
       |m AS (
       |  SELECT s.x_id, s.y_id, s.simfp,
       |    CAST(s.simfp * 8000000 // (sx + sy) AS BIGINT) AS margin_micro
       |  FROM scored s JOIN sx USING (x_id) JOIN sy USING (y_id)
       |  WHERE s.simfp > 0 AND sx + sy > 0),
       |best AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY x_id ORDER BY margin_micro DESC, y_id) AS bx,
       |    row_number() OVER (PARTITION BY y_id ORDER BY margin_micro DESC, x_id) AS by
       |  FROM m)
       |SELECT x_id, y_id, simfp, margin_micro FROM best
       |WHERE bx = 1 AND by = 1 AND margin_micro >= 1000000
       |ORDER BY x_id""".stripMargin
  }

  // ---- q179: binaryFile source (multimodal ingestion door) ---------------

  /** The `binaryFile` DataSource — how a real multimodal corpus (image/
    * audio dirs) enters the engine before q113/q114's decode operators
    * run: the documents table is staged as one raw-bytes file per doc
    * (EXECUTOR-side foreachPartition writes — the corpus never visits
    * the driver; Staging source-sig guards the reuse), read back
    * through `spark.read.format("binaryFile")`, and pinned on the
    * file-level contract: path-derived id, exact byte length, and the
    * md5 of `content` — byte-identical to the md5 of the text the
    * generator wrote, which DuckDB replays directly. `pathGlobFilter`
    * pushes the *.bin filter into the file index (no stray-file reads).
    */
  def binarySource(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val stageP = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work", s"binsrc_$tag")
    graft.Staging.ensureFresh(
      java.nio.file.Paths.get(dir, "documents.parquet"), stageP) {
      java.nio.file.Files.createDirectories(stageP)
      val stageDir = stageP.toString
      docs(s, dir).select(col("doc_id"), col("text"))
        .foreachPartition { rows: java.util.Iterator[org.apache.spark.sql.Row] =>
          rows.forEachRemaining { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(stageDir, f"doc_${r.getLong(0)}%07d.bin"),
              r.getString(1).getBytes("UTF-8"))
            ()
          }
        }
    }
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(stageP.toString)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("fp"))
      .orderBy(col("doc_id"))
  }

  private val q179Oracle: String =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- q105: fixed-weights quality classifier --------------------------

  /** Model-based quality scoring with a FIXED fastText-shaped linear
    * model ([[graft.operators.QualityClassifier]]): every token hashes
    * to one of 64 buckets, the document's feature sum adds the buckets'
    * fixed-point micro-weights, and the keep gate is the exact integer
    * inequality `bias*max(n,1) + feat_sum >= 0` (⇔ sigmoid ≥ 0.5).
    * Weights are literal values (a deterministic Weyl-sequence table —
    * the VALUES the oracle joins are generated from the same Scala
    * array), so the oracle replays scoring as pure arithmetic: unnest
    * tokens, bucket by the shared hash60 family, join the weight table,
    * integer-sum — no float ever decides a row. Training stays
    * spec-pinned (k-means precedent); this pins the SCORING contract a
    * trained model runs under.
    */
  private val QcDim = 64
  private val QcWeights: IndexedSeq[Long] =
    (0 until QcDim).map(b => (b * 2654435761L) % 2000001L - 1000000L)
  private val QcBias = 250000L

  def qualityClassify(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.QualityClassifier
    val model = QualityClassifier.Model(QcWeights, QcBias)
    QualityClassifier.score(docs(s, dir), col("text"), model)
      .select(col("doc_id"), col("n_tok"), col("feat_sum"), col("keep"))
      .orderBy(col("doc_id"))
  }

  private val q105Oracle: String = {
    val weightValues = QcWeights.zipWithIndex
      .map { case (w, b) => s"($b, $w)" }.mkString(",")
    s"""WITH w(b, wt) AS (SELECT * FROM (VALUES $weightValues) t(b, wt)),
       |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |f AS (SELECT doc_id, COUNT(*) AS n_tok, CAST(SUM(wt) AS BIGINT) AS feat_sum
       |      FROM (SELECT doc_id, ${graft.functions.TextFns.hash60Sql("tok")} % $QcDim
       |              AS bkt FROM t) bk
       |      JOIN w ON bk.bkt = w.b GROUP BY doc_id)
       |SELECT d.doc_id,
       |       COALESCE(f.n_tok, 0) AS n_tok,
       |       COALESCE(f.feat_sum, 0) AS feat_sum,
       |       $QcBias * GREATEST(COALESCE(f.n_tok, 0), 1)
       |         + COALESCE(f.feat_sum, 0) >= 0 AS keep
       |FROM documents d LEFT JOIN f USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---- q107: markup → text extraction ----------------------------------

  /** WET-style extraction: the corpus re-rendered as HTML-ish pages —
    * head/style chrome, entity-encoded punctuation, a script block on
    * every even doc (whose body contains literal `<`/`>` that would
    * corrupt a naive tag strip), a multi-line comment — and
    * [[graft.operators.Extraction.extract]] must recover exactly the
    * text a WET extractor would. The oracle rebuilds the identical
    * pages and replays the rule chain byte-for-byte via
    * [[graft.operators.Extraction.stripMarkupSql]].
    */
  def markupStrip(s: SparkSession, dir: String): DataFrame = {
    val t = TextFns.tokens(col("text"))
    val pages = docs(s, dir).select(
      col("doc_id"),
      concat(
        lit("<html><head><title>page</title><style>p { margin: 0 }</style></head>\n<body><p class=\"lead\">"),
        array_join(slice(t, 1, 12), " "),
        lit(" &lt;3 &amp; more &#39;quoted&#39;</p>"),
        when(col("doc_id") % 2 === 0,
          lit("<script>var x = \"1 < 2 > 0\";\nalert(x);</script>")).otherwise(lit("")),
        lit("<div>"),
        when(size(t) >= 13, array_join(slice(t, 13, 12), " ")).otherwise(lit("")),
        lit("</div><!-- generated\nfooter -->\n</body></html>")).as("page"))
    graft.operators.Extraction.extract(pages, col("doc_id"), col("page"))
      .select(col("ex_id").as("doc_id"), col("n_raw"), col("clean_text"), col("n_clean"))
      .orderBy(col("doc_id"))
  }

  private val q107Oracle: String = {
    val clean = graft.operators.Extraction.stripMarkupSql("page")
    s"""WITH pages AS (
       |  SELECT doc_id,
       |    '<html><head><title>page</title><style>p { margin: 0 }</style></head>' || chr(10) ||
       |    '<body><p class="lead">' || array_to_string(t[1:12], ' ') ||
       |    ' &lt;3 &amp; more &#39;quoted&#39;</p>' ||
       |    CASE WHEN doc_id % 2 = 0
       |      THEN '<script>var x = "1 < 2 > 0";' || chr(10) || 'alert(x);</script>' ELSE '' END ||
       |    '<div>' || CASE WHEN len(t) >= 13 THEN array_to_string(t[13:24], ' ') ELSE '' END ||
       |    '</div><!-- generated' || chr(10) || 'footer -->' || chr(10) || '</body></html>' AS page
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
       |SELECT doc_id, CAST(length(page) AS BIGINT) AS n_raw,
       |  $clean AS clean_text, CAST(length($clean) AS BIGINT) AS n_clean
       |FROM pages ORDER BY doc_id""".stripMargin
  }

  // ---- q108: n-gram LM fluency gate ------------------------------------

  private val LmN = 2
  private val FluentNum = 2L
  private val FluentDen = 1L

  /** CCNet-shaped model-based filtering: a bigram LM is trained on the
    * reference corpus (the documents table as-is), then a SCORED corpus
    * — the same table with every 5th doc rewritten to gibberish
    * (`tok#<id>` suffixes, guaranteed out-of-vocabulary) — is gated on
    * mean integer-log2 gram frequency ≥ 2. Clean docs sit at mean ≥ 4
    * at every SF (corpus growth only raises counts); gibberish docs
    * score exactly −1 per gram through the OOV penalty and fail at any
    * scale. Integer arithmetic end-to-end (see
    * [[graft.operators.NgramLm]]), replayed by the oracle with the
    * identical hash-gram construction.
    */
  def ngramFluency(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.NgramLm
    val d = docs(s, dir)
    val counts = NgramLm.train(d, col("text"), LmN)
    val t = TextFns.tokens(col("text"))
    val scoredCorpus = d.select(
      col("doc_id"),
      when(col("doc_id") % 5 === 0,
        array_join(transform(t, x => concat(x, lit("#"), col("doc_id").cast("string"))), " "))
        .otherwise(col("text")).as("text2"))
    NgramLm.score(scoredCorpus, col("doc_id"), col("text2"), counts, LmN)
      .select(col("lm_id").as("doc_id"), col("n_grams"), col("ilog_sum"),
        NgramLm.fluent(col("n_grams"), col("ilog_sum"), FluentNum, FluentDen).as("keep"))
      .orderBy(col("doc_id"))
  }

  private val q108Oracle: String = {
    def gram(toks: String) = TextFns.hash60Sql(s"$toks[i] || ' ' || $toks[i+1]")
    s"""WITH ref AS (SELECT string_split(text, ' ') AS toks FROM documents),
       |ridx AS (SELECT toks, unnest(range(1, len(toks))) AS i FROM ref),
       |c AS (SELECT ${gram("toks")} AS gram, COUNT(*) AS cnt FROM ridx GROUP BY 1),
       |scored AS (
       |  SELECT doc_id, CASE WHEN doc_id % 5 = 0
       |    THEN array_to_string(list_transform(string_split(text, ' '),
       |           x -> x || '#' || CAST(doc_id AS VARCHAR)), ' ')
       |    ELSE text END AS text2
       |  FROM documents),
       |idx AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
       |        FROM (SELECT doc_id, string_split(text2, ' ') AS toks FROM scored)),
       |g AS (SELECT doc_id, ${gram("toks")} AS gram FROM idx),
       |sc AS (SELECT doc_id, COUNT(*) AS n_grams,
       |         CAST(SUM(COALESCE(length(format('{:b}', cnt)) - 1, -1)) AS BIGINT) AS ilog_sum
       |       FROM g LEFT JOIN c USING (gram) GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(n_grams, 0) AS n_grams,
       |  COALESCE(ilog_sum, 0) AS ilog_sum,
       |  COALESCE(ilog_sum, 0) * $FluentDen >= COALESCE(n_grams, 0) * $FluentNum AS keep
       |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin
  }

  // ---- q109: SemDeDup (cluster-scoped semantic dedup) ------------------

  /** E|cluster| target for q109's derived k (Similarity.semanticDedupK):
    * 125 puts sf0.01's 1000-vector corpus at k=8 (the value the oracle
    * has always pinned) while k now GROWS with the corpus — sf0.1's
    * 10k corpus clusters onto k=80, sf1 onto k=800 — holding the
    * Σ|cluster|² pairwise stage linear in N (VERDICT r7 #6). */
  private val SemTargetCluster = 125L
  private val SemThreshold = 0.9

  /** SemDeDup under a full value oracle: the embeddings table unioned
    * with a perturbed copy of itself (q44's planted-duplicate corpus,
    * cosine ≈ 0.995 vs a ≤ 0.61 background), clustered onto the first
    * k = ⌈corpus / 125⌉ vectors as deterministic centroids (q25's IVF
    * construction — production trains them via
    * [[graft.operators.Similarity.semanticDedupAuto]]), then deduped
    * WITHIN clusters at 0.9: each planted copy lands in its original's
    * cluster and drops (keep-earliest), every original survives. The
    * oracle replays the k derivation, assignment (argmax cosine,
    * lowest-centroid tie-break) and the within-cluster keep rule
    * exactly.
    */
  def semDedup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    // planted ids start past max(vec_id), derived from the corpus (see q44)
    val stats = e.agg(max(col("vec_id")).cast("long"), count(lit(1))).head()
    val off = stats.getLong(0) + 1L
    val k = graft.operators.Similarity.semanticDedupK(2L * stats.getLong(1), SemTargetCluster)
    val planted = e.select((col("vec_id") + lit(off)).as("vec_id"),
      concat(array(element_at(col("embedding"), 1) + lit(0.1)),
        slice(col("embedding"), 2, 10000)).as("embedding"))
    graft.operators.Similarity.semanticDedup(
        e.unionByName(planted), e.filter(col("vec_id") < k), SemThreshold)
      .sortOnce(col("vec_id"))
  }

  private val q109Oracle: String = {
    val vcos = VectorFns.cosineSql("v.embedding", "c.embedding")
    val pcos = VectorFns.cosineSql("a.embedding", "b.embedding")
    s"""WITH c2 AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings),
       |    list_prepend(embedding[1] + CAST(0.1 AS DOUBLE), CAST(embedding[2:] AS DOUBLE[]))
       |  FROM embeddings),
       |cent AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS embedding
       |         FROM embeddings
       |         WHERE vec_id < (SELECT CAST(CEIL(COUNT(*) / $SemTargetCluster.0) AS BIGINT) FROM c2)),
       |assign AS (
       |  SELECT vec_id, embedding, centroid_id FROM (
       |    SELECT v.vec_id, v.embedding, c.centroid_id,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY $vcos DESC, c.centroid_id) AS crn
       |    FROM c2 v, cent c)
       |  WHERE crn = 1),
       |losers AS (
       |  SELECT DISTINCT b.vec_id FROM assign a JOIN assign b
       |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
       |  WHERE $pcos >= $SemThreshold)
       |SELECT a.vec_id, a.centroid_id, (l.vec_id IS NULL) AS kept
       |FROM assign a LEFT JOIN losers l USING (vec_id)
       |ORDER BY a.vec_id""".stripMargin
  }

  // ---- q110: contrastive hard-negative mining --------------------------

  private val HnAnchors = 20
  private val HnK = 5

  /** Hard-negative mining for contrastive training: the first 20
    * vectors act as the training batch, and each mines its 5
    * highest-cosine DIFFERENT-label corpus neighbors (the boundary
    * cases a contrastive loss learns from). Exact brute-force ranking
    * here (the batch broadcasts, q24's shape); the oracle recomputes
    * the full different-label ranking per anchor.
    */
  def hardNegMining(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.operators.Similarity.hardNegatives(e, e.filter(col("vec_id") < HnAnchors), HnK)
      .select(col("query_id"), col("query_label"), col("rnk"),
        col("neighbor_id"), col("neighbor_label"), round(col("sim"), 6).as("sim_r"))
      .sortOnce(col("query_id"), col("rnk"))
  }

  private val q110Oracle: String = {
    val cos = VectorFns.cosineSql("q.embedding", "c.embedding")
    s"""SELECT query_id, query_label, rnk, neighbor_id, neighbor_label,
       |  round(sim, 6) AS sim_r FROM (
       |  SELECT q.vec_id AS query_id, q.label AS query_label,
       |    c.vec_id AS neighbor_id, c.label AS neighbor_label, $cos AS sim,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $cos DESC, c.vec_id) AS rnk
       |  FROM embeddings q, embeddings c
       |  WHERE q.vec_id < $HnAnchors AND c.label <> q.label)
       |WHERE rnk <= $HnK ORDER BY query_id, rnk""".stripMargin
  }

  // ---- q111: keyed corpus upsert ---------------------------------------

  /** The corpus-maintenance merge: a refresh cycle re-crawls every 7th
    * doc (its text gains a `rev2 ` prefix) and discovers 25 brand-new
    * docs (ids past max, derived from the corpus so no SF can collide).
    * [[graft.operators.Layout.upsert]] must let every update win its
    * key, carry every untouched base row, and append the new ones —
    * pinned per-row by text fingerprints. The oracle replays the merge
    * with an ANTI JOIN.
    */
  def corpusUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"), col("source"))
    val off = base.agg(max(col("doc_id")).cast("long")).head().getLong(0) + 1L
    val revised = base.filter(col("doc_id") % 7 === 0)
      .withColumn("text", concat(lit("rev2 "), col("text")))
    val fresh = base.filter(col("doc_id") < 25)
      .select((col("doc_id") + lit(off)).as("doc_id"),
        concat(lit("new "), col("text")).as("text"),
        lit("crawl2").as("source"))
    graft.operators.Layout.upsert(base, revised.unionByName(fresh), Seq("doc_id"))
      .select(col("doc_id"), md5(col("text")).as("fp"), col("source"))
      .orderBy(col("doc_id"))
  }

  private val q111Oracle: String =
    s"""WITH base AS (SELECT doc_id, text, source FROM documents),
       |up AS (
       |  SELECT doc_id, 'rev2 ' || text AS text, source FROM base WHERE doc_id % 7 = 0
       |  UNION ALL
       |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
       |    'new ' || text, 'crawl2' FROM base WHERE doc_id < 25),
       |m AS (
       |  SELECT * FROM up
       |  UNION ALL
       |  SELECT b.* FROM base b ANTI JOIN up u USING (doc_id))
       |SELECT doc_id, md5(text) AS fp, source FROM m ORDER BY doc_id""".stripMargin

  // ---- q112: content-defined chunking ----------------------------------

  private val CdcW = 4
  private val CdcD = 8
  /** 48 fixed tokens planted into every 6th doc at token offset 10 —
    * different docs put the block at different absolute offsets (their
    * own prefixes differ), which is the point: content-defined
    * boundaries re-sync inside the block (9 interior boundaries at
    * D=8, verified), so its interior chunks fingerprint identically
    * everywhere while positional schemes would see nothing aligned. */
  private val CdcBlock: String = (1 to 48).map(i => f"cb$i%02d").mkString(" ")

  /** CDC chunk table over the planted corpus, each chunk annotated with
    * how many docs share its fingerprint. The oracle replays the whole
    * construction — window hashes, boundary rule, spans, fingerprints,
    * sharing counts — in DuckDB list comprehensions.
    */
  def cdcChunks(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Cdc
    val t = TextFns.tokens(col("text"))
    val corpus = docs(s, dir).select(
      col("doc_id"),
      when(col("doc_id") % 6 === 0,
        // tail guarded on BOTH sides: a past-the-end slice is [] (→ ''
        // joined, trailing empty token) in Spark but NULL (→ skipped by
        // concat_ws) in DuckDB — q94's portability rule
        concat_ws(" ", array_join(slice(t, 1, 10), " "), lit(CdcBlock),
          when(size(t) >= 11, array_join(slice(t, 11, 1000000), " "))))
        .otherwise(col("text")).as("text2"))
    Cdc.sharedChunks(Cdc.chunks(corpus, col("doc_id"), col("text2"), CdcW, CdcD))
      .select(col("cdc_id").as("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_tok"), col("fp"), col("n_docs"))
      .sortOnce(col("doc_id"), col("chunk_idx"))
  }

  private val q112Oracle: String = {
    val gramHash = TextFns.hash60Sql(s"array_to_string(toks[j-${CdcW - 1}:j], ' ')")
    s"""WITH corpus AS (
       |  SELECT doc_id, CASE WHEN doc_id % 6 = 0
       |    THEN concat_ws(' ', array_to_string(t[1:10], ' '), '$CdcBlock',
       |                   CASE WHEN len(t) >= 11 THEN array_to_string(t[11:], ' ') END)
       |    ELSE text END AS text2
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)),
       |tk AS (SELECT doc_id, string_split(text2, ' ') AS toks,
       |              len(string_split(text2, ' ')) AS n FROM corpus),
       |b AS (SELECT doc_id, toks,
       |  list_append(list_filter(range($CdcW, n), j -> $gramHash % $CdcD = 0), n) AS bs
       |  FROM tk),
       |k AS (SELECT doc_id, toks, bs, unnest(range(1, len(bs) + 1)) AS ci FROM b),
       |sp AS (SELECT doc_id, ci AS chunk_idx,
       |         CASE WHEN ci = 1 THEN 1 ELSE bs[ci - 1] + 1 END AS start_tok,
       |         bs[ci] AS end_tok, toks FROM k),
       |c AS (SELECT doc_id, chunk_idx, start_tok,
       |        end_tok - start_tok + 1 AS n_tok,
       |        md5(array_to_string(toks[start_tok:end_tok], ' ')) AS fp FROM sp),
       |f AS (SELECT fp, COUNT(DISTINCT doc_id) AS n_docs FROM c GROUP BY fp)
       |SELECT doc_id, chunk_idx, start_tok, n_tok, fp, n_docs
       |FROM c JOIN f USING (fp)
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  // ---- q113: perceptual-hash image near-dup ----------------------------

  private val PhashMaxHamming = 8

  /** Image DEDUP through the real codec path: deterministic
    * cell-uniform PNGs (every 3 consecutive ids share a pattern; the
    * third member is slightly perturbed) → real ImageIO decode →
    * [[graft.operators.Multimodal.ImageCodec.dhash64]] difference hash
    * → complete hamming-≤8 pairs via the pigeonhole machinery
    * ([[graft.operators.Dedup.hammingNearDups]], the same core that
    * serves text SimHash). Because the cells are uniform and aligned,
    * the oracle predicts every decoded hash bit in closed form and
    * replays the pair search with `bit_count(xor(...))` — a green row
    * proves the decode, the box-mean reduction, the bit packing
    * (including the sign bit's two's complement), and the pigeonhole
    * completeness all at once.
    */
  def imagePhashDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Dedup, Multimodal}
    val ph = Multimodal.imagePhash(Multimodal.syntheticCellImages(docs(s, dir)))
      .filter(col("phash").isNotNull)
      .select(col("media_id").as("doc_id"), col("phash").as("fp"))
    Dedup.hammingNearDups(ph, maxHamming = PhashMaxHamming, bits = 64, spareBlocks = 2)
      .select(col("doc_a").as("img_a"), col("doc_b").as("img_b"), col("hamming"))
      .sortOnce(col("img_a"), col("img_b"))
  }

  /** DuckDB rendition of the generator's per-cell hash
    * `hash60("<seed>:<r>:<c>") % 200` at grid column `cExpr`. */
  private def cellHashSql(cExpr: String): String =
    TextFns.hash60Sql(
      s"CAST(seed AS VARCHAR) || ':' || CAST(r.r AS VARCHAR) || ':' || CAST($cExpr AS VARCHAR)")

  private val q113Oracle: String =
    s"""WITH bits AS (
       |  SELECT doc_id, r.r * 8 + c.c AS pos,
       |    CASE WHEN
       |      ${cellHashSql("c.c + 1")} % 200
       |        + CASE WHEN doc_id % 3 = 2 AND c.c + 1 = 4 AND r.r < 2 THEN 55 ELSE 0 END
       |      > ${cellHashSql("c.c")} % 200
       |        + CASE WHEN doc_id % 3 = 2 AND c.c = 4 AND r.r < 2 THEN 55 ELSE 0 END
       |    THEN 1 ELSE 0 END AS bit
       |  FROM (SELECT doc_id, doc_id // 3 AS seed FROM documents),
       |       (SELECT unnest(range(8)) AS r) r,
       |       (SELECT unnest(range(8)) AS c) c),
       |ph AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN pos < 63 THEN CAST(bit AS BIGINT) << pos ELSE 0 END) AS BIGINT)
       |    + CASE WHEN MAX(CASE WHEN pos = 63 THEN bit ELSE 0 END) = 1
       |        THEN CAST(-9223372036854775807 AS BIGINT) - 1 ELSE 0 END AS fp
       |  FROM bits GROUP BY doc_id)
       |SELECT a.doc_id AS img_a, b.doc_id AS img_b,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
       |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= $PhashMaxHamming
       |ORDER BY img_a, img_b""".stripMargin

  // ---- q114: perceptual-hash audio near-dup ----------------------------

  /** Audio dedup through the real codec path — q113's shape on
    * waveforms: frame-uniform WAVs (groups of 3 ids share a waveform,
    * the third slightly re-gained) → real `javax.sound` decode →
    * [[graft.operators.Multimodal.AudioCodec.energyHash64]] energy-delta
    * hash → complete hamming-≤8 pairs via the same
    * [[graft.operators.Dedup.hammingNearDups]] pigeonhole core. The
    * frame-aligned uniform samples let the oracle predict every decoded
    * hash bit in closed form; a green row proves the RIFF parse, the
    * PCM sample extraction, the |sample| frame means, the bit packing,
    * and the pigeonhole completeness at once.
    */
  def audioPhashDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Dedup, Multimodal}
    val ph = Multimodal.audioPhash(Multimodal.syntheticFrameAudio(docs(s, dir)))
      .filter(col("phash").isNotNull)
      .select(col("media_id").as("doc_id"), col("phash").as("fp"))
    Dedup.hammingNearDups(ph, maxHamming = PhashMaxHamming, bits = 64, spareBlocks = 2)
      .select(col("doc_a").as("aud_a"), col("doc_b").as("aud_b"), col("hamming"))
      .sortOnce(col("aud_a"), col("aud_b"))
  }

  /** DuckDB rendition of the audio generator's per-frame value
    * `hash60("aud:<seed>:<f>") % 2500` plus the `id % 3 = 2`
    * re-gain perturbation, at frame expression `fExpr`. */
  private def frameValSql(fExpr: String): String = {
    val h = TextFns.hash60Sql(
      s"'aud:' || CAST(seed AS VARCHAR) || ':' || CAST($fExpr AS VARCHAR)")
    s"$h % 2500 + CASE WHEN doc_id % 3 = 2 AND ($fExpr) IN (5, 6) THEN 300 ELSE 0 END"
  }

  private val q114Oracle: String =
    s"""WITH bits AS (
       |  SELECT doc_id, f.f AS pos,
       |    CASE WHEN ${frameValSql("f.f + 1")} > ${frameValSql("f.f")}
       |    THEN 1 ELSE 0 END AS bit
       |  FROM (SELECT doc_id, doc_id // 3 AS seed FROM documents),
       |       (SELECT unnest(range(64)) AS f) f),
       |ph AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN pos < 63 THEN CAST(bit AS BIGINT) << pos ELSE 0 END) AS BIGINT)
       |    + CASE WHEN MAX(CASE WHEN pos = 63 THEN bit ELSE 0 END) = 1
       |        THEN CAST(-9223372036854775807 AS BIGINT) - 1 ELSE 0 END AS fp
       |  FROM bits GROUP BY doc_id)
       |SELECT a.doc_id AS aud_a, b.doc_id AS aud_b,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
       |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= $PhashMaxHamming
       |ORDER BY aud_a, aud_b""".stripMargin

  // ---- q115: BM25 ranked retrieval -------------------------------------

  /** Lexical search over the corpus: 60 deterministic query terms (20
    * queries × 3 hash60-drawn slots over the lexicographic vocabulary —
    * derived IN-PLAN from the corpus, nothing hardcoded) ranked by
    * [[graft.operators.Retrieval.bm25TopK]]'s integer fixed-point BM25,
    * top 10 per query. The oracle replays the tokenize → postings → df
    * → query draw → fixed-point scoring → ranking chain arithmetic
    * op for arithmetic op, so a green row pins the whole scorer
    * including its tie order. (The vocabulary row_number runs on a
    * vocabulary-sized table — tiny here and bounded in general; the
    * corpus-side plan never sees a global window.)
    */
  def bm25Search(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.operators.Retrieval.bm25TopK(d, col("doc_id"), col("text"),
        q115QueryTerms(s, d), k = 10)
      .sortOnce(col("query_id"), col("rank"))
  }

  /** q115's 20×3 hashed query-term draw over the corpus vocabulary —
    * shared by q115/q319 so the eval judges exactly the ranked terms. */
  private def q115QueryTerms(s: SparkSession, d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = d.select(explode(TextFns.tokens(col("text"))).as("term")).distinct()
      .withColumn("idx", row_number().over(Window.orderBy(col("term"))).cast("long") - 1)
    val vsize = vocab.agg(count(lit(1)).as("vsize"))
    val slots = s.range(20).select(col("id").as("query_id"))
      .crossJoin(s.range(3).select(col("id").as("slot")))
    slots.crossJoin(broadcast(vsize))
      .withColumn("idx", TextFns.hash60(concat(lit("qry:"), col("query_id").cast("string"),
        lit(":"), col("slot").cast("string"))) % col("vsize"))
      .join(vocab, "idx")
      .select(col("query_id"), col("term"))
  }

  /** The tokenize → postings → df → query-draw → fixed-point scoring →
    * ranking CTE chain of the q115 replay (rk is the UNFILTERED ranked
    * relation) — shared with q319, whose qrels derive from the same tf
    * and qt members. */
  private val bm25Ctes: String = {
    val qhash = TextFns.hash60Sql(
      "'qry:' || CAST(q.q AS VARCHAR) || ':' || CAST(sl.s AS VARCHAR)")
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |post AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term FROM toks),
       |tf AS (
       |  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM post GROUP BY 1, 2, 3),
       |dfx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |vocab AS (SELECT term, ROW_NUMBER() OVER (ORDER BY term) - 1 AS idx FROM dfx),
       |vs AS (SELECT COUNT(*) AS vsize FROM vocab),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_tokens
       |  FROM (SELECT DISTINCT doc_id, dl FROM tf)),
       |qt AS (
       |  SELECT DISTINCT q.q AS query_id, v.term
       |  FROM (SELECT unnest(range(20)) AS q) q,
       |       (SELECT unnest(range(3)) AS s) sl, vs
       |  JOIN vocab v ON v.idx = $qhash % vs.vsize),
       |terms AS (
       |  SELECT qt.query_id, tf.doc_id, tf.tf, tf.dl, dfx.df,
       |    stats.n_docs, stats.total_tokens,
       |    ((stats.n_docs + 1) * 1048576) // (dfx.df + 1) AS ratio
       |  FROM tf JOIN qt ON tf.term = qt.term JOIN dfx ON tf.term = dfx.term, stats),
       |scored AS (
       |  SELECT query_id, doc_id,
       |    (length(format('{:b}', ratio)) - 1) * 1024
       |      + (ratio * 1024) // (CAST(1 AS BIGINT) << (length(format('{:b}', ratio)) - 1))
       |      - 1024 AS widf,
       |    (tf * 2200 * 1000)
       |      // (tf * 1000 + (1200 * (250 + (750 * dl * n_docs) // total_tokens)) // 1000)
       |      AS sat1000
       |  FROM terms),
       |sc AS (
       |  SELECT query_id, doc_id, CAST(SUM(widf * sat1000) AS BIGINT) AS score
       |  FROM scored GROUP BY 1, 2),
       |rk AS (
       |  SELECT query_id, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
       |  FROM sc)""".stripMargin
  }

  private val q115Oracle: String =
    s"""WITH $bm25Ctes
       |SELECT query_id, doc_id, score, CAST(rn AS INTEGER) AS rank
       |FROM rk WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin

  /** q319: ranked-retrieval EVALUATION — exact-integer MRR / P@k /
    * recall@k per query ([[graft.operators.Retrieval.rankedEval]])
    * over q115's BM25 ranking, judged against a relevance set DERIVED
    * from the corpus itself: a doc is relevant to a query iff it
    * contains ≥ 2 of the query's 3 drawn terms (computable identically
    * by both engines, and exactly the multi-term coverage BM25 is
    * supposed to surface — so hits/recall land strictly between 0 and
    * 1 and every branch of the metric arithmetic runs). Reciprocal
    * rank releases as the exact rational over lcm(1..10) = 2520; a
    * query with no relevant docs releases the −1 recall sentinel. The
    * oracle replays the whole chain — scoring, ranking, the ≥2-term
    * qrels, and the metric integer arithmetic — from scratch.
    */
  def retrievalEval(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val qterms = q115QueryTerms(s, d)
      .localCheckpoint(false) // the ranking AND the qrels both consume it
    val ranking = graft.operators.Retrieval.bm25TopK(
      d, col("doc_id"), col("text"), qterms, k = 10)
    val qrels = d
      .select(col("doc_id"),
        explode(array_distinct(TextFns.tokens(col("text")))).as("term"))
      .join(broadcast(qterms), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") >= 2)
    graft.operators.Retrieval.rankedEval(ranking, qrels, k = 10)
      .orderBy(col("query_id"))
  }

  private val q319Oracle: String =
    s"""WITH $bm25Ctes,
       |qrels AS (
       |  SELECT qt.query_id, tf.doc_id
       |  FROM tf JOIN qt ON tf.term = qt.term
       |  GROUP BY 1, 2 HAVING COUNT(DISTINCT tf.term) >= 2),
       |nrel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
       |         FROM qrels GROUP BY 1),
       |topk AS (SELECT query_id, doc_id, rn AS rank FROM rk WHERE rn <= 10),
       |hit AS (
       |  SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS n_ret,
       |    CAST(SUM(CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS hits,
       |    CAST(COALESCE(MIN(CASE WHEN q.doc_id IS NOT NULL THEN t.rank END),
       |         0) AS BIGINT) AS first_rank
       |  FROM topk t LEFT JOIN qrels q
       |    ON t.query_id = q.query_id AND t.doc_id = q.doc_id
       |  GROUP BY 1)
       |SELECT h.query_id, COALESCE(n.n_rel, 0) AS n_rel, h.n_ret, h.hits,
       |  h.first_rank,
       |  CAST(CASE WHEN h.first_rank > 0 THEN 2520 // h.first_rank
       |       ELSE 0 END AS BIGINT) AS rr_num,
       |  CAST(2520 AS BIGINT) AS rr_den,
       |  (1000000 * h.hits) // 10 AS prec_ppm,
       |  CASE WHEN COALESCE(n.n_rel, 0) > 0
       |       THEN (1000000 * h.hits) // n.n_rel
       |       ELSE CAST(-1 AS BIGINT) END AS recall_ppm
       |FROM hit h LEFT JOIN nrel n USING (query_id)
       |ORDER BY query_id""".stripMargin

  // ---- q117: Gopher-style quality rules --------------------------------

  /** Rule thresholds tuned to the gate corpus so BOTH outcomes occur
    * (n_words 10–99, mean_len_fp 370–530, stop_hits 0–14, top_frac_fp
    * 51–300 at sf0.01): ≥20 words, ≥2 stopword hits, most-frequent
    * word ≤ 15%. */
  private val qrRules = graft.operators.QualityRules.Rules(
    minWords = 20, maxWords = 100000, minMeanLenFp = 300,
    maxMeanLenFp = 1000, minStopHits = 2, maxTopFracFp = 150)

  def qualityRules(s: SparkSession, dir: String): DataFrame =
    graft.operators.QualityRules.score(docs(s, dir), col("doc_id"), col("text"), qrRules)
      .orderBy(col("doc_id"))

  private val q117Oracle: String = {
    val stops = TextFns.EnglishStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |wc AS (SELECT doc_id, unnest(t) AS w FROM base),
       |mult AS (
       |  SELECT doc_id, MAX(c) AS topm
       |  FROM (SELECT doc_id, w, COUNT(*) AS c FROM wc GROUP BY 1, 2) GROUP BY 1),
       |m AS (
       |  SELECT b.doc_id,
       |    CAST(len(t) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(t, x -> len(x))) AS BIGINT) AS sum_len,
       |    CAST(len(list_filter(t, x -> list_contains([$stops], x))) AS BIGINT) AS stop_hits,
       |    CAST(topm AS BIGINT) AS top_mult,
       |    CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct
       |  FROM base b JOIN mult USING (doc_id)),
       |fp AS (
       |  SELECT doc_id, n_words, sum_len * 100 // n_words AS mean_len_fp, stop_hits,
       |    top_mult * 1000 // n_words AS top_frac_fp,
       |    n_distinct * 1000 // n_words AS distinct_frac_fp
       |  FROM m)
       |SELECT doc_id, n_words, mean_len_fp, stop_hits, top_frac_fp, distinct_frac_fp,
       |  CAST(n_words BETWEEN ${qrRules.minWords} AND ${qrRules.maxWords}
       |    AND mean_len_fp BETWEEN ${qrRules.minMeanLenFp} AND ${qrRules.maxMeanLenFp}
       |    AND stop_hits >= ${qrRules.minStopHits}
       |    AND top_frac_fp <= ${qrRules.maxTopFracFp} AS BIGINT) AS pass
       |FROM fp ORDER BY doc_id""".stripMargin
  }

  // ---- q118: temperature mixture sampling ------------------------------

  private val TempBudget = 300L

  def temperatureMix(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.temperatureSample(
        docs(s, dir).select(col("doc_id"), col("lang")),
        col("lang"), col("doc_id"), budget = TempBudget)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))

  private val q118Oracle: String = {
    val h = TextFns.seededHashSql(0, "CAST(doc_id AS VARCHAR)")
    s"""WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
       |s AS (SELECT lang, n, CAST(floor(sqrt(n * 1000000)) AS BIGINT) AS sl FROM c),
       |t AS (SELECT lang, least(($TempBudget * sl) // (SELECT SUM(sl) FROM s), n) AS tl FROM s),
       |r AS (
       |  SELECT lang, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY $h, doc_id) AS rn
       |  FROM documents)
       |SELECT r.lang, doc_id FROM r JOIN t USING (lang)
       |WHERE rn <= tl ORDER BY lang, doc_id""".stripMargin
  }

  // ---- q119: corpus snapshot diff --------------------------------------

  /** The "new crawl": docs dropped (id ≡ 0 mod 7), revised (id ≡ 0 mod
    * 5, a token appended), and added (id ≡ 0 mod 11 re-ingested under a
    * shifted id) — mirrored exactly in the oracle. */
  private def newSnapshot(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    d.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionAll(
        d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
  }

  def snapshotDiff(s: SparkSession, dir: String): DataFrame =
    graft.operators.SnapshotDiff.changes(
        docs(s, dir), newSnapshot(s, dir), col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("status"))
      .orderBy(col("doc_id"), col("status"))

  private val q119Oracle: String =
    """WITH newsnap AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0),
      |o AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |n AS (SELECT doc_id, md5(text) AS fp FROM newsnap)
      |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN o.doc_id IS NULL THEN 'added'
      |       WHEN n.doc_id IS NULL THEN 'removed'
      |       ELSE 'changed' END AS status
      |FROM o FULL JOIN n ON o.doc_id = n.doc_id
      |WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.fp <> n.fp
      |ORDER BY doc_id, status""".stripMargin

  // ---- q120: DSIR importance selection ---------------------------------

  private val DsirBuckets = 64
  private val DsirTopN = 50

  def dsirSelect(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dsir.selectTop(docs(s, dir), col("doc_id"), col("text"),
      col("lang") === "en", n = DsirTopN, buckets = DsirBuckets)

  private val q120Oracle: String = {
    val h = TextFns.hash60Sql("bigram")
    s"""WITH toks AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_tgt,
       |    string_split(text, ' ') AS t
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, is_tgt,
       |    unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bigram
       |  FROM toks WHERE len(t) >= 2),
       |bk AS (SELECT doc_id, is_tgt, $h % $DsirBuckets AS b FROM bg),
       |cnt AS (
       |  SELECT b, CAST(COUNT(*) AS BIGINT) AS raw_c,
       |    CAST(SUM(is_tgt) AS BIGINT) AS tgt_c
       |  FROM bk GROUP BY 1),
       |w AS (
       |  SELECT b,
       |    (length(format('{:b}', r)) - 1) * 1024
       |      + (r * 1024) // (CAST(1 AS BIGINT) << (length(format('{:b}', r)) - 1))
       |      - 1024 - 20480 AS w
       |  FROM (SELECT b, greatest(((tgt_c + 1) * 1048576) // (raw_c + 1), 1) AS r FROM cnt)),
       |sc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(w) AS BIGINT) AS score
       |  FROM bk JOIN w USING (b) GROUP BY 1)
       |SELECT doc_id, n_bigrams, score FROM sc
       |ORDER BY score DESC, doc_id LIMIT $DsirTopN""".stripMargin
  }

  // ---- q121: int8 scalar-quantized ANN ---------------------------------

  private val SqTopK = 5

  def sq8Ann(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Quantization
    val e = emb(s, dir)
    val stats = Quantization.dimStats(e, col("embedding"))
    val codes = Quantization.quantize(e, col("vec_id"), col("embedding"), stats)
    Quantization.topKInt(codes, codes.filter(col("vec_id") % 50 === 0), SqTopK)
      .sortOnce(col("query_id"), col("rnk"))
  }

  private val q121Oracle: String =
    s"""WITH u AS (
       |  SELECT vec_id,
       |    unnest([{'i': i, 'x': CAST(embedding[i] AS DOUBLE)}
       |            for i in range(1, len(embedding) + 1)], recursive := true)
       |  FROM embeddings),
       |stats AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM u GROUP BY i),
       |codes AS (
       |  SELECT vec_id, u.i,
       |    CASE WHEN mx = mn THEN 0
       |         ELSE CAST(floor((x - mn) / (mx - mn) * 255 + 0.5) AS BIGINT) - 128
       |    END AS c
       |  FROM u JOIN stats ON u.i = stats.i),
       |dot AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(SUM(q.c * c.c) AS BIGINT) AS score
       |  FROM codes q JOIN codes c ON q.i = c.i AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id % 50 = 0 GROUP BY 1, 2)
       |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id, score FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
       |  FROM dot)
       |WHERE rnk <= $SqTopK ORDER BY query_id, rnk""".stripMargin

  // ---- q139: two-stage ANN (coarse slice → exact re-rank) --------------

  /** kCoarse 20 ≫ k 5 over a 16-of-64-dim coarse slice: the production
    * re-rank composition (q121 is the single-stage exact path). */
  def twoStageAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Quantization
    val e = emb(s, dir)
    val stats = Quantization.dimStats(e, col("embedding"))
    val codes = Quantization.quantize(e, col("vec_id"), col("embedding"), stats)
    Quantization.topKTwoStage(codes, codes.filter(col("vec_id") % 50 === 0),
        k = SqTopK, kCoarse = 20, coarseDims = 16)
      .sortOnce(col("query_id"), col("rnk"))
  }

  private val q139Oracle: String =
    s"""WITH u AS (
       |  SELECT vec_id,
       |    unnest([{'i': i, 'x': CAST(embedding[i] AS DOUBLE)}
       |            for i in range(1, len(embedding) + 1)], recursive := true)
       |  FROM embeddings),
       |stats AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM u GROUP BY i),
       |codes AS (
       |  SELECT vec_id, u.i,
       |    CASE WHEN mx = mn THEN 0
       |         ELSE CAST(floor((x - mn) / (mx - mn) * 255 + 0.5) AS BIGINT) - 128
       |    END AS c
       |  FROM u JOIN stats ON u.i = stats.i),
       |cd AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(SUM(CASE WHEN q.i <= 16 THEN q.c * c.c ELSE 0 END) AS BIGINT) AS coarse,
       |    CAST(SUM(q.c * c.c) AS BIGINT) AS score
       |  FROM codes q JOIN codes c ON q.i = c.i AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id % 50 = 0 GROUP BY 1, 2),
       |cut AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY coarse DESC, neighbor_id) AS crnk
       |  FROM cd)
       |SELECT query_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id, score FROM (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
       |  FROM cut WHERE crnk <= 20)
       |WHERE rnk <= $SqTopK ORDER BY query_id, rnk""".stripMargin

  // ---- q122: shard-overlap MinHash matrix ------------------------------

  private val OverlapPerms = 16

  def shardOverlap(s: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusOverlap.overlapMatrix(
        docs(s, dir), col("source"), col("text"), numPerms = OverlapPerms)
      .orderBy(col("src_a"), col("src_b"))

  private val q122Oracle: String = {
    val h = TextFns.hash60Sql("shingle")
    val sigCols = (0 until OverlapPerms)
      .map(i => s"MIN(${TextFns.minhashPermSql(i, "h")}) AS s$i").mkString(", ")
    val matchSum = (0 until OverlapPerms)
      .map(i => s"CASE WHEN x.s$i = y.s$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
       |ssh AS (
       |  SELECT DISTINCT source, shingle FROM (
       |    SELECT source,
       |      unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       |              for i in range(1, len(t) - 1)]) AS shingle
       |    FROM toks WHERE len(t) >= 3)),
       |hashed AS (SELECT source, $h AS h FROM ssh),
       |sig AS (SELECT source, $sigCols FROM hashed GROUP BY source),
       |sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM ssh GROUP BY source),
       |inter AS (
       |  SELECT a.source AS ia, b.source AS ib, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM ssh a JOIN ssh b ON a.shingle = b.shingle AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT sa.source AS src_a, sb.source AS src_b,
       |  CAST($matchSum AS BIGINT) AS sig_matches,
       |  COALESCE(c, 0) / (sa.n + sb.n - COALESCE(c, 0)) AS jacc
       |FROM sizes sa JOIN sizes sb ON sa.source < sb.source
       |LEFT JOIN inter ON ia = sa.source AND ib = sb.source
       |JOIN sig x ON x.source = sa.source
       |JOIN sig y ON y.source = sb.source
       |ORDER BY src_a, src_b""".stripMargin
  }

  // ---- q123: tokenizer fertility per language --------------------------

  /** Tokenizer-fit analytics — the per-language fertility audit run
    * before committing to a vocabulary (multilingual tokenizers trade
    * fertility across languages; published as tokens-per-word /
    * bytes-per-token tables in the mBERT/XLM-R/BLOOM tokenizer
    * literature). Composes the q104 BPE tokenizer with the language
    * column: per language, corpus totals and two ×1000 fixed-point
    * ratios. One narrow per-row tokenize + one 5-row aggregate.
    */
  def tokenFertility(s: SparkSession, dir: String): DataFrame = {
    val bpe = graft.functions.Tokenizer.MergeRank(BpeMerges, BpeMaxWord)
    docs(s, dir).select(
        col("lang"),
        size(TextFns.tokens(col("text"))).cast("long").as("nw"),
        size(bpe.tokenize(col("text"))).cast("long").as("np"),
        length(col("text")).cast("long").as("nc"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_words"),
        sum(col("np")).as("n_pieces"), sum(col("nc")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_pieces"), col("n_chars"),
        expr("n_pieces * 1000 div n_words").as("fertility_fp"),
        expr("n_chars * 1000 div n_pieces").as("chars_per_piece_fp"))
      .orderBy(col("lang"))
  }

  private val q123Oracle: String =
    s"""WITH RECURSIVE
       |$bpeReplayCtes,
       |per_doc AS (
       |  SELECT d.doc_id, CAST(COALESCE(SUM(len(p)), 0) AS BIGINT) AS np
       |  FROM documents d LEFT JOIN allw USING (doc_id) GROUP BY 1),
       |sel AS (
       |  SELECT d.lang, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nw,
       |    CAST(len(d.text) AS BIGINT) AS nc, pd.np
       |  FROM documents d JOIN per_doc pd USING (doc_id))
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(nw) AS BIGINT) AS n_words,
       |  CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(nc) AS BIGINT) AS n_chars,
       |  CAST((CAST(SUM(np) AS BIGINT) * 1000) // CAST(SUM(nw) AS BIGINT) AS BIGINT)
       |    AS fertility_fp,
       |  CAST((CAST(SUM(nc) AS BIGINT) * 1000) // CAST(SUM(np) AS BIGINT) AS BIGINT)
       |    AS chars_per_piece_fp
       |FROM sel GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q124: tiered curriculum interleave ------------------------------

  private val CurriculumTiers = 5

  /** Curriculum over the corpus scored by vocabulary richness (q117's
    * distinct_frac_fp — a pure per-row integer, so the whole schedule
    * is engine-exact): 5 tiers, round-robin interleaved. */
  def curriculumOrder(s: SparkSession, dir: String): DataFrame = {
    val scored = graft.operators.QualityRules
      .score(docs(s, dir), col("doc_id"), col("text"))
      .select(col("doc_id"), col("distinct_frac_fp"))
    graft.operators.Curriculum.tieredInterleave(
        scored, col("doc_id"), col("distinct_frac_fp"), tiers = CurriculumTiers)
      .select(col("id").as("doc_id"), col("score"), col("tier"), col("curriculum_pos"))
      .orderBy(col("curriculum_pos"))
  }

  private val q124Oracle: String =
    s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |scored AS (
       |  SELECT doc_id,
       |    (CAST(len(list_distinct(t)) AS BIGINT) * 1000) // CAST(len(t) AS BIGINT)
       |      AS score
       |  FROM base),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM scored),
       |r AS (
       |  SELECT doc_id, score,
       |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS x
       |  FROM scored),
       |t AS (SELECT doc_id, score, x, (x * $CurriculumTiers) // nn AS tier FROM r, n),
       |p AS (
       |  SELECT doc_id, score, tier,
       |    x - (tier * nn + $CurriculumTiers - 1) // $CurriculumTiers AS pos
       |  FROM t, n)
       |SELECT doc_id, CAST(score AS BIGINT) AS score, CAST(tier AS BIGINT) AS tier,
       |  CAST(ROW_NUMBER() OVER (ORDER BY pos, tier) AS BIGINT) AS curriculum_pos
       |FROM p ORDER BY curriculum_pos""".stripMargin

  // ---- q126: C4 structural filters -------------------------------------

  /** Page synth puts BOTH outcomes of every rule in play: terminal
    * punctuation present/absent by `doc_id % 3`, a javascript line on
    * `% 4`, page-level bans on `% 17` (lorem ipsum) and `% 19` (code
    * brace), and a second content line only when the doc has ≥13
    * tokens (guarded identically on both engines — Spark's
    * out-of-range `slice` is `[]` where DuckDB's is NULL). */
  private val c4Rules = graft.operators.C4Filters.Rules(
    terminal = Seq(".", "!", "?"), minLineWords = 5,
    banLineSubstrings = Seq("javascript"),
    banPageSubstrings = Seq("lorem ipsum", "{"), minKeptLines = 2)

  def c4Filters(s: SparkSession, dir: String): DataFrame = {
    val t = TextFns.tokens(col("text"))
    val pages = docs(s, dir).select(
      col("doc_id"),
      concat_ws("\n",
        concat(array_join(slice(t, 1, 8), " "),
          when(col("doc_id") % 3 === 0, lit("."))
            .when(col("doc_id") % 3 === 1, lit("!"))
            .otherwise(lit(""))),
        when(col("doc_id") % 4 === 0, lit("please enable javascript to view this page.")),
        when(col("doc_id") % 17 === 0, lit("lorem ipsum dolor sit amet consectetur adipiscing.")),
        when(col("doc_id") % 19 === 0, lit("function f() { return 1; }")),
        when(size(t) >= 13, concat(array_join(slice(t, 9, 10), " "), lit("?")))).as("page"))
    graft.operators.C4Filters.clean(pages, col("doc_id"), col("page"), c4Rules)
      .orderBy(col("c4_id"))
  }

  private val q126Oracle: String =
    """WITH pages AS (
      |  SELECT doc_id,
      |    concat_ws(chr(10),
      |      array_to_string(t[1:8], ' ') ||
      |        CASE WHEN doc_id % 3 = 0 THEN '.' WHEN doc_id % 3 = 1 THEN '!' ELSE '' END,
      |      CASE WHEN doc_id % 4 = 0 THEN 'please enable javascript to view this page.' END,
      |      CASE WHEN doc_id % 17 = 0 THEN 'lorem ipsum dolor sit amet consectetur adipiscing.' END,
      |      CASE WHEN doc_id % 19 = 0 THEN 'function f() { return 1; }' END,
      |      CASE WHEN len(t) >= 13 THEN array_to_string(t[9:18], ' ') || '?' END) AS page
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |kept AS (
      |  SELECT doc_id, page, string_split(page, chr(10)) AS ls,
      |    list_filter(string_split(page, chr(10)), l ->
      |      (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?')
      |      AND len(string_split(l, ' ')) >= 5
      |      AND NOT contains(lower(l), 'javascript')) AS kl
      |  FROM pages)
      |SELECT doc_id AS c4_id,
      |  COALESCE(array_to_string(kl, chr(10)), '') AS clean_text,
      |  CAST(len(ls) AS BIGINT) AS n_lines,
      |  CAST(len(kl) AS BIGINT) AS n_kept,
      |  CAST((NOT contains(lower(page), 'lorem ipsum') AND NOT contains(page, '{')
      |    AND len(kl) >= 2) AS BIGINT) AS page_pass
      |FROM kept ORDER BY c4_id""".stripMargin

  // ---- q127: corpus keep-first paragraph dedup -------------------------

  /** Synth puts every dedup case in play: a canned paragraph shared
    * across the `% 5` docs (cross-doc dup), a second canned one on
    * `% 7`, docs `% 97` made ENTIRELY of canned paragraphs (fully
    * deduplicated away — totality), and doc 0 carrying the `% 7` canned
    * para twice (intra-doc dup). Unique content comes from guarded
    * token slices (Spark's out-of-range slice is `[]` where DuckDB's is
    * NULL, so both sides guard on token count). */
  def paragraphDedup(s: SparkSession, dir: String): DataFrame = {
    val t = TextFns.tokens(col("text"))
    val parA = "shared data processing paragraph"
    val parB = "mirror copy boilerplate paragraph"
    val pages = docs(s, dir).select(
      col("doc_id"),
      concat_ws("\n\n",
        when(col("doc_id") % 97 === 0, lit(parA))
          .otherwise(array_join(slice(t, 1, 10), " ")),
        when(col("doc_id") % 97 === 0, lit(parB))
          .when(col("doc_id") % 5 === 0, lit(parA))
          .when(size(t) >= 16, array_join(slice(t, 11, 6), " ")),
        when(col("doc_id") % 7 === 0, lit(parB))
          .when(size(t) >= 22, array_join(slice(t, 17, 6), " "))).as("page"))
    graft.operators.ParagraphDedup.dropDuplicateParagraphs(
        pages, col("doc_id"), col("page"))
      .orderBy(col("pd_id"))
  }

  private val q127Oracle: String = {
    val fp = TextFns.hash60Sql("para")
    s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |pages AS (
       |  SELECT doc_id,
       |    concat_ws(chr(10) || chr(10),
       |      CASE WHEN doc_id % 97 = 0 THEN 'shared data processing paragraph'
       |           ELSE array_to_string(t[1:10], ' ') END,
       |      CASE WHEN doc_id % 97 = 0 THEN 'mirror copy boilerplate paragraph'
       |           WHEN doc_id % 5 = 0 THEN 'shared data processing paragraph'
       |           WHEN len(t) >= 16 THEN array_to_string(t[11:16], ' ') END,
       |      CASE WHEN doc_id % 7 = 0 THEN 'mirror copy boilerplate paragraph'
       |           WHEN len(t) >= 22 THEN array_to_string(t[17:22], ' ') END) AS page
       |  FROM base),
       |paras AS (
       |  SELECT doc_id AS pd_id, unnest(range(1, len(ps) + 1)) AS pos, unnest(ps) AS para
       |  FROM (SELECT doc_id, string_split(page, chr(10) || chr(10)) AS ps FROM pages)),
       |rk AS (
       |  SELECT pd_id, pos, para,
       |    ROW_NUMBER() OVER (PARTITION BY $fp ORDER BY pd_id, pos) AS rn
       |  FROM paras)
       |SELECT pd_id,
       |  COALESCE(string_agg(CASE WHEN rn = 1 THEN para END,
       |    chr(10) || chr(10) ORDER BY pos), '') AS clean_text,
       |  COUNT(*) AS n_paras,
       |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
       |FROM rk GROUP BY pd_id ORDER BY pd_id""".stripMargin
  }

  // ---- q129: TF-IDF keyword extraction ---------------------------------

  def tfidfKeywords(s: SparkSession, dir: String): DataFrame =
    graft.operators.Keywords.tfidfTopK(docs(s, dir), col("doc_id"), col("text"), k = 5)
      .orderBy(col("doc_id"), col("rank"))

  private val q129Oracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |post AS (SELECT doc_id, unnest(t) AS term FROM toks),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM post GROUP BY 1, 2),
      |dfx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |st AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
      |sc AS (
      |  SELECT doc_id, term,
      |    tf * ((length(format('{:b}', ratio)) - 1) * 1024
      |      + (ratio * 1024) // (CAST(1 AS BIGINT) << (length(format('{:b}', ratio)) - 1))
      |      - 1024) AS score
      |  FROM (SELECT tf.doc_id, tf.term, tf.tf,
      |          ((st.n_docs + 1) * 1048576) // (dfx.df + 1) AS ratio
      |        FROM tf JOIN dfx USING (term), st)),
      |rk AS (
      |  SELECT doc_id, term, score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
      |  FROM sc)
      |SELECT doc_id, term, score, CAST(rn AS INTEGER) AS rank
      |FROM rk WHERE rn <= 5 ORDER BY doc_id, rank""".stripMargin

  // ---- q130: per-class centroid outlier pruning ------------------------

  def centroidOutliers(s: SparkSession, dir: String): DataFrame =
    graft.operators.Outliers.centroidOutliers(
        emb(s, dir), col("vec_id"), col("label"), col("embedding"), m = 10)
      .orderBy(col("label"), col("rank"))

  private val q130Oracle: String =
    """WITH q AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings),
      |e AS (
      |  SELECT vec_id, label, unnest(range(1, len(qv) + 1)) AS pos, unnest(qv) AS qx
      |  FROM q),
      |cent AS (
      |  SELECT label, pos,
      |    (s - ((s % n) + n) % n) // n AS c
      |  FROM (SELECT label, pos, CAST(SUM(qx) AS BIGINT) AS s,
      |          CAST(COUNT(*) AS BIGINT) AS n
      |        FROM e GROUP BY 1, 2)),
      |d AS (
      |  SELECT e.label, e.vec_id,
      |    CAST(SUM((e.qx - cent.c) * (e.qx - cent.c)) AS BIGINT) AS dist2
      |  FROM e JOIN cent ON e.label = cent.label AND e.pos = cent.pos
      |  GROUP BY 1, 2),
      |rk AS (
      |  SELECT label, vec_id, dist2,
      |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY dist2 DESC, vec_id) AS rn
      |  FROM d)
      |SELECT label, vec_id, dist2, CAST(rn AS INTEGER) AS rank
      |FROM rk WHERE rn <= 10 ORDER BY label, rank""".stripMargin

  // ---- q136: per-source unigram KL drift -------------------------------

  def sourceDrift(s: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.unigramKl(docs(s, dir), col("source"), col("text"))
      .select(col("grp").as("source"), col("n_tokens"), col("kl_fp"))
      .orderBy(col("source"))

  /** DuckDB rendition of the 10-bit-mantissa fixed-point log2 (the
    * q115/q129 idiom) over a positive integer SQL expression. */
  private def lfpSql(x: String): String =
    s"((length(format('{:b}', $x)) - 1) * 1024" +
      s" + ($x * 1024) // (CAST(1 AS BIGINT) << (length(format('{:b}', $x)) - 1)) - 1024)"

  private val q136Oracle: String =
    s"""WITH gt AS (
       |  SELECT source AS grp, unnest(string_split(text, ' ')) AS term FROM documents),
       |c AS (SELECT grp, term, CAST(COUNT(*) AS BIGINT) AS cgt FROM gt GROUP BY 1, 2),
       |ct AS (SELECT term, CAST(SUM(cgt) AS BIGINT) AS ct FROM c GROUP BY 1),
       |ng AS (SELECT grp, CAST(SUM(cgt) AS BIGINT) AS ng FROM c GROUP BY 1),
       |nn AS (SELECT CAST(SUM(ct) AS BIGINT) AS n FROM ct),
       |t AS (
       |  SELECT c.grp, ng.ng,
       |    c.cgt * (${lfpSql("c.cgt")} + ${lfpSql("nn.n")}
       |      - ${lfpSql("ng.ng")} - ${lfpSql("ct.ct")}) AS term_fp
       |  FROM c JOIN ct USING (term) JOIN ng USING (grp), nn),
       |sm AS (
       |  SELECT grp, MAX(ng) AS n_tokens, CAST(SUM(term_fp) AS BIGINT) AS sum_fp
       |  FROM t GROUP BY 1)
       |SELECT grp AS source, n_tokens,
       |  (sum_fp - ((sum_fp % n_tokens) + n_tokens) % n_tokens) // n_tokens AS kl_fp
       |FROM sm ORDER BY source""".stripMargin

  // ---- q145: schema-evolution read (mergeSchema) -----------------------

  /** The lakehouse schema-on-read contract: generation-1 files carry
    * (doc_id, lang), generation-2 files add `n_chars`; a `mergeSchema`
    * read unions the schemas and fills the missing column with nulls
    * for old files. Pins that evolution is handled at READ time — no
    * rewrite of the old generation — with the null accounting exact.
    */
  def schemaMerge(s: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_work",
      s"evo_${java.util.UUID.randomUUID().toString.replace("-", "")}").toString
    val d = docs(s, dir)
    d.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(scratch)
    d.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("append").parquet(scratch)
    // materialize off the scratch files, then reclaim them — repeated
    // verify/bench runs must not accumulate per-run tmp generations
    val res = s.read.option("mergeSchema", "true").parquet(scratch)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        count(col("n_chars")).as("n_v2"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
      .localCheckpoint(true)
    graft.Staging.deleteRecursively(java.nio.file.Paths.get(scratch))
    res
  }

  private val q145Oracle: String =
    """SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_v2,
      |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q146: deletion propagation (GDPR purge + audit) -----------------

  /** Tombstones = `doc_id % 13 == 0`; artifacts = the documents table,
    * its distinct-token postings index, and the embeddings table (same
    * id space) — the audit proves zero tombstoned rows survive in any
    * of them. */
  def deletionAudit(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val tombs = d.filter(col("doc_id") % 13 === 0).select(col("doc_id"))
    val postings = d.select(col("doc_id").as("p_doc"),
      explode(array_distinct(TextFns.tokens(col("text")))).as("term"))
    graft.operators.Deletion.propagateAudit(
        Seq(
          ("documents", d, col("doc_id")),
          ("postings", postings, col("p_doc")),
          ("embeddings", emb(s, dir), col("vec_id"))),
        tombs, col("doc_id"))
      .orderBy(col("artifact"))
  }

  private val q146Oracle: String =
    """WITH tomb AS (SELECT doc_id FROM documents WHERE doc_id % 13 = 0),
      |p AS (
      |  SELECT doc_id, CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS np
      |  FROM documents)
      |SELECT 'documents' AS artifact,
      |  (SELECT COUNT(*) FROM documents) AS n_before,
      |  (SELECT COUNT(*) FROM tomb) AS n_purged,
      |  (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM tomb) AS n_after,
      |  CAST(0 AS BIGINT) AS survivors
      |UNION ALL
      |SELECT 'embeddings',
      |  (SELECT COUNT(*) FROM embeddings),
      |  (SELECT COUNT(*) FROM embeddings e JOIN tomb t ON e.vec_id = t.doc_id),
      |  (SELECT COUNT(*) FROM embeddings)
      |    - (SELECT COUNT(*) FROM embeddings e JOIN tomb t ON e.vec_id = t.doc_id),
      |  CAST(0 AS BIGINT)
      |UNION ALL
      |SELECT 'postings',
      |  CAST((SELECT SUM(np) FROM p) AS BIGINT),
      |  CAST((SELECT SUM(np) FROM p JOIN tomb USING (doc_id)) AS BIGINT),
      |  CAST((SELECT SUM(np) FROM p) AS BIGINT)
      |    - CAST((SELECT SUM(np) FROM p JOIN tomb USING (doc_id)) AS BIGINT),
      |  CAST(0 AS BIGINT)
      |ORDER BY artifact""".stripMargin

  /** q185: URL parsing + per-domain cap — the crawl-curation gate that
    * keeps one domain from dominating a training mix (C4/RefinedWeb
    * both cap per-domain contributions). Deterministic URLs are derived
    * from document metadata (source → host label, lang → ccTLD), then
    * the HOST / QUERY components come from Spark's `parse_url` (a real
    * URL parser, not string slicing), the registrable domain from a
    * label-suffix rule, and the cap keeps the first 5 docs per site by
    * doc_id — a bounded per-group window, never a global sort. The
    * oracle replays the construction arithmetically, which is exactly
    * the point: parse_url's HOST/QUERY must agree with the ground-truth
    * components the URLs were built from.
    */
  def domainCap(s: SparkSession, dir: String): DataFrame = {
    val tld = when(col("lang") === "en", "com").when(col("lang") === "de", "de")
      .when(col("lang") === "fr", "fr").when(col("lang") === "es", "es")
      .otherwise("cn")
    val url = concat(lit("https://www."), col("source"), lit("."), tld,
      lit("/"), col("lang"), lit("/doc-"), col("doc_id"), lit("?s="), col("n_chars"))
    val parsed = docs(s, dir)
      .withColumn("url", url)
      .select(col("doc_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("QUERY"), lit("s")).cast("long").as("qs"))
      .withColumn("site", substring_index(col("host"), ".", -2))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("site")).orderBy(col("doc_id"))
    parsed
      .withColumn("rn", row_number().over(w))
      .groupBy(col("site"))
      .agg(substring_index(first(col("site")), ".", -1).as("tld"),
        count(lit(1)).as("n_docs"),
        sum(when(col("rn") <= 5, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") <= 5, col("qs"))).as("sum_qs_kept"))
      .orderBy(col("site"))
  }

  // The cap window partitions by SITE on both sides: two langs that map
  // to the same ccTLD ('cn' branch) share one site and one cap, exactly
  // as a per-registrable-domain crawl cap behaves.
  private val q185Oracle: String =
    """WITH u0 AS (
      |  SELECT doc_id, n_chars AS qs,
      |    source || '.' || CASE lang WHEN 'en' THEN 'com' WHEN 'de' THEN 'de'
      |      WHEN 'fr' THEN 'fr' WHEN 'es' THEN 'es' ELSE 'cn' END AS site
      |  FROM documents),
      |u AS (
      |  SELECT doc_id, qs, site,
      |    row_number() OVER (PARTITION BY site ORDER BY doc_id) AS rn
      |  FROM u0)
      |SELECT site, string_split(site, '.')[-1] AS tld,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN rn <= 5 THEN qs END) AS BIGINT) AS sum_qs_kept
      |FROM u GROUP BY site ORDER BY site""".stripMargin

  /** q186: n-gram train/test decontamination — the GPT-3-style overlap
    * audit at N-GRAM granularity (q63 is document-level): a train
    * document is contaminated when it shares any 8-token shingle with
    * the held-out slice (doc_id % 10 = 0). Shape at 100 TB: distinct
    * 8-grams per side, equi-join on the gram key, per-doc count — the
    * join moves shingles, not documents, and in production the gram key
    * is `xxhash64(gram)` (8 bytes instead of ~50); the string key here
    * keeps the oracle replayable, the PLAN is identical. Test-side
    * grams are the small side (held-out sets are, by construction) →
    * AQE broadcasts them.
    */
  def ngramDecontam(s: SparkSession, dir: String): DataFrame = {
    val grams = docs(s, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, size(t) - 7), i -> concat_ws(' ', slice(t, i, 8))))"))
        .as("g"))
    val test = grams.filter(col("doc_id") % 10 === 0).select(col("g")).distinct()
    val train = grams.filter(col("doc_id") % 10 =!= 0)
    val perDoc = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    train.join(test, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(perDoc, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        call_function("div", col("n_shared") * 1000, col("n_grams")).as("ratio_pm"))
      .orderBy(col("doc_id"))
  }

  private val q186Oracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)])) AS g
      |  FROM toks WHERE len(t) >= 8),
      |test AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 = 0),
      |tr AS (SELECT doc_id, COUNT(*) AS n_grams FROM g WHERE doc_id % 10 <> 0 GROUP BY 1),
      |sh AS (SELECT g.doc_id, COUNT(*) AS n_shared
      |       FROM g JOIN test USING (g) WHERE doc_id % 10 <> 0 GROUP BY 1)
      |SELECT doc_id, n_grams, n_shared,
      |  n_shared * 1000 // n_grams AS ratio_pm
      |FROM sh JOIN tr USING (doc_id) ORDER BY doc_id""".stripMargin

  /** q187: inverted-index build — term → (document frequency, total
    * term frequency, head of the sorted posting list), the retrieval
    * artifact BM25 (q115) scores against, materialized as a table. One
    * explode + one two-level aggregate; the emitted posting HEAD is
    * slice-bounded (8 ids) so the row stays small no matter the df —
    * full postings at 100 TB live as (term, doc_id) rows, which is what
    * the first aggregate already produces.
    */
  def invertedIndex(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val postings = docs(s, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(false) // feeds stats AND the head selection
    val stats = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
      .filter(col("df") >= 10)
    // head-of-posting-list via salted two-level selection (the q184
    // discipline): a frequent term's full posting list never passes
    // through one window task or one aggregation buffer
    val w1 = w.partitionBy(col("term"), col("salt")).orderBy(col("doc_id"))
    val w2 = w.partitionBy(col("term")).orderBy(col("doc_id"))
    val head = postings.withColumn("salt", pmod(col("doc_id"), lit(64L)))
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= 8)
      .withColumn("r2", row_number().over(w2)).filter(col("r2") <= 8)
      .groupBy(col("term"))
      .agg(expr("concat_ws(',', transform(array_sort(collect_list(struct(r2, doc_id))), x -> cast(x.doc_id as string)))")
        .as("head_postings"))
    stats.join(head, "term")
      .select(col("term"), col("df"), col("tf_total"), col("head_postings"))
      .orderBy(col("term"))
  }

  private val q187Oracle: String =
    """WITH p AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |d AS (SELECT term, doc_id, COUNT(*) AS tf FROM p GROUP BY 1, 2),
      |d2 AS (SELECT term, doc_id, tf,
      |  row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM d)
      |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS tf_total,
      |  string_agg(CASE WHEN rn <= 8 THEN CAST(doc_id AS VARCHAR) END, ','
      |    ORDER BY doc_id) AS head_postings
      |FROM d2 GROUP BY term HAVING COUNT(*) >= 10 ORDER BY term""".stripMargin

  /** q188: character-entropy quality gate — the compression-style junk
    * detector (low char entropy ⇒ repetitive/templated text, high ⇒
    * random noise; natural language sits ~4 bits/char): Shannon entropy
    * of each document's character distribution in the integer
    * fixed-point log2 idiom (10-bit mantissa, the q136 discipline), so
    * the score is bit-identical across engines and partitionings.
    * H_fp = (Σ_ch c·(L(n) − L(c))) div n ≈ 1024·H. Explode to
    * (doc, char) counts, a per-doc window total, one aggregate —
    * linear, and the distinct-char state per doc is alphabet-bounded.
    */
  def charEntropy(s: SparkSession, dir: String): DataFrame = {
    def lfp(x: Column): Column = {
      val e = (length(bin(x)) - 1).cast("int")
      e.cast("long") * 1024 + call_function("shiftright", x * 1024, e) - 1024
    }
    val cc = docs(s, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    cc.withColumn("n", sum(col("c")).over(w))
      .withColumn("term_fp", col("c") * (lfp(col("n")) - lfp(col("c"))))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_chars_total"),
        count(lit(1)).as("n_distinct_chars"),
        call_function("div", sum(col("term_fp")), max(col("n"))).as("entropy_fp"))
      .withColumn("is_low_entropy", col("entropy_fp") < 3584)
      .orderBy(col("doc_id"))
  }

  private val q188Oracle: String =
    """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
      |            FROM documents WHERE length(text) > 0),
      |cc AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
      |t AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cc GROUP BY 1),
      |e AS (SELECT cc.doc_id,
      |  CAST(SUM(c * (
      |    ((length(bin(n)) - 1) * 1024 + (n * 1024 >> (length(bin(n)) - 1)) - 1024)
      |    - ((length(bin(c)) - 1) * 1024 + (c * 1024 >> (length(bin(c)) - 1)) - 1024)
      |  )) AS BIGINT) AS s
      |  FROM cc JOIN t USING (doc_id) GROUP BY 1)
      |SELECT e.doc_id, t.n AS n_chars_total,
      |  (SELECT COUNT(*) FROM cc WHERE cc.doc_id = e.doc_id) AS n_distinct_chars,
      |  s // n AS entropy_fp,
      |  s // n < 3584 AS is_low_entropy
      |FROM e JOIN t ON e.doc_id = t.doc_id ORDER BY e.doc_id""".stripMargin

  /** q192: edit-distance vocabulary linkage — near-spelling pairs
    * between two language slices' vocabularies (the record-linkage /
    * cognate-mining shape), with LENGTH-BAND BLOCKING so the candidate
    * set is never all-pairs: levenshtein(a, b) ≤ 2 requires
    * |len(a) − len(b)| ≤ 2, so each word joins only its ±2 length
    * bands — at a 10M-type vocabulary that's the difference between
    * 10^14 pairs and a banded join whose candidate count tracks the
    * band occupancy (SymSpell, q98, is the even-tighter deletion-
    * neighborhood variant; this is the exact-distance baseline over
    * it). The verify step computes true levenshtein only on banded
    * candidates.
    */
  def levenshteinPairs(s: SparkSession, dir: String): DataFrame = {
    def vocab(l: String) = docs(s, dir).filter(col("lang") === l)
      .select(explode(TextFns.tokens(col("text"))).as("w")).distinct()
      .filter(length(col("w")) >= 3)
    val a = vocab("en").select(col("w").as("wa"), length(col("w")).as("la"))
    val b = vocab("de").select(col("w").as("wb"), length(col("w")).as("lb"))
    // length-band equi-join: explode each left word to its 5 candidate
    // bands so the join is a plain equi-join on the band key (shuffle-
    // partitionable), not a |la-lb|<=2 theta-join
    val banded = a.select(col("wa"), col("la"),
      explode(expr("sequence(la - 2, la + 2)")).as("lb"))
    banded.join(b, "lb")
      .filter(col("wa") < col("wb"))
      .withColumn("dist", levenshtein(col("wa"), col("wb")))
      .filter(col("dist") <= 2 && col("dist") > 0)
      .select(col("wa"), col("wb"), col("dist").cast("long").as("dist"))
      .orderBy(col("wa"), col("wb"))
  }

  private val q192Oracle: String =
    """WITH va AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
      |            FROM documents WHERE lang = 'en'),
      |vb AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
      |       FROM documents WHERE lang = 'de'),
      |a AS (SELECT w FROM va WHERE length(w) >= 3),
      |b AS (SELECT w FROM vb WHERE length(w) >= 3)
      |SELECT a.w AS wa, b.w AS wb, CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
      |FROM a JOIN b ON abs(length(a.w) - length(b.w)) <= 2 AND a.w < b.w
      |WHERE levenshtein(a.w, b.w) BETWEEN 1 AND 2
      |ORDER BY wa, wb""".stripMargin

  /** q210: MMR diversified top-k — the retrieval step between "nearest"
    * and "useful": after ANN narrows each query to a candidate list,
    * greedy Maximal Marginal Relevance re-picks k of them trading
    * query-similarity against redundancy with what's already picked
    * (λ=0.7). The DISTRIBUTED work is all in-plan — candidate top-C per
    * query (q24's broadcast shape) and the C² pairwise similarity table
    * — and the k-step greedy tail runs on the collected C-bounded set
    * (3 queries × 12 candidates here; the production bound is the ANN
    * list, by construction small — same justification as the
    * vocab-capped BPE collect). All scores are ×10⁶ integer fixed point
    * from the round-6 cosine both engines already agree on (q24), so
    * the greedy argmax never compares raw floats; the oracle replays
    * the selection as a recursive CTE carrying the picked set as a
    * list.
    */
  def mmrSelect(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cands = Similarity.bruteTopK(e, e.filter(col("vec_id") < 3), 12)
      .select(col("query_id"), col("neighbor_id"),
        round(round(col("sim"), 6) * 1000000).cast("long").as("simfp"))
      .localCheckpoint(false)
    val ea = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val eb = e.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val pairs = cands.select(col("query_id"), col("neighbor_id").as("a"))
      .join(cands.select(col("query_id").as("q2"), col("neighbor_id").as("b")),
        col("query_id") === col("q2") && col("a") =!= col("b"))
      .join(broadcast(ea), "a").join(broadcast(eb), "b")
      .select(col("query_id"), col("a"), col("b"),
        round(round(VectorFns.cosine(col("ea"), col("eb")), 6) * 1000000)
          .cast("long").as("psimfp"))
    // bounded collect: |queries|·C candidates + |queries|·C² pairs
    val candRows = cands.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)).toMap
    val pairRows = pairs.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => ((r.getLong(1), r.getLong(2)) -> r.getLong(3))).toMap).toMap
    import s.implicits._
    candRows.keys.toSeq.sorted.flatMap { q =>
      Similarity.mmrGreedy(candRows(q), pairRows.getOrElse(q, Map.empty), k = 4, lam10 = 7)
        .map { case (step, id, score) => (q, step, id, score) }
    }.toDF("query_id", "step", "picked_id", "score_fp")
      .orderBy(col("query_id"), col("step"))
  }

  private val q210Oracle: String = {
    val qcos = VectorFns.cosineSql("q.embedding", "c.embedding")
    val pcos = VectorFns.cosineSql("ea.embedding", "eb.embedding")
    s"""WITH RECURSIVE
       |cand0 AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, c.vec_id AS nid,
       |    CAST(round(round($qcos, 6) * 1000000, 0) AS BIGINT) AS simfp,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY $qcos DESC, c.vec_id) AS rnk
       |  FROM embeddings q, embeddings c
       |  WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id),
       |cc AS MATERIALIZED (SELECT query_id, nid, simfp FROM cand0 WHERE rnk <= 12),
       |pair AS MATERIALIZED (
       |  SELECT a.query_id, a.nid AS a, b.nid AS b,
       |    CAST(round(round($pcos, 6) * 1000000, 0) AS BIGINT) AS psimfp
       |  FROM cc a JOIN cc b ON a.query_id = b.query_id AND a.nid <> b.nid
       |  JOIN embeddings ea ON ea.vec_id = a.nid
       |  JOIN embeddings eb ON eb.vec_id = b.nid),
       |sel(step, query_id, picked, score_fp, picked_list) AS (
       |  SELECT 1, query_id, nid, 7 * simfp, [nid]
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY 7 * simfp DESC, nid) AS rr FROM cc)
       |  WHERE rr = 1
       |  -- the recursive member computes every remaining candidate's
       |  -- score (max-over-picked via a join against the carried
       |  -- picked_list) and keeps the per-query argmax with QUALIFY:
       |  -- DuckDB 1.0 silently evaluates a scalar subquery nested
       |  -- under LATERAL inside a recursive member to NULL, so the
       |  -- aggregation MUST be a plain join
       |  UNION ALL
       |  SELECT s.step + 1, c.query_id, c.nid,
       |    7 * c.simfp - 3 * MAX(p.psimfp) AS score_fp,
       |    list_append(s.picked_list, c.nid)
       |  FROM sel s
       |  JOIN cc c ON c.query_id = s.query_id
       |    AND NOT list_contains(s.picked_list, c.nid)
       |  JOIN pair p ON p.query_id = c.query_id AND p.a = c.nid
       |    AND list_contains(s.picked_list, p.b)
       |  WHERE s.step < 4
       |  GROUP BY s.step, c.query_id, c.nid, c.simfp, s.picked_list
       |  QUALIFY row_number() OVER (PARTITION BY c.query_id
       |    ORDER BY 7 * c.simfp - 3 * MAX(p.psimfp) DESC, c.nid) = 1)
       |SELECT query_id, step, picked AS picked_id, score_fp
       |FROM sel ORDER BY query_id, step""".stripMargin
  }

  // ---- q305–q307: RLHF preference-pair hygiene --------------------------

  /** Synthesized preference-pair table over the documents corpus —
    * deterministic and engine-replayable, so both Spark and the oracle
    * derive the IDENTICAL table from the shared parquet: pair
    * `(pair_id = even doc_id)` pairs the even document as the CHOSEN
    * response with its odd successor as the REJECTED one, carrying the
    * chosen doc's source and both exact lengths.
    */
  private def prefPairs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val c = d.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("pair_id"), col("source"),
        col("text").as("chosen_text"), col("n_chars").as("chosen_len"))
    val r = d.filter(col("doc_id") % 2 === 1)
      .select((col("doc_id") - 1).as("pair_id"),
        col("text").as("rejected_text"), col("n_chars").as("rejected_len"))
    c.join(r, "pair_id")
  }

  /** The pairs CTE shared by every preference oracle (one definition so
    * pair semantics can never fork between q305/q306/q307). */
  private val prefPairsCte: String =
    """pairs AS (
      |  SELECT c.doc_id AS pair_id, c.source, c.text AS chosen_text,
      |    r.text AS rejected_text, c.n_chars AS chosen_len,
      |    r.n_chars AS rejected_len
      |  FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1
      |  WHERE c.doc_id % 2 = 0)""".stripMargin

  /** q305: cross-role near-dup LEAKAGE over the preference table — a
    * rejected response near-identical to a chosen response of a
    * DIFFERENT pair (label conflict: the reward signal both prefers
    * and disprefers the same text). [[graft.operators.Preference
    * .crossRoleLeakage]] = the q63 bipartite inverted-index join with
    * chosen legs as train / rejected legs as test and the same-pair
    * diagonal excluded — never all-pairs. The chosen-side stop-shingle
    * cap (maxDf = 30, [[graft.operators.Preference.ScaleMaxDf]]) is
    * OPTED INTO EXPLICITLY here (the operator defaults to exact so an
    * audit never silently drops evidence) and mirrored in the oracle:
    * identification evidence lives in rare
    * shingles, and a shingle spanning >30 chosen responses is
    * template boilerplate whose join fan-out is quadratic in both
    * roles' table size while its mass-duplication story belongs to
    * exact-dup clustering (q21/q53) — the r8 #7 candidate-volume
    * discipline. No-op at sf0.01/sf0.1 (max chosen df there is 5/17);
    * at the sf1 replica corpus it bounds the posting-join volume
    * (measured: 43.6M -> 6.8M posting-join rows).
    */
  def prefCrossRoleLeakage(s: SparkSession, dir: String): DataFrame =
    graft.operators.Preference.crossRoleLeakage(prefPairs(s, dir),
        col("pair_id"), col("chosen_text"), col("rejected_text"),
        w = 3, minShared = 3, maxDf = graft.operators.Preference.ScaleMaxDf)
      .sortOnce(col("chosen_pair"), col("rejected_pair"))

  private val q305Oracle: String =
    s"""WITH $prefPairsCte,
       |ctoks AS (SELECT pair_id, string_split(chosen_text, ' ') AS t FROM pairs),
       |csh AS (SELECT pair_id,
       |          unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       |                                for i in range(1, len(t) - 1)])) AS shingle
       |        FROM ctoks WHERE len(t) >= 3),
       |cdf AS (SELECT shingle FROM csh GROUP BY shingle HAVING COUNT(*) <= 30),
       |cshk AS (SELECT csh.* FROM csh JOIN cdf USING (shingle)),
       |rtoks AS (SELECT pair_id, string_split(rejected_text, ' ') AS t FROM pairs),
       |rsh AS (SELECT pair_id,
       |          unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       |                                for i in range(1, len(t) - 1)])) AS shingle
       |        FROM rtoks WHERE len(t) >= 3)
       |SELECT c.pair_id AS chosen_pair, r.pair_id AS rejected_pair,
       |  COUNT(*) AS n_shared
       |FROM cshk c JOIN rsh r ON c.shingle = r.shingle AND c.pair_id <> r.pair_id
       |GROUP BY 1, 2 HAVING COUNT(*) >= 3
       |ORDER BY chosen_pair, rejected_pair""".stripMargin

  /** q306: PAIR-level eval-set contamination — a preference pair is
    * poisoned when either leg overlaps the held-out eval slice
    * (doc_id ≡ 0 mod 17, the q63 eval set; pairs containing an eval
    * doc themselves are excluded as in any honest split). Both legs
    * probe the eval postings in ONE [[graft.operators.Preference
    * .pairContamination]] inverted-index join, then roll up to the
    * pair frame. The leg-side stop-shingle cap (maxDf = 30) is opted
    * into explicitly (the operator defaults to exact) and mirrored in
    * the oracle (no-op below sf1 — see q305).
    */
  def prefPairContamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.operators.Preference.pairContamination(
        prefPairs(s, dir)
          .filter(col("pair_id") % 17 =!= 0 && (col("pair_id") + 1) % 17 =!= 0),
        col("pair_id"), col("chosen_text"), col("rejected_text"),
        d.filter(col("doc_id") % 17 === 0), col("doc_id"), col("text"),
        w = 3, minShared = 3, maxDf = graft.operators.Preference.ScaleMaxDf)
      .sortOnce(col("pair_id"))
  }

  private val q306Oracle: String =
    s"""WITH $prefPairsCte,
       |kept AS (SELECT * FROM pairs
       |         WHERE pair_id % 17 <> 0 AND (pair_id + 1) % 17 <> 0),
       |legs AS (SELECT pair_id * 2 AS leg_id, chosen_text AS text FROM kept
       |         UNION ALL
       |         SELECT pair_id * 2 + 1, rejected_text FROM kept),
       |ltoks AS (SELECT leg_id, string_split(text, ' ') AS t FROM legs),
       |lsh0 AS (SELECT leg_id,
       |          unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       |                                for i in range(1, len(t) - 1)])) AS shingle
       |        FROM ltoks WHERE len(t) >= 3),
       |ldf AS (SELECT shingle FROM lsh0 GROUP BY shingle HAVING COUNT(*) <= 30),
       |lsh AS (SELECT lsh0.* FROM lsh0 JOIN ldf USING (shingle)),
       |etoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |          WHERE doc_id % 17 = 0),
       |esh AS (SELECT doc_id AS test_id,
       |          unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       |                                for i in range(1, len(t) - 1)])) AS shingle
       |        FROM etoks WHERE len(t) >= 3),
       |hits AS (SELECT leg_id, test_id, COUNT(*) AS n_shared
       |         FROM lsh JOIN esh USING (shingle)
       |         GROUP BY 1, 2 HAVING COUNT(*) >= 3)
       |SELECT leg_id // 2 AS pair_id,
       |  CAST(COUNT(DISTINCT test_id) AS BIGINT) AS n_eval_docs,
       |  CAST(COUNT(DISTINCT leg_id % 2) AS BIGINT) AS n_legs_hit,
       |  MAX(n_shared) AS max_shared
       |FROM hits GROUP BY 1 ORDER BY pair_id""".stripMargin

  /** q307: per-source VERBOSITY-BIAS audit — the fraction of pairs
    * where the preferred response is strictly longer, exact ppm
    * (truncating integer division, no float on the release path),
    * against the global rate; skew_ppm is the signed deviation. The
    * classic reward-model poisoning check, one hash aggregate + a
    * broadcast 1-row global at any scale.
    */
  def prefLengthSkew(s: SparkSession, dir: String): DataFrame =
    graft.operators.Preference.lengthSkewAudit(prefPairs(s, dir),
        col("source"), col("chosen_len"), col("rejected_len"))
      .orderBy(col("source"))

  private val q307Oracle: String =
    s"""WITH $prefPairsCte,
       |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |          CAST(SUM(CASE WHEN chosen_len > rejected_len
       |                        THEN 1 ELSE 0 END) AS BIGINT) AS n_longer
       |        FROM pairs
       |        WHERE chosen_len IS NOT NULL AND rejected_len IS NOT NULL
       |        GROUP BY source),
       |g AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS g_n,
       |        CAST(SUM(n_longer) AS BIGINT) AS g_longer FROM per)
       |SELECT source, n_pairs,
       |  CAST((1000000 * n_longer) // n_pairs AS BIGINT) AS longer_ppm,
       |  CAST((1000000 * g_longer) // g_n AS BIGINT) AS global_ppm,
       |  CAST((1000000 * n_longer) // n_pairs
       |    - (1000000 * g_longer) // g_n AS BIGINT) AS skew_ppm
       |FROM per CROSS JOIN g ORDER BY source""".stripMargin

  /** q310: inter-annotator agreement — exact-rational Cohen's κ per
    * source ([[graft.operators.Preference.annotatorAgreement]]), the
    * fourth preference-hygiene leg: two deterministic annotators are
    * synthesized over the shared pairs frame (rater 1 prefers the
    * longer response — the verbosity rater q307 audits; rater 2 agrees
    * except on every pair_id ≡ 0 mod 3, a fixed disagreement rate), so
    * both engines derive identical label tables and the κ accounting
    * (n·a − Σ m1ₖm2ₖ over n² − Σ m1ₖm2ₖ, integer cross-multiplies
    * only, num/den released undivided) replays bit-for-bit.
    */
  def prefAnnotatorAgreement(s: SparkSession, dir: String): DataFrame = {
    val r1 = (col("chosen_len") > col("rejected_len")).cast("long")
    val r2 = when(col("pair_id") % 3 === 0, lit(1L) - r1).otherwise(r1)
    graft.operators.Preference.annotatorAgreement(
        prefPairs(s, dir), col("source"), r1, r2)
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))
  }

  private val q310Oracle: String =
    s"""WITH $prefPairsCte,
       |lbl AS (
       |  SELECT source,
       |    CAST(CASE WHEN chosen_len > rejected_len THEN 1 ELSE 0 END AS VARCHAR) AS r1,
       |    CAST(CASE WHEN pair_id % 3 = 0
       |              THEN 1 - (CASE WHEN chosen_len > rejected_len THEN 1 ELSE 0 END)
       |              ELSE (CASE WHEN chosen_len > rejected_len THEN 1 ELSE 0 END)
       |         END AS VARCHAR) AS r2
       |  FROM pairs
       |  WHERE chosen_len IS NOT NULL AND rejected_len IS NOT NULL),
       |agree AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    CAST(SUM(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
       |  FROM lbl GROUP BY source),
       |m1 AS (SELECT source, r1 AS l, CAST(COUNT(*) AS BIGINT) AS m1 FROM lbl GROUP BY 1, 2),
       |m2 AS (SELECT source, r2 AS l, CAST(COUNT(*) AS BIGINT) AS m2 FROM lbl GROUP BY 1, 2),
       |pe AS (
       |  SELECT source, CAST(SUM(m1 * m2) AS BIGINT) AS pe_cross
       |  FROM m1 JOIN m2 USING (source, l) GROUP BY source)
       |SELECT a.source, n_pairs, n_agree, COALESCE(pe_cross, 0) AS pe_cross,
       |  n_pairs * n_agree - COALESCE(pe_cross, 0) AS kappa_num,
       |  n_pairs * n_pairs - COALESCE(pe_cross, 0) AS kappa_den
       |FROM agree a LEFT JOIN pe USING (source)
       |ORDER BY source""".stripMargin

  /** q313: MULTI-RATER agreement — exact-rational Fleiss' κ per group
    * ([[graft.operators.Preference.fleissKappa]]), the r ≥ 3
    * generalization q310's pairwise Cohen's κ cannot see. THREE
    * deterministic raters are synthesized over the documents table
    * (rater j labels doc d with (d·(2j+1)+j) mod 4 — pure integer
    * arithmetic both engines replay bit-identically), grouped into 5
    * pools; the oracle recomputes the full accounting (per-item
    * n_ik² sums, pooled label marginals, the
    * [(S−T)·T − (r−1)Σm²] / [(r−1)(T²−Σm²)] rational) from scratch in
    * DuckDB — a green row pins every count, both folds, and the
    * num/den release.
    */
  def prefFleissKappa(s: SparkSession, dir: String): DataFrame = {
    val raters = (1 to 3).map { j =>
      struct(lit(j.toLong).as("rater"),
        ((col("doc_id") * (2 * j + 1) + j) % 4).as("lbl"))
    }
    val ratings = docs(s, dir)
      .select(col("doc_id"), explode(array(raters: _*)).as("x"))
      .select(col("doc_id"), col("x.rater").as("rater"), col("x.lbl").as("lbl"))
    graft.operators.Preference.fleissKappa(ratings,
        pmod(col("doc_id"), lit(5L)), col("doc_id"), col("lbl"))
      .orderBy(col("grp"))
  }

  private val q313Oracle: String =
    """WITH r AS (
      |  SELECT doc_id % 5 AS grp, doc_id AS itm,
      |         (doc_id * (2*j + 1) + j) % 4 AS lbl
      |  FROM documents, (VALUES (1), (2), (3)) t(j)),
      |nik AS (SELECT grp, itm, lbl, CAST(COUNT(*) AS BIGINT) AS n
      |        FROM r GROUP BY 1, 2, 3),
      |it AS (SELECT grp, itm, SUM(n) AS ri, SUM(n * n) AS si
      |       FROM nik GROUP BY 1, 2),
      |gi AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_items,
      |         CAST(SUM(si) AS BIGINT) AS s_sq,
      |         CAST(MIN(ri) AS BIGINT) AS n_raters,
      |         CAST(SUM(ri) AS BIGINT) AS n_ratings
      |       FROM it GROUP BY 1),
      |gl AS (SELECT grp, CAST(SUM(m * m) AS BIGINT) AS sum_m_sq
      |       FROM (SELECT grp, lbl, SUM(n) AS m FROM nik GROUP BY 1, 2)
      |       GROUP BY 1)
      |SELECT grp, n_items, n_raters, n_ratings, s_sq, sum_m_sq,
      |  (s_sq - n_ratings) * n_ratings - (n_raters - 1) * sum_m_sq AS kappa_num,
      |  (n_raters - 1) * (n_ratings * n_ratings - sum_m_sq) AS kappa_den
      |FROM gi JOIN gl USING (grp) ORDER BY grp""".stripMargin

  /** q316: RAGGED-pool agreement — exact-rational Krippendorff's α per
    * group ([[graft.operators.Preference.krippendorffAlpha]]), the
    * missing-tolerant coefficient q313's Fleiss κ refuses ragged input
    * for. FOUR deterministic raters are synthesized over documents,
    * each SKIPPING a deterministic stripe (rater j rates doc d only
    * when (d+j) mod (j+1) ≠ 0 — so units carry 1..4 ratings, some
    * unpairable), labels (d·(2j+1)+j) mod 3, pools d mod 4. The oracle
    * recomputes the full accounting from scratch in DuckDB — per-unit
    * (m²−Σn²)/(m−1) fractions, the distinct-denominator product fold
    * (a RECURSIVE CTE replaying P = Πd exactly; N then falls out as
    * Σ S_d·(P div d) since d | P), pairable marginals, and the final
    * [P·(n²−Σn_c²) − (n−1)·N] / [P·(n²−Σn_c²)] rational — a green row
    * pins every count, both folds, the drop-unpairable convention, and
    * the num/den release.
    */
  def krippAlpha(s: SparkSession, dir: String): DataFrame = {
    val raters = (1 to 4).map { j =>
      struct(lit(j.toLong).as("rater"),
        ((col("doc_id") * (2 * j + 1) + j) % 3).as("lbl"),
        (((col("doc_id") + j) % (j + 1)) =!= 0).as("present"))
    }
    val ratings = docs(s, dir)
      .select(col("doc_id"), explode(array(raters: _*)).as("x"))
      .filter(col("x.present"))
      .select(col("doc_id"), col("x.rater").as("rater"), col("x.lbl").as("lbl"))
    graft.operators.Preference.krippendorffAlpha(ratings,
        pmod(col("doc_id"), lit(4L)), col("doc_id"), col("lbl"))
      .orderBy(col("grp"))
  }

  private val q316Oracle: String =
    """WITH RECURSIVE r AS (
      |  SELECT doc_id % 4 AS grp, doc_id AS itm,
      |         (doc_id * (2*j + 1) + j) % 3 AS lbl
      |  FROM documents, (VALUES (1), (2), (3), (4)) t(j)
      |  WHERE (doc_id + j) % (j + 1) <> 0),
      |nik AS (SELECT grp, itm, lbl, CAST(COUNT(*) AS BIGINT) AS n
      |        FROM r GROUP BY 1, 2, 3),
      |it AS (SELECT grp, itm, SUM(n) AS m, SUM(n * n) AS s
      |       FROM nik GROUP BY 1, 2 HAVING SUM(n) >= 2),
      |pu AS (SELECT grp, itm, m * m - s AS num, m - 1 AS den FROM it),
      |dd AS (SELECT grp, den, CAST(SUM(num) AS BIGINT) AS snum,
      |         CAST(COUNT(*) AS BIGINT) AS n_units,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY den)
      |              AS BIGINT) AS rn
      |       FROM pu GROUP BY 1, 2),
      |pf(grp, rn, p) AS (
      |  SELECT grp, rn, CAST(den AS BIGINT) FROM dd WHERE rn = 1
      |  UNION ALL
      |  SELECT d.grp, d.rn, f.p * d.den
      |  FROM pf f JOIN dd d ON d.grp = f.grp AND d.rn = f.rn + 1),
      |pp AS (SELECT grp, CAST(arg_max(p, rn) AS BIGINT) AS p
      |       FROM pf GROUP BY 1),
      |fold AS (SELECT d.grp, ANY_VALUE(pp.p) AS p,
      |           CAST(SUM(d.snum * (pp.p // d.den)) AS BIGINT) AS nn,
      |           CAST(SUM(d.n_units) AS BIGINT) AS n_items
      |         FROM dd d JOIN pp USING (grp) GROUP BY d.grp),
      |mg AS (SELECT n.grp, CAST(COUNT(*) AS BIGINT) AS n_labels,
      |         CAST(SUM(m) AS BIGINT) AS n_ratings,
      |         CAST(SUM(m * m) AS BIGINT) AS sum_nc_sq
      |       FROM (SELECT n.grp, n.lbl, SUM(n.n) AS m
      |             FROM nik n JOIN it USING (grp, itm) GROUP BY 1, 2) n
      |       GROUP BY 1)
      |SELECT grp, n_items, n_ratings, n_labels, nn AS do_num, p AS do_den,
      |  p * (n_ratings * n_ratings - sum_nc_sq) - (n_ratings - 1) * nn
      |    AS alpha_num,
      |  p * (n_ratings * n_ratings - sum_nc_sq) AS alpha_den
      |FROM fold JOIN mg USING (grp) ORDER BY grp""".stripMargin

  // ---- registry --------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_dedup_exact" -> (dedupExact _),
    "q22_neardup" -> (nearDup _),
    "q23_minhash_lsh" -> (minhashLsh _),
    "q24_ann_brute" -> (annBrute _),
    "q25_ann_ivf" -> (annIvf _),
    "q26_text_quality" -> (textQuality _),
    "q27_langid" -> (langId _),
    "q28_simhash" -> (simhashFp _),
    "q29_multimodal" -> (multimodal _),
    "q37_embed_neardup" -> (embedNearDup _),
    "q38_rolling_hash" -> (rollingHash _),
    "q39_range_join" -> (rangeJoinCounts _),
    "q40_asof_join" -> (asofClicks _),
    "q44_lsh_neardup" -> (lshNearDup _),
    "q45_image_decode" -> (imageDecode _),
    "q46_simhash_neardup" -> (simhashNearDup _),
    "q49_salted_join" -> (saltedUserJoin _),
    "q53_dedup_clusters" -> (dedupClusters _),
    "q86_deep_clusters" -> (dedupClustersDeep _),
    "q54_audio_decode" -> (audioDecode _),
    "q55_video_frames" -> (videoFrames _),
    "q60_pq_ann" -> (pqAnn _),
    "q80_ivfpq_ann" -> (ivfPqAnn _),
    "q63_contamination" -> (contamination _),
    "q305_pref_leakage" -> (prefCrossRoleLeakage _),
    "q306_pref_contamination" -> (prefPairContamination _),
    "q307_pref_length_skew" -> (prefLengthSkew _),
    "q310_pref_annotator_kappa" -> (prefAnnotatorAgreement _),
    "q313_pref_fleiss_kappa" -> (prefFleissKappa _),
    "q316_kripp_alpha" -> (krippAlpha _),
    "q315_unigram_packing" -> (unigramPacking _),
    "q64_deterministic_sample" -> (deterministicSample _),
    "q65_stratified_sample" -> (stratifiedSample _),
    "q66_reservoir_sample" -> (reservoirSample _),
    "q67_training_pipeline" -> (trainingPipeline _),
    "q69_seq_packing" -> (seqPacking _),
    "q70_pack_manifest" -> (packManifest _),
    "q71_chunking" -> (chunking _),
    "q72_repetition" -> (repetition _),
    "q73_corpus_shuffle" -> (corpusShuffle _),
    "q74_pii_redaction" -> (piiRedaction _),
    "q76_vocab_oov" -> (vocabOov _),
    "q77_quality_purge" -> (qualityPurge _),
    "q78_shuffled_export" -> (shuffledExport _),
    "q79_normalize" -> (normalizeText _),
    "q91_bloom_increment" -> (bloomIncrement _),
    "q92_budget_select" -> (budgetSelect _),
    "q93_balanced_mix" -> (balancedMix _),
    "q94_boilerplate" -> (boilerplate _),
    "q97_curation_export" -> (curationExport _),
    "q98_fuzzy_vocab" -> (fuzzyVocab _),
    "q100_trie_tokenize" -> (trieTokens _),
    "q104_bpe_tokenize" -> (bpeTokens _),
    "q160_bpe_trainer" -> (bpeTrainer _),
    "q308_unigram_trainer" -> (unigramTrainer _),
    "q311_unigram_segment" -> (unigramSegment _),
    "q165_pagerank" -> (pagerank _),
    "q170_pmi_collocations" -> (pmiCollocations _),
    "q171_triangles" -> (triangleCounts _),
    "q222_bfs_distances" -> (bfsDistances _),
    "q230_weighted_paths" -> (weightedDistances _),
    "q253_critical_path" -> (criticalPath _),
    "q256_sparse_matmul" -> (sparseMatmul _),
    "q257_kmeans_train" -> (kmeansTrain _),
    "q258_incr_phash" -> (incrPhashMaintain _),
    "q259_incr_signatures" -> (incrSigMaintain _),
    "q260_grouped_split" -> (groupedSplitAudit _),
    "q261_epoch_capped_mix" -> (epochCappedMix _),
    "q262_incr_lsh_pairs" -> (incrLshMaintain _),
    "q263_component_split" -> (componentSplitAudit _),
    "q264_margin_mining" -> (marginMining _),
    "q265_incr_components" -> (incrComponents _),
    "q266_cooccurrence" -> (cooccurMatrix _),
    "q267_jl_recall" -> (jlRecall _),
    "q268_typed_topk" -> (typedTopK _),
    "q269_join_view_ivm" -> (joinViewMaintain _),
    "q270_temporal_reach" -> (temporalReach _),
    "q271_schema_drift" -> (schemaDriftAudit _),
    "q272_cuped_readout" -> (cupedReadout _),
    "q273_epoch_schedule" -> (epochSchedule _),
    "q274_bootstrap_ci" -> (bootstrapCi _),
    "q275_welch_t" -> (welchReadout _),
    "q276_mann_whitney" -> (mannWhitneyReadout _),
    "q277_decay_score" -> (decayScore _),
    "q278_label_conflicts" -> (labelConflictAudit _),
    "q279_rendezvous_shards" -> (rendezvousShards _),
    "q280_incr_assign" -> (incrAssignMaintain _),
    "q282_incr_postings" -> (incrPostingsMaintain _),
    "q283_stratified_kfold" -> (stratifiedFolds _),
    "q287_incr_verified_neardups" -> (incrVerifiedNearDups _),
    "q290_incr_containment" -> (incrContainmentMaintain _),
    "q291_drift_retrain" -> (driftRetrain _),
    "q293_bm25_maintained" -> (bm25FromMaintained _),
    "q295_ivf_maintained" -> (ivfFromMaintained _),
    "q296_incr_simhash" -> (incrSimhashMaintain _),
    "q297_hybrid_rrf" -> (hybridRrf _),
    "q299_sprt_srm" -> (sprtSrmMonitor _),
    "q301_nightly_maintenance" -> (nightlyMaintenance _),
    "q302_matryoshka_recall" -> (matryoshkaRecall _),
    "q303_rank_churn" -> (rankChurnAudit _),
    "q288_calibration" -> (calibrationAudit _),
    "q289_concentration" -> (concentrationAudit _),
    "q284_containment" -> (containmentClones _),
    "q285_ring_shards" -> (ringShards _),
    "q179_binary_source" -> (binarySource _),
    "q185_domain_cap" -> (domainCap _),
    "q186_ngram_decontam" -> (ngramDecontam _),
    "q187_inverted_index" -> (invertedIndex _),
    "q188_char_entropy" -> (charEntropy _),
    "q192_levenshtein_pairs" -> (levenshteinPairs _),
    "q210_mmr_select" -> (mmrSelect _),
    "q105_quality_classifier" -> (qualityClassify _),
    "q106_span_excision" -> (spanExcision _),
    "q101_mixture_recipe" -> (mixtureRecipe _),
    "q102_shared_spans" -> (sharedSpanDedup _),
    "q107_markup_strip" -> (markupStrip _),
    "q108_ngram_fluency" -> (ngramFluency _),
    "q109_semdedup" -> (semDedup _),
    "q110_hard_negatives" -> (hardNegMining _),
    "q111_corpus_upsert" -> (corpusUpsert _),
    "q112_cdc_chunks" -> (cdcChunks _),
    "q113_image_phash" -> (imagePhashDedup _),
    "q114_audio_phash" -> (audioPhashDedup _),
    "q115_bm25_search" -> (bm25Search _),
    "q319_retrieval_eval" -> (retrievalEval _),
    "q117_quality_rules" -> (qualityRules _),
    "q118_temperature_mix" -> (temperatureMix _),
    "q119_snapshot_diff" -> (snapshotDiff _),
    "q120_dsir_select" -> (dsirSelect _),
    "q121_sq8_ann" -> (sq8Ann _),
    "q122_shard_overlap" -> (shardOverlap _),
    "q123_token_fertility" -> (tokenFertility _),
    "q124_curriculum" -> (curriculumOrder _),
    "q126_c4_filters" -> (c4Filters _),
    "q127_para_dedup" -> (paragraphDedup _),
    "q129_tfidf_keywords" -> (tfidfKeywords _),
    "q130_centroid_outliers" -> (centroidOutliers _),
    "q136_source_drift" -> (sourceDrift _),
    "q139_two_stage_ann" -> (twoStageAnn _),
    "q145_schema_merge" -> (schemaMerge _),
    "q146_deletion_audit" -> (deletionAudit _))

  val family: String = "dataops"

  override val stagedOracles: Map[String, String] = Map(
    "q67_training_pipeline" -> q67StagedOracle,
    "q263_component_split" -> q263StagedOracle)

  val oracles: Map[String, String] = Map(
    "q21_dedup_exact" -> q21Oracle,
    "q22_neardup" -> q22Oracle,
    "q305_pref_leakage" -> q305Oracle,
    "q306_pref_contamination" -> q306Oracle,
    "q307_pref_length_skew" -> q307Oracle,
    "q310_pref_annotator_kappa" -> q310Oracle,
    "q313_pref_fleiss_kappa" -> q313Oracle,
    "q316_kripp_alpha" -> q316Oracle,
    "q315_unigram_packing" -> q315Oracle,
    "q23_minhash_lsh" -> q23Oracle,
    "q24_ann_brute" -> q24Oracle,
    "q25_ann_ivf" -> q25Oracle,
    "q26_text_quality" -> q26Oracle,
    "q27_langid" -> q27Oracle,
    "q28_simhash" -> q28Oracle,
    "q29_multimodal" -> q29Oracle,
    "q37_embed_neardup" -> q37Oracle,
    "q38_rolling_hash" -> q38Oracle,
    "q39_range_join" -> q39Oracle,
    "q40_asof_join" -> q40Oracle,
    "q44_lsh_neardup" -> q44Oracle,
    "q45_image_decode" -> q45Oracle,
    "q46_simhash_neardup" -> q46Oracle,
    "q49_salted_join" -> q49Oracle,
    "q53_dedup_clusters" -> q53Oracle,
    "q86_deep_clusters" -> q86Oracle,
    "q54_audio_decode" -> q54Oracle,
    "q55_video_frames" -> q55Oracle,
    "q60_pq_ann" -> q60Oracle,
    "q80_ivfpq_ann" -> q80Oracle,
    "q63_contamination" -> q63Oracle,
    "q64_deterministic_sample" -> q64Oracle,
    "q65_stratified_sample" -> q65Oracle,
    "q66_reservoir_sample" -> q66Oracle,
    "q67_training_pipeline" -> q67Oracle,
    "q69_seq_packing" -> q69Oracle,
    "q70_pack_manifest" -> q70Oracle,
    "q71_chunking" -> q71Oracle,
    "q72_repetition" -> q72Oracle,
    "q73_corpus_shuffle" -> q73Oracle,
    "q74_pii_redaction" -> q74Oracle,
    "q76_vocab_oov" -> q76Oracle,
    "q77_quality_purge" -> q77Oracle,
    "q78_shuffled_export" -> q73Oracle,
    "q79_normalize" -> q79Oracle,
    "q91_bloom_increment" -> q91Oracle,
    "q92_budget_select" -> q92Oracle,
    "q93_balanced_mix" -> q93Oracle,
    "q94_boilerplate" -> q94Oracle,
    "q97_curation_export" -> q97Oracle,
    "q98_fuzzy_vocab" -> q98Oracle,
    "q100_trie_tokenize" -> q100Oracle,
    "q104_bpe_tokenize" -> q104Oracle,
    "q160_bpe_trainer" -> q160Oracle,
    "q308_unigram_trainer" -> q308Oracle,
    "q311_unigram_segment" -> q311Oracle,
    "q165_pagerank" -> q165Oracle,
    "q170_pmi_collocations" -> q170Oracle,
    "q171_triangles" -> q171Oracle,
    "q222_bfs_distances" -> q222Oracle,
    "q230_weighted_paths" -> q230Oracle,
    "q253_critical_path" -> q253Oracle,
    "q256_sparse_matmul" -> q256Oracle,
    "q257_kmeans_train" -> q257Oracle,
    "q258_incr_phash" -> q258Oracle,
    "q259_incr_signatures" -> q259Oracle,
    "q260_grouped_split" -> q260Oracle,
    "q261_epoch_capped_mix" -> q261Oracle,
    "q262_incr_lsh_pairs" -> q262Oracle,
    "q263_component_split" -> q263Oracle,
    "q264_margin_mining" -> q264Oracle,
    "q265_incr_components" -> q265Oracle,
    "q266_cooccurrence" -> q266Oracle,
    "q267_jl_recall" -> q267Oracle,
    "q268_typed_topk" -> q268Oracle,
    "q269_join_view_ivm" -> q269Oracle,
    "q270_temporal_reach" -> q270Oracle,
    "q271_schema_drift" -> q271Oracle,
    "q272_cuped_readout" -> q272Oracle,
    "q273_epoch_schedule" -> q273Oracle,
    "q274_bootstrap_ci" -> q274Oracle,
    "q275_welch_t" -> q275Oracle,
    "q276_mann_whitney" -> q276Oracle,
    "q277_decay_score" -> q277Oracle,
    "q278_label_conflicts" -> q278Oracle,
    "q279_rendezvous_shards" -> q279Oracle,
    "q280_incr_assign" -> q280Oracle,
    "q282_incr_postings" -> q282Oracle,
    "q283_stratified_kfold" -> q283Oracle,
    "q287_incr_verified_neardups" -> q23Oracle,
    "q290_incr_containment" -> q284Oracle,
    "q291_drift_retrain" -> q291Oracle,
    "q293_bm25_maintained" -> q115Oracle,
    "q295_ivf_maintained" -> q25Oracle,
    "q296_incr_simhash" -> q46Oracle,
    "q297_hybrid_rrf" -> q297Oracle,
    "q299_sprt_srm" -> q299Oracle,
    "q301_nightly_maintenance" -> q301Oracle,
    "q302_matryoshka_recall" -> q302Oracle,
    "q303_rank_churn" -> q303Oracle,
    "q288_calibration" -> q288Oracle,
    "q289_concentration" -> q289Oracle,
    "q284_containment" -> q284Oracle,
    "q285_ring_shards" -> q285Oracle,
    "q179_binary_source" -> q179Oracle,
    "q185_domain_cap" -> q185Oracle,
    "q186_ngram_decontam" -> q186Oracle,
    "q187_inverted_index" -> q187Oracle,
    "q188_char_entropy" -> q188Oracle,
    "q192_levenshtein_pairs" -> q192Oracle,
    "q210_mmr_select" -> q210Oracle,
    "q105_quality_classifier" -> q105Oracle,
    "q106_span_excision" -> q106Oracle,
    "q101_mixture_recipe" -> q101Oracle,
    "q102_shared_spans" -> q102Oracle,
    "q107_markup_strip" -> q107Oracle,
    "q108_ngram_fluency" -> q108Oracle,
    "q109_semdedup" -> q109Oracle,
    "q110_hard_negatives" -> q110Oracle,
    "q111_corpus_upsert" -> q111Oracle,
    "q112_cdc_chunks" -> q112Oracle,
    "q113_image_phash" -> q113Oracle,
    "q114_audio_phash" -> q114Oracle,
    "q115_bm25_search" -> q115Oracle,
    "q319_retrieval_eval" -> q319Oracle,
    "q117_quality_rules" -> q117Oracle,
    "q118_temperature_mix" -> q118Oracle,
    "q119_snapshot_diff" -> q119Oracle,
    "q120_dsir_select" -> q120Oracle,
    "q121_sq8_ann" -> q121Oracle,
    "q122_shard_overlap" -> q122Oracle,
    "q123_token_fertility" -> q123Oracle,
    "q124_curriculum" -> q124Oracle,
    "q126_c4_filters" -> q126Oracle,
    "q127_para_dedup" -> q127Oracle,
    "q129_tfidf_keywords" -> q129Oracle,
    "q130_centroid_outliers" -> q130Oracle,
    "q136_source_drift" -> q136Oracle,
    "q139_two_stage_ann" -> q139Oracle,
    "q145_schema_merge" -> q145Oracle,
    "q146_deletion_audit" -> q146Oracle)
}
