package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data operators (dedup, near-dup,
  * fingerprinting, quality scoring). All pure column expressions
  * (codegen'd, no UDFs), each with an exact DuckDB-SQL counterpart so the
  * driver's oracle can pin them.
  */
object TextFns {

  /** Whitespace tokens (single-space corpus; `split` keeps empties away
    * for the documents table's normalized text). */
  def tokens(text: Column): Column = split(text, " ")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Distinct w-gram word shingles from a MATERIALIZED token-array
    * column. Token vocabulary in web corpora is heavy-tailed; single
    * tokens under-discriminate (the test corpus has a 31-word
    * vocabulary), while 3-shingles separate true near-dups cleanly.
    *
    * IMPORTANT: pass an attribute reference (project `tokens(text)`
    * first), not `split(...)` inline — expressions inside higher-order
    * lambdas are NOT subexpression-eliminated, so an inline split would
    * re-tokenize the document for every element_at (observed ~300×
    * slowdown).
    */
  def shinglesOf(toks: Column, w: Int = 3): Column =
    array_distinct(ngramsOf(toks, w))

  /** Convenience one-shot form — only for small inputs/tests; hot paths
    * must project [[tokens]] first and use [[shinglesOf]]. */
  def shingles(text: Column, w: Int = 3): Column = shinglesOf(tokens(text), w)

  /** ALL w-gram word shingles WITH multiplicity — the single w-gram
    * construction ([[shinglesOf]] is its array_distinct; repetition
    * analysis needs the duplicates that drops). Materialized-token-array
    * contract as documented on [[shinglesOf]]. */
  def ngramsOf(toks: Column, w: Int): Column =
    when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", (0 until w).map(o => element_at(toks, i + o + 1)): _*)))
      .otherwise(array())

  /** Canonical text for dedup/fingerprinting — the normalization pass
    * that makes near-identical bytes identical BEFORE content hashing:
    * case-fold, control characters (incl. tab/newline/CR) to spaces,
    * whitespace runs collapsed to one space, ends trimmed. Regex
    * deliberately uses explicit hex ranges, not \\p classes — the
    * subset Java (Spark) and RE2-style (DuckDB) engines agree on, so
    * the oracle reproduces the canonical text byte-for-byte.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\x00-\\x1f\\x7f]", " "),
      "  +", " "))

  /** DuckDB rendition of [[normalize]] over a SQL expression string. */
  def normalizeSql(expr: String): String =
    s"trim(regexp_replace(regexp_replace(lower($expr), " +
      "'[\\x00-\\x1f\\x7f]', ' ', 'g'), '  +', ' ', 'g'))"

  /** Deterministic 60-bit hash shared bit-for-bit with DuckDB:
    * first 15 hex digits of md5, read as an integer. Spark:
    * `conv(substring(md5(s),1,15),16,10)`; DuckDB:
    * `('0x' || substr(md5(s),1,15))::BIGINT`.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** DuckDB rendition of [[hash60]] over a SQL expression string. */
  def hash60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Plain-JVM rendition of [[hash60]] — driver-side reference for specs
    * that re-derive a selection without Spark, and the synthetic-media
    * generators' per-cell randomness (executor hot path: millions of
    * calls per corpus synthesis). The first 15 hex chars of an MD5 are
    * exactly the top 60 bits of its first 8 bytes, so the value is read
    * straight off the digest — no per-byte hex formatting — and the
    * MessageDigest instance is reused per thread (getInstance walks the
    * provider registry on every call). */
  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60Value(s: String): Long = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // big-endian first 8 bytes >>> 4 == parseLong(hex.substring(0, 15), 16)
    java.nio.ByteBuffer.wrap(d).getLong(0) >>> 4
  }

  /** Seeded hash family for MinHash: h_i(x) = hash60(i || ':' || x). */
  def seededHash(seed: Int, c: Column): Column =
    hash60(concat(lit(seed.toString), lit(":"), c))

  def seededHashSql(seed: Int, expr: String): String =
    hash60Sql(s"'$seed:' || $expr")

  /** Cheap MinHash permutation family over ONE base [[hash60]] value:
    * h_i = (a_i·hLo + b_i·hHi + c_i) mod (2^31−1) with hLo/hHi the low/
    * high 30 bits. One md5 per element instead of one per (element,
    * seed); products stay < 2^56 so the identical int64 arithmetic runs
    * in DuckDB. Standard 2-universal construction.
    */
  def permA(i: Int): Long = 999983L * i + 104729L
  def permB(i: Int): Long = 999979L * i + 65537L
  def permC(i: Int): Long = 7919L * i + 17L
  val PermMod: Long = 2147483647L
  private val Mask30 = 1073741823L

  def minhashPerm(i: Int, h: Column): Column =
    (lit(permA(i)) * h.bitwiseAND(lit(Mask30)) +
      lit(permB(i)) * shiftright(h, 30).bitwiseAND(lit(Mask30)) +
      lit(permC(i))) % lit(PermMod)

  def minhashPermSql(i: Int, hExpr: String): String =
    s"(${permA(i)} * ($hExpr & $Mask30) + ${permB(i)} * (($hExpr >> 30) & $Mask30) + ${permC(i)}) % $PermMod"

  /** English stopword-ish list for quality/language heuristics (public
    * top-frequency words). */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for", "with", "as", "at", "by")
}
