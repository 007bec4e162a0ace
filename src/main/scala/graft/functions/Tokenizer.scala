package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable tokenizer seam for every token-budget operator (sequence
  * packing, chunking, vocab/OOV, token stats): budgets in a real
  * training-data pipeline are TOKENIZER tokens (BPE/WordPiece), not
  * whitespace words, but whitespace is the oracle-checkable default the
  * driver pins. Operators take token counts/arrays as plain `Column`s,
  * so any `Tokenizer` threads through them unchanged —
  * `Packing.packOffsets(df, id, tok = myTokenizer.count(col("text")), …)`.
  *
  * Both implementations are pure column expressions (codegen'd, no
  * UDFs, no driver round-trips), so they run inside whole-stage codegen
  * next to the operators that consume them.
  */
trait Tokenizer extends Serializable {
  /** `array<string>` of tokens for a text column. */
  def tokenize(text: Column): Column
  /** Token count — the budget unit packing/chunking consume. */
  def count(text: Column): Column = size(tokenize(text))
}

object Tokenizer {

  /** Whitespace words — [[TextFns.tokens]], the driver-oracle default
    * (`string_split(text, ' ')` on the DuckDB side). */
  case object Whitespace extends Tokenizer {
    override def tokenize(text: Column): Column = TextFns.tokens(text)
  }

  /** [[LongestMatch]]'s semantics behind a TRIE-backed custom Catalyst
    * expression — the PRODUCTION-vocab path: per character position the
    * trie walk costs O(longest piece) instead of a full piece-list scan,
    * so a 32k-piece vocabulary is fine. Spec-pinned equivalent to
    * [[LongestMatch]] on any input.
    */
  final case class TrieLongestMatch(vocab: Seq[String], maxWordChars: Int = 100)
      extends Tokenizer {
    override def tokenize(text: Column): Column =
      graft.catalyst.TrieTokenize(text, vocab, maxWordChars)
  }

  /** Byte-pair-encoding merge-rank segmentation behind the seam — the
    * GPT-style production shape ([[graft.catalyst.BpeTokenize]]): each
    * word explodes to code points, then the lowest-ranked adjacent pair
    * merges (leftmost occurrence) until no pair is in the table. Same
    * word framing as the other tokenizers: whitespace pre-split,
    * `maxWordChars` code-point pass-through cap, empty words contribute
    * nothing. */
  final case class MergeRank(merges: Seq[(String, String)], maxWordChars: Int = 100)
      extends Tokenizer {
    override def tokenize(text: Column): Column =
      graft.catalyst.BpeTokenize(text, merges, maxWordChars)
  }

  /** Learn a BPE merge table from a corpus — classic BPE training
    * re-expressed on DataFrames: segment the WORD-FREQUENCY table (the
    * vocabulary, orders of magnitude smaller than the corpus — built
    * once, materialized once) under the merges learned so far, count
    * adjacent piece pairs weighted by word frequency, adopt the most
    * frequent pair (deterministic lexicographic tie-break), repeat.
    * One key-partitioned aggregation plus a single-row collect per
    * merge — the Lloyd's-iteration shape, control flow on the driver,
    * data flow distributed. Stops early when no pair repeats
    * (`minPairCount`). The result is creation-ordered BY CONSTRUCTION
    * (a pair mentioning a merged piece can only be counted after the
    * merge that created it), which is exactly the precondition under
    * which [[MergeRank]]'s leftmost-lowest inference equals batch BPE.
    *
    * Words longer than `maxWordChars` code points pass through
    * segmentation whole (the [[MergeRank]] cap) and therefore
    * contribute no pairs — training and inference see the same corpus.
    */
  def learnMerges(docs: org.apache.spark.sql.DataFrame, text: Column,
                  numMerges: Int, maxWordChars: Int = 100,
                  minPairCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val words = docs.select(explode(TextFns.tokens(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // vocabulary-sized; every iteration re-reads it
    val merges = collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val pieces = graft.catalyst.BpeTokenize(col("w"), merges.toSeq, maxWordChars)
      val top = words
        .select(col("n"), pieces.as("p"))
        .filter(size(col("p")) >= 2)
        .select(col("n"), explode(
          transform(sequence(lit(0), size(col("p")) - 2),
            i => struct(get(col("p"), i).as("a"), get(col("p"), i + 1).as("b")))).as("pr"))
        .groupBy(col("pr.a"), col("pr.b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      top.headOption.filter(_.getLong(2) >= minPairCount) match {
        case Some(r) => merges += (r.getString(0) -> r.getString(1))
        case None    => exhausted = true
      }
    }
    merges.toSeq
  }

  /** [[learnMerges]] batched to ONE distributed job (VERDICT r6 #5 /
    * r7 #5): the per-merge Spark-job loop is O(numMerges) sequential
    * jobs — a 32k-merge production vocab would be ~32k jobs of pure
    * scheduling overhead. But everything after the word-frequency
    * aggregation operates on the VOCABULARY (unique words × counts),
    * which is orders of magnitude smaller than the corpus — so this
    * trainer runs the corpus-sized work (tokenize + word count) as one
    * distributed aggregation, collects the word-frequency table, and
    * replays the EXACT same merge-selection rule driver-locally with
    * incremental pair-count maintenance (the classic fast-BPE shape:
    * adopting a merge only touches words that contain the pair).
    *
    * Equivalence (spec-pinned): identical merge list to [[learnMerges]]
    * — same per-position adjacent-pair counting (overlaps included),
    * same (count desc, a, b) selection with UTF-8 binary string order
    * (Spark's UTF8String comparison, NOT Java's UTF-16 String order),
    * same `minPairCount` exhaustion, same `maxWordChars` pass-through
    * (capped words contribute no pairs in either path).
    *
    * 100 TB scale: the collected table is the DEDUPLICATED vocabulary.
    * Natural-language vocabularies are Zipfian (~10⁷–10⁸ uniques for
    * web-scale corpora); `maxVocabWords` caps the collect to the
    * top-frequency words (deterministic (n desc, w) order) — the
    * documented sampled-word-table path: tail singletons cannot win a
    * merge above `minPairCount` anyway, so a generous cap (default 2M)
    * preserves the learned table while bounding driver memory to
    * ~hundreds of MB.
    */
  def learnMergesBatched(docs: org.apache.spark.sql.DataFrame, text: Column,
                         numMerges: Int, maxWordChars: Int = 100,
                         minPairCount: Long = 2L,
                         maxVocabWords: Int = 2000000): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(maxVocabWords >= 1, s"maxVocabWords must be >= 1, got $maxVocabWords")
    // the ONLY corpus-sized job: word-frequency aggregation (+ the
    // deterministic top-frequency cap)
    val wf = docs.select(explode(TextFns.tokens(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocabWords)
      .collect()

    // ---- driver-local exact replay over the word-frequency table ----
    import java.nio.charset.StandardCharsets.UTF_8
    // Spark orders strings by UTF8String binary comparison (unsigned
    // UTF-8 bytes); Java String.compareTo is UTF-16 code-unit order and
    // DIFFERS above the BMP — replicate Spark's order exactly.
    def utf8Lt(a: String, b: String): Boolean = {
      val x = a.getBytes(UTF_8); val y = b.getBytes(UTF_8)
      var i = 0
      val m = math.min(x.length, y.length)
      while (i < m) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    def pairLt(p: (String, String), q: (String, String)): Boolean =
      if (p._1 != q._1) utf8Lt(p._1, q._1) else utf8Lt(p._2, q._2)

    // capped words pass through whole → contribute no pairs (as in
    // BpeTokenize); drop them here so both paths see the same corpus
    val words: Array[(Array[String], Long)] = wf.iterator
      .map(r => (r.getString(0), r.getLong(1)))
      .filter { case (w, _) => w.codePointCount(0, w.length) <= maxWordChars }
      .map { case (w, n) =>
        (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), n)
      }
      .filter(_._1.length >= 2)
      .toArray

    val counts = collection.mutable.HashMap.empty[(String, String), Long]
    val where = collection.mutable.HashMap.empty[(String, String), collection.mutable.BitSet]
    def addWord(wi: Int, sign: Long): Unit = {
      val (pieces, n) = words(wi)
      var i = 0
      while (i < pieces.length - 1) {
        val p = (pieces(i), pieces(i + 1))
        val c = counts.getOrElse(p, 0L) + sign * n
        if (c == 0L) { counts.remove(p); where.get(p).foreach(_ -= wi) }
        else {
          counts(p) = c
          if (sign > 0) where.getOrElseUpdate(p, collection.mutable.BitSet.empty) += wi
        }
        i += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    def applyMerge(pieces: Array[String], a: String, b: String): Array[String] = {
      val out = collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < pieces.length) {
        if (i < pieces.length - 1 && pieces(i) == a && pieces(i + 1) == b) {
          out += (a + b); i += 2 // leftmost-first, non-overlapping
        } else { out += pieces(i); i += 1 }
      }
      out.toArray
    }

    val merges = collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      // linear scan for the max — O(#live pairs); vocabulary-sized, and
      // replaces a full Spark job per merge
      var best: (String, String) = null
      var bestCnt = 0L
      counts.foreach { case (p, c) =>
        if (c > bestCnt || (c == bestCnt && best != null && pairLt(p, best))) {
          best = p; bestCnt = c
        }
      }
      if (best == null || bestCnt < minPairCount) exhausted = true
      else {
        merges += best
        // touch ONLY the words containing the adopted pair
        val touched = where.getOrElse(best, collection.mutable.BitSet.empty).toArray
        touched.foreach { wi =>
          addWord(wi, -1L)
          words(wi) = (applyMerge(words(wi)._1, best._1, best._2), words(wi)._2)
          addWord(wi, 1L)
        }
      }
    }
    merges.toSeq
  }

  /** A trained unigram-LM tokenizer model: the learned piece table
    * (piece, corpus count under the final segmentation, fixed-point
    * cost) and the final Viterbi segmentation of every vocabulary
    * word — the memoized-inference table a production pipeline joins
    * against (per-unique-word segmentation is the standard serving
    * shape: the vocabulary is Zipf-bounded while the corpus is not).
    * Carries the training `maxWordChars` so serving ([[UnigramLm]])
    * applies the IDENTICAL pass-through cap — the two caps forking is
    * a silent segmentation skew, so the model owns the number.
    */
  final case class UnigramModel(pieces: Seq[(String, Long, Long)],
                                wordPieces: Seq[(String, Seq[String])],
                                maxWordChars: Int)

  /** Unigram-LM INFERENCE behind the [[Tokenizer]] seam — the serving
    * face of [[learnUnigramLm]], so everything downstream that is
    * tokenizer-parameterized (packing budgets q69–q71, vocab budgets,
    * fertility audits) runs under unigram piece counts exactly as it
    * does under [[MergeRank]]/[[LongestMatch]]. Segmentation is the
    * model's memoized word→pieces table shipped into a custom
    * expression ([[graft.catalyst.UnigramSegment]] — the
    * [[graft.catalyst.TrieTokenize]] reference-object shape, O(1) per
    * word at any vocabulary size, whole-stage-codegen friendly);
    * out-of-vocabulary words fall back per code point and words over
    * the model's `maxWordChars` pass through whole — byte-identical
    * to q311's broadcast-join serving semantics, reassembly-exact
    * either way.
    */
  final case class UnigramLm(model: UnigramModel) extends Tokenizer {
    override def tokenize(text: Column): Column =
      graft.catalyst.UnigramSegment(text, model.wordPieces, model.maxWordChars)
  }

  /** Unigram-LM (SentencePiece-style) tokenizer TRAINING — the third
    * production trainer behind the seam, next to [[learnMerges]] (BPE)
    * and the trie/longest-match inference pair. Hard-EM over piece
    * likelihoods with the [[learnMergesBatched]] scale discipline: the
    * ONLY corpus-sized job is the word-frequency aggregation; seeding,
    * every E-step (Viterbi re-segmentation of the vocabulary), every
    * M-step (piece re-counting + re-scoring) replay driver-locally
    * over the Zipf-bounded word table.
    *
    * INTEGER-EXACT SCORING (the q108 idiom, so a SQL oracle replays
    * every EM decision bit-for-bit — no transcendentals): a piece's
    * cost is `ilog2(total) − ilog2(cnt)` (floor-log2 via the binary
    * length; a kept-but-unused piece scores `ilog2(total) + 1`, the
    * n-gram-LM OOV convention), and Viterbi minimizes the struct
    * (Σ cost, piece count, piece list) under full lexicographic order
    * — cost first, fewer pieces on ties, then UTF-8-binary piece-list
    * order — so the optimum is UNIQUE and engine-independent.
    *
    * EM structure: seed pieces are all ≤ `maxPieceLen`-char substrings
    * of vocabulary words, frequency-weighted (occurrences × word
    * count); each round Viterbi-segments every vocabulary word under
    * the current costs, re-counts pieces from the segmentations, and
    * PRUNES pieces that went unused — except single characters, which
    * are kept forever so segmentation stays total (the char-fallback
    * totality contract every tokenizer here shares). Words longer than
    * `maxWordChars` characters are excluded from training and pass
    * through segmentation whole, exactly like [[MergeRank]]'s cap.
    * (Character = UTF-16 code unit here, matching Spark's `length`;
    * identical to the oracle's code-point `len` on the ASCII corpora
    * the pins run — the q104 family's documented equivalence.)
    *
    * 100 TB: `maxVocabWords` caps the collected vocabulary to the
    * top-frequency words ((n desc, w) deterministic order) — the same
    * documented sampled-word-table path as [[learnMergesBatched]];
    * tail singletons can't shift an ilog2-quantized score anyway.
    *
    * DRIVER-MEMORY ENVELOPE: the seed substring table is built
    * driver-locally with up to `maxWordChars · maxPieceLen` hash-map
    * updates per vocabulary word (distinct-entry peak bounded by the
    * same product), and each EM round runs Viterbi over every word —
    * so the driver heap scales as
    * O(maxVocabWords · maxWordChars · maxPieceLen) string entries.
    * At the 500k default × 12 × 4 that is ≤ ~24M updates (hundreds of
    * MB peak); the previous 2M default permitted a multi-GB spike.
    * Raise `maxVocabWords` only with driver heap sized to that
    * product — SentencePiece's own trainer samples its sentence table
    * for exactly this reason.
    */
  def learnUnigramLm(docs: org.apache.spark.sql.DataFrame, text: Column,
                     maxPieceLen: Int = 4, maxWordChars: Int = 12,
                     rounds: Int = 2,
                     maxVocabWords: Int = 500000): UnigramModel = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(maxWordChars >= 1, s"maxWordChars must be >= 1, got $maxWordChars")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // the ONLY corpus-sized job (the learnMergesBatched discipline)
    val wf: Array[(String, Long)] = docs
      .select(explode(TextFns.tokens(text)).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= maxWordChars)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // ---- driver-local exact replay over the word-frequency table ----
    import java.nio.charset.StandardCharsets.UTF_8
    def ilog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    // Spark/DuckDB both compare strings by unsigned UTF-8 bytes
    def utf8Cmp(a: String, b: String): Int = {
      val x = a.getBytes(UTF_8); val y = b.getBytes(UTF_8)
      var i = 0
      val m = math.min(x.length, y.length)
      while (i < m) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    // piece-list order: element-wise UTF-8, shorter-prefix first (SQL
    // list order) — only consulted on a full (cost, count) tie
    def listLt(xs: List[String], ys: List[String]): Boolean = {
      val it = xs.iterator.zip(ys.iterator)
      while (it.hasNext) {
        val (x, y) = it.next()
        val c = utf8Cmp(x, y)
        if (c != 0) return c < 0
      }
      xs.length < ys.length
    }

    // seed: every <= maxPieceLen-char substring, occurrence-weighted
    val seed = collection.mutable.HashMap.empty[String, Long]
    val chars = collection.mutable.HashSet.empty[String]
    wf.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        chars += w.substring(i, i + 1)
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          seed(p) = seed.getOrElse(p, 0L) + n
          l += 1
        }
        i += 1
      }
    }

    def costs(tbl: collection.Map[String, Long]): collection.Map[String, Long] = {
      val tot = tbl.valuesIterator.sum
      val it = ilog2(tot)
      tbl.map { case (p, c) => p -> (if (c >= 1) it - ilog2(c) else it + 1L) }
    }

    def viterbi(w: String, cost: collection.Map[String, Long]): List[String] = {
      // best(j) = min state over segmentations of w[0, j)
      val best = new Array[(Long, Long, List[String])](w.length + 1)
      best(0) = (0L, 0L, Nil)
      var j = 1
      while (j <= w.length) {
        var sel: (Long, Long, List[String]) = null
        var l = 1
        while (l <= math.min(maxPieceLen, j)) {
          val p = w.substring(j - l, j)
          cost.get(p).foreach { c =>
            val prev = best(j - l)
            val (cc, kk) = (prev._1 + c, prev._2 + 1L)
            // piece lists stay reversed for O(1) extension; the list
            // order is only materialized on a full (cost, count) tie
            val better = sel == null ||
              cc < sel._1 || (cc == sel._1 && (kk < sel._2 ||
                (kk == sel._2 && listLt((p :: prev._3).reverse, sel._3.reverse))))
            if (better) sel = (cc, kk, p :: prev._3)
          }
          l += 1
        }
        best(j) = sel // never null: single chars are always in the table
        j += 1
      }
      best(w.length)._3.reverse
    }

    var table: collection.Map[String, Long] = seed
    for (_ <- 1 to rounds) {
      val cost = costs(table)
      val cnt = collection.mutable.HashMap.empty[String, Long]
      wf.foreach { case (w, n) =>
        viterbi(w, cost).foreach(p => cnt(p) = cnt.getOrElse(p, 0L) + n)
      }
      chars.foreach(c => if (!cnt.contains(c)) cnt(c) = 0L)
      table = cnt
    }
    val finalCost = costs(table)
    // serving segmentation: one more Viterbi under the FINAL costs
    val served = wf.iterator.map { case (w, _) => w -> viterbi(w, finalCost) }
    UnigramModel(
      table.toSeq.map { case (p, c) => (p, c, finalCost(p)) }
        .sortWith((a, b) => utf8Cmp(a._1, b._1) < 0),
      served.map { case (w, ps) => (w, ps: Seq[String]) }.toSeq
        .sortWith((a, b) => utf8Cmp(a._1, b._1) < 0),
      maxWordChars)
  }

  /** Greedy longest-match subword segmentation over a fixed vocabulary
    * — the WordPiece/BPE-inference shape: pre-split on whitespace, then
    * repeatedly take the longest vocabulary piece prefixing the
    * remaining word; a character with no covering piece falls back to
    * itself (char-level totality, so segmentation never fails and the
    * piece stream always reassembles the word exactly).
    *
    * The vocabulary ships as a LITERAL array inside the expression
    * (sorted longest-first so the first prefix hit IS the longest
    * match) — the broadcast-lookup shape at kilobyte vocab sizes; each
    * fold step scans the piece list, so keep `vocab` ≲ 10³ pieces. A
    * production 32k-piece vocab swaps in a trie-backed custom
    * `Expression` behind this same trait without touching any operator.
    *
    * Segmentation work is O(|word|·|vocab|) per word, so words longer
    * than `maxWordChars` (default 100 — WordPiece's own cap) skip the
    * fold and pass through as ONE piece: a single MB-sized
    * whitespace-free blob (base64, minified JS) must not cost 10⁹
    * string ops or a giant intermediate struct per row. Reassembly
    * stays exact either way.
    */
  final case class LongestMatch(vocab: Seq[String], maxWordChars: Int = 100) extends Tokenizer {
    require(vocab.nonEmpty, "vocab must not be empty")
    require(vocab.forall(_.nonEmpty), "vocab pieces must be non-empty")
    require(maxWordChars >= 1, s"maxWordChars must be >= 1, got $maxWordChars")
    private val sorted = vocab.distinct.sortBy(p => (-p.length, p))

    override def tokenize(text: Column): Column = {
      val pieces = array(sorted.map(lit): _*)
      flatten(transform(TextFns.tokens(text), w =>
        when(length(w) > maxWordChars, array(w)).otherwise(
        aggregate(
          // each step consumes ≥ 1 char, so |word| steps always finish
          sequence(lit(1), greatest(length(w), lit(1))),
          struct(lit(1).as("pos"), array().cast("array<string>").as("out")),
          (st, _) => {
            val pos = st.getField("pos")
            val out = st.getField("out")
            // try_element_at: no hit → null → char fallback (ANSI-safe)
            val hits = filter(pieces, p => w.substr(pos, length(p)) === p)
            val best = coalesce(try_element_at(hits, lit(1)), w.substr(pos, lit(1)))
            when(pos > length(w), st)
              .otherwise(struct((pos + length(best)).as("pos"),
                concat(out, array(best)).as("out")))
          },
          st => st.getField("out")))))
    }
  }
}
