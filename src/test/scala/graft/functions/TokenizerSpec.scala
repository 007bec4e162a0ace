package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The tokenizer seam: whitespace default ≡ TextFns.tokens (the oracle
  * contract), and the greedy longest-match subword tokenizer segments
  * against a non-trivial vocabulary with char-level fallback — then
  * threads through the packing/chunking budget parameters unchanged.
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  describe("Tokenizer.Whitespace") {
    it("is exactly TextFns.tokens — the driver-oracle default") {
      val df = Seq("a b c", "single", "x y").toDF("text")
      val got = df.select(
        Tokenizer.Whitespace.tokenize(col("text")).as("a"),
        TextFns.tokens(col("text")).as("b"))
        .filter(not(col("a") === col("b")))
      assert(got.isEmpty)
    }
  }

  describe("Tokenizer.MergeRank (BPE)") {
    // creation-ordered: (l,o)=0 then (lo,w)=1 chains; (o,w)=2 ranks after
    val merges = Seq("l" -> "o", "lo" -> "w", "o" -> "w", "e" -> "r", "w" -> "er")
    val bpe = Tokenizer.MergeRank(merges)

    it("applies merges lowest-rank-first, not left-to-right") {
      // "lower": pairs at start (l,o)=0,(o,w)=2,(e,r)=3 → lo; then
      // (lo,w)=1 → low; (e,r)=3 → er; (low,er)? unranked → [low, er]
      val got = Seq("lower").toDF("text")
        .select(bpe.tokenize(col("text")).as("t")).as[Seq[String]].head()
      assert(got == Seq("low", "er"))
    }

    it("merges the LEFTMOST occurrence when a pair repeats") {
      // "werwer": (e,r)=3 twice → leftmost first; then (w,er)=4 twice →
      // leftmost first → [wer, wer]
      val got = Seq("werwer").toDF("text")
        .select(bpe.tokenize(col("text")).as("t")).as[Seq[String]].head()
      assert(got == Seq("wer", "wer"))
    }

    it("unmergeable characters stay single code points (totality) and reassemble exactly") {
      val got = Seq("xlox y🌍w", "").toDF("text")
        .select(col("text"), bpe.tokenize(col("text")).as("t"),
          array_join(bpe.tokenize(col("text")), "").as("joined"))
        .as[(String, Seq[String], String)].collect()
      assert(got(0)._2 == Seq("x", "lo", "x", "y", "🌍", "w"))
      got.foreach { case (text, _, joined) => assert(joined == text.replace(" ", "")) }
    }

    it("words past maxWordChars pass through whole (code points)") {
      val capped = Tokenizer.MergeRank(merges, maxWordChars = 3)
      val got = Seq("lower low").toDF("text")
        .select(capped.tokenize(col("text")).as("t")).as[Seq[String]].head()
      assert(got == Seq("lower", "low"))
    }

    it("threads through packing budgets like any other tokenizer") {
      import graft.operators.Packing
      val df = Seq((1L, "low lower"), (2L, "wer")).toDF("id", "text")
      val packed = Packing.packOffsets(df, col("id"), bpe.count(col("text")),
        budget = 3)
      val spans = packed.orderBy(col("pack_id"))
        .select(col("first_seq"), col("last_seq")).as[(Long, Long)].collect()
      // doc1 = 3 pieces [low, low, er] → fills seq 0 exactly; doc2 = 1
      // piece [wer] → seq 1: budgets are counted in BPE pieces
      assert(spans.toSeq == Seq((0L, 0L), (1L, 1L)))
    }
  }

  describe("Tokenizer.learnMerges (BPE training)") {
    it("learns the classic frequency-ordered merge sequence, deterministically") {
      // word frequencies: low×5, lower×2, newest×6, widest×3 — the
      // textbook BPE corpus. Hand-derived merge order with the
      // lexicographic tie-break:
      //   (e,s)9 → (es,t)9 → (l,o)7 → (lo,w)7 → (e,w)6 → (ew,est)6
      val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
        .grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
      val merges = Tokenizer.learnMerges(docs, col("text"), numMerges = 6)
      assert(merges == Seq("e" -> "s", "es" -> "t", "l" -> "o",
        "lo" -> "w", "e" -> "w", "ew" -> "est"))
      // the learned table segments an UNSEEN word into learned units
      val got = Seq("lowest").toDF("text")
        .select(Tokenizer.MergeRank(merges).tokenize(col("text")).as("t"))
        .as[Seq[String]].head()
      assert(got == Seq("low", "est"))
    }

    it("stops early when no pair repeats") {
      val docs = Seq("a b c d").toDF("text")
      assert(Tokenizer.learnMerges(docs, col("text"), numMerges = 5) == Nil)
    }
  }

  describe("Tokenizer.learnMergesBatched (one-job BPE training)") {
    it("is merge-for-merge identical to the sequential per-job trainer") {
      // same textbook corpus — batched must replay the exact selection
      // rule: per-position pair counts, (cnt desc, a, b) UTF-8 order,
      // minPairCount exhaustion
      val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
        .grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
      val sequential = Tokenizer.learnMerges(docs, col("text"), numMerges = 8)
      val batched = Tokenizer.learnMergesBatched(docs, col("text"), numMerges = 8)
      assert(batched == sequential)
      assert(batched.take(6) == Seq("e" -> "s", "es" -> "t", "l" -> "o",
        "lo" -> "w", "e" -> "w", "ew" -> "est"))
    }

    it("agrees on repeated-symbol overlaps and the maxWordChars pass-through") {
      // 'aaaa' exercises overlapping (a,a) position counts and the
      // leftmost-nonoverlapping merge; the 12-char word is dropped by
      // the cap in BOTH paths
      val docs = Seq("aaaa aaaa aab", "abababababab cc cc cc").toDF("text")
      val seqM = Tokenizer.learnMerges(docs, col("text"), numMerges = 6, maxWordChars = 6)
      val batM = Tokenizer.learnMergesBatched(docs, col("text"), numMerges = 6, maxWordChars = 6)
      assert(batM == seqM)
    }

    it("stops early when no pair repeats, like the sequential trainer") {
      val docs = Seq("a b c d").toDF("text")
      assert(Tokenizer.learnMergesBatched(docs, col("text"), numMerges = 5) == Nil)
    }

    it("the frequency cap keeps the top words deterministically") {
      // cap to 2 words: newest×6 and low×5 survive (n desc, w) — merges
      // learned from just those
      val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
        .grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
      val capped = Tokenizer.learnMergesBatched(docs, col("text"), numMerges = 3,
        maxVocabWords = 2)
      // hand-derived on {newest:6, low:5}: (e,s)6; then over
      // [n,e,w,es,t] the count-6 candidates tie and (e,w) wins the
      // lexicographic break; then over [n,ew,es,t] (es,t) wins
      assert(capped == Seq("e" -> "s", "e" -> "w", "es" -> "t"))
    }
  }

  describe("Tokenizer.LongestMatch") {
    val vocab = Seq("un", "relate", "related", "ed", "token", "iz", "at", "ation", "s")
    val bpe = Tokenizer.LongestMatch(vocab)

    it("segments each word greedily by LONGEST vocabulary piece") {
      val got = Seq("unrelated tokenizations").toDF("text")
        .select(bpe.tokenize(col("text")).as("t")).as[Seq[String]].head()
      // "unrelated" → un + related (longest, not relate+ed);
      // "tokenizations" → token + iz + ation + s
      assert(got == Seq("un", "related", "token", "iz", "ation", "s"))
    }

    it("falls back to single characters for uncovered spans (totality)") {
      val got = Seq("unqxu").toDF("text")
        .select(bpe.tokenize(col("text")).as("t")).as[Seq[String]].head()
      assert(got == Seq("un", "q", "x", "u"))
    }

    it("words past maxWordChars bypass segmentation as one piece (cost cap)") {
      val capped = Tokenizer.LongestMatch(vocab, maxWordChars = 8)
      val got = Seq("unrelated un").toDF("text")
        .select(capped.tokenize(col("text")).as("t")).as[Seq[String]].head()
      // "unrelated" is 9 chars > 8 → passes through whole; "un" segments
      assert(got == Seq("unrelated", "un"))
    }

    it("pieces always reassemble the word exactly") {
      val words = Seq("unrelated", "tokenization", "zzz", "united", "a")
      val got = words.toDF("text")
        .select(col("text"), array_join(bpe.tokenize(col("text")), "").as("joined"))
        .filter(col("text") =!= col("joined"))
      assert(got.isEmpty)
    }

    it("TrieLongestMatch is piece-for-piece equivalent to the HOF form") {
      val trie = Tokenizer.TrieLongestMatch(vocab)
      val texts = Seq(
        "unrelated tokenizations", "unqxu", "", "a", "zz zz zz",
        "relate related relateded", "s s s", "ationation unun",
        "tokens of unrelated ation" )
      val got = texts.toDF("text")
        .select(trie.tokenize(col("text")).as("a"), bpe.tokenize(col("text")).as("b"))
        .filter(not(col("a") === col("b")))
      assert(got.isEmpty)
    }

    it("TrieLongestMatch matches the HOF form on non-BMP text (code points, not chars)") {
      // Supplementary-plane pieces (each 2 UTF-16 chars): the trie must
      // walk code points — a char-keyed walk would split the surrogate
      // pair on fallback and emit invalid half-surrogate pieces.
      val cpVocab = Seq("𝕏", "𝕏y", "un", "🌍🌍")
      val trie = Tokenizer.TrieLongestMatch(cpVocab)
      val hof = Tokenizer.LongestMatch(cpVocab)
      val texts = Seq(
        "𝕏y un𝕏", // vocab pieces incl. longest-match across a pair
        "🌍🌍🌍", // 3 globes: vocab pair + single-cp fallback
        "😀abc", // non-vocab non-BMP: fallback must take the WHOLE pair
        "")
      val rows = texts.toDF("text")
        .select(trie.tokenize(col("text")).as("a"), hof.tokenize(col("text")).as("b"))
        .as[(Seq[String], Seq[String])].collect()
      rows.foreach { case (a, b) => assert(a == b) }
      // no piece may start or end with an unpaired surrogate
      rows.flatMap(_._1).foreach { p =>
        assert(!Character.isLowSurrogate(p.head) && !Character.isHighSurrogate(p.last))
      }
      // maxWordChars counts code points: 3 globes = 3 code points ≤ 3 → segments
      val capped = Tokenizer.TrieLongestMatch(cpVocab, maxWordChars = 3)
      val got = Seq("🌍🌍🌍").toDF("text")
        .select(capped.tokenize(col("text")).as("t")).as[Seq[String]].head()
      assert(got == Seq("🌍🌍", "🌍"))
    }

    it("TrieLongestMatch honors the maxWordChars pass-through cap") {
      val trie = Tokenizer.TrieLongestMatch(vocab, maxWordChars = 8)
      val got = Seq("unrelated un").toDF("text")
        .select(trie.tokenize(col("text")).as("t")).as[Seq[String]].head()
      assert(got == Seq("unrelated", "un"))
    }

    it("threads through packOffsets as the budget unit") {
      // piece counts: "unrelated"=2, "unq"=2 (un+q), "ed ed"=2
      val df = Seq((1L, "unrelated"), (2L, "unq"), (3L, "ed ed")).toDF("id", "text")
      val packed = graft.operators.Packing
        .packOffsets(df, col("id"), bpe.count(col("text")), budget = 3L)
        .select("pack_id", "n_tok", "start_off", "end_off", "first_seq", "last_seq")
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      assert(packed.toSeq == Seq(
        (1L, 2L, 0L, 2L, 0L, 0L),
        (2L, 2L, 2L, 4L, 0L, 1L), // crosses the 3-token cut → split
        (3L, 2L, 4L, 6L, 1L, 1L)))
    }

    it("threads through chunking windows as the budget unit") {
      // "unrelated tokenizations" = 6 pieces; window 4 stride 2 →
      // starts 0,2,4 with lengths 4,4,2
      val got = graft.operators.Chunking
        .slidingWindows(Seq((7L, "unrelated tokenizations")).toDF("id", "text"),
          col("id"), col("text"), window = 4, stride = 2, tokenizer = bpe)
        .select("chunk_idx", "start_tok", "n_tok", "chunk")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      assert(got.toSeq == Seq(
        (0L, 0L, 4L, "un related token iz"),
        (1L, 2L, 4L, "token iz ation s"),
        (2L, 4L, 2L, "ation s")))
    }
  }

  describe("Tokenizer.learnUnigramLm (unigram-LM training)") {
    it("matches the hand-computed EM trajectory on a one-word corpus") {
      // corpus "ab ab ab": words {ab: 3}; seed a:3 b:3 ab:3, tot 9,
      // ilog2(9)=3 → every piece costs 3-1=2. Viterbi "ab": [ab] is
      // (2, 1) vs [a,b] (4, 2) → [ab]. Round-1 counts ab:3 (a, b kept
      // at 0 as chars). tot 3 → cost ab = 0, unused chars 1+1 = 2.
      // Round 2 identical. Final table and serving segmentation:
      val m = Tokenizer.learnUnigramLm(Seq("ab ab", "ab").toDF("text"),
        col("text"))
      assert(m.pieces == Seq(("a", 0L, 2L), ("ab", 3L, 0L), ("b", 0L, 2L)))
      assert(m.wordPieces == Seq(("ab", Seq("ab"))))
    }

    it("learns multi-char pieces, stays total, and reassembles every word") {
      val corpus = Seq("the cat sat", "the cats sat there", "scatter the cat")
        .toDF("text")
      val m = Tokenizer.learnUnigramLm(corpus, col("text"))
      val wp = m.wordPieces.toMap
      // totality over the vocabulary + exact reassembly
      val vocab = Seq("the", "cat", "sat", "cats", "there", "scatter")
      vocab.foreach { w =>
        assert(wp.contains(w), s"missing vocab word $w")
        assert(wp(w).mkString("") == w, s"$w reassembles as ${wp(w)}")
      }
      // the dominant trigram survives as one piece
      assert(wp("cat") == Seq("cat"), wp("cat").toString)
      // every used piece is in the table; single chars are never pruned
      val tbl = m.pieces.map(p => p._1 -> p._2).toMap
      wp.values.flatten.foreach(p => assert(tbl.contains(p), s"used piece $p not in table"))
      vocab.flatMap(_.toSeq).distinct.foreach(c =>
        assert(tbl.contains(c.toString), s"char $c pruned"))
      // deterministic: training twice gives the identical model
      val m2 = Tokenizer.learnUnigramLm(corpus, col("text"))
      assert(m2 == m)
    }

    it("a full (cost, count) tie resolves by UTF-8 piece-list order — the SQL-replayable rule") {
      // "aaa aaa" at maxPieceLen 2: pieces a and aa both cost 1, so
      // [a, aa] and [aa, a] tie on (cost 2, k 2); list order picks
      // [a, aa] ("a" < "aa"). A longest-match-first bias would emit
      // [aa, a] and fork from the DuckDB list_sort replay.
      val m = Tokenizer.learnUnigramLm(Seq("aaa aaa").toDF("text"),
        col("text"), maxPieceLen = 2)
      assert(m.wordPieces.toMap.apply("aaa") == Seq("a", "aa"))
    }

    it("caps long words out of training; counts are final-segmentation exact") {
      val m = Tokenizer.learnUnigramLm(
        Seq("abcdefghijklmnop ab ab").toDF("text"), col("text"),
        maxWordChars = 12)
      // the 16-char word is excluded: none of its unique chars leak in
      assert(!m.pieces.exists(_._1.contains("p")))
      assert(!m.wordPieces.exists(_._1 == "abcdefghijklmnop"))
      // counts replay the last EM round: ab used twice
      assert(m.pieces.find(_._1 == "ab").map(_._2).contains(2L))
    }
  }

  describe("Tokenizer.UnigramLm (serving behind the trait)") {
    it("serves the trained model's memoized segmentation through tokenize()") {
      val corpus = Seq("the cat sat", "the cats sat there", "scatter the cat")
        .toDF("text")
      val m = Tokenizer.learnUnigramLm(corpus, col("text"))
      val got = corpus.select(Tokenizer.UnigramLm(m).tokenize(col("text")).as("p"))
        .as[Seq[String]].collect().toSeq
      // per-doc piece stream = concatenation of each word's memoized pieces
      val wp = m.wordPieces.toMap
      val want = Seq("the cat sat", "the cats sat there", "scatter the cat")
        .map(_.split(" ", -1).toSeq.flatMap(wp))
      assert(got == want)
      // reassembly totality: pieces concatenate back to the words
      got.zip(Seq("thecatsat", "thecatssatthere", "scatterthecat"))
        .foreach { case (ps, flat) => assert(ps.mkString("") == flat) }
    }

    it("OOV words fall back per code point; over-cap words pass through whole") {
      val m = Tokenizer.learnUnigramLm(Seq("ab ab").toDF("text"), col("text"))
      assert(m.maxWordChars == 12)
      val df = Seq("ab xy abcdefghijklmnop 😀z").toDF("text")
      val got = df.select(Tokenizer.UnigramLm(m).tokenize(col("text")).as("p"))
        .as[Seq[String]].collect().head
      // ab = memoized [ab]; xy = OOV chars; 16-char word whole;
      // the surrogate-pair emoji must not split
      assert(got == Seq("ab", "x", "y", "abcdefghijklmnop", "😀", "z"))
    }

    it("empty words contribute no pieces and null maps to null — the trait contract") {
      val m = Tokenizer.learnUnigramLm(Seq("ab ab").toDF("text"), col("text"))
      val df = Seq(Some("ab  ab"), Some(""), None).toDF("text")
      val got = df.select(Tokenizer.UnigramLm(m).tokenize(col("text")).as("p"))
        .as[Option[Seq[String]]].collect().toSeq
      assert(got == Seq(Some(Seq("ab", "ab")), Some(Nil), None))
    }

    it("drives packOffsets budgets exactly like any other tokenizer") {
      // 4 docs of "ab ab" -> 2 pieces each under the model; budget 3
      // packs them at piece granularity: offsets 0,2,4,6
      val m = Tokenizer.learnUnigramLm(Seq("ab ab").toDF("text"), col("text"))
      val d = (0L until 4L).map(i => (i, "ab ab")).toDF("id", "text")
      val got = graft.operators.Packing.packOffsets(
          d, col("id"), size(Tokenizer.UnigramLm(m).tokenize(col("text"))),
          budget = 3L)
        .orderBy(col("pack_id"))
        .select(col("pack_id"), col("n_tok"), col("start_off"), col("end_off"))
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == Seq((0L, 2L, 0L, 2L), (1L, 2L, 2L, 4L),
        (2L, 2L, 4L, 6L), (3L, 2L, 6L, 8L)))
    }
  }
}
