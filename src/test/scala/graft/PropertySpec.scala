package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funspec.AnyFunSpec

import org.apache.spark.sql.functions._

import graft.pipeline.{DynamicPath, GZipLines, RowTypes}
import graft.functions.Tstamps

/** Property-based coverage (SURVEY §5's scalacheck upgrades): totality
  * of the per-record expressions on ARBITRARY input (the pipeline's
  * degrade-gracefully contract, reference Common.scala:67-70,88-96),
  * partition-of-the-input for the row-type bucketing, and serializer
  * round-trips on arbitrary byte payloads.
  *
  * Runs scalacheck directly (the scalatest↔scalacheck bridge artifact
  * is not in the offline dependency cache).
  */
class PropertySpec extends AnyFunSpec {

  private lazy val spark = TestSession.spark

  /** scalacheck runner → scalatest assertion. */
  private def check(p: Prop, minTests: Int = 50): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  // valid UTF-8 strings without the line terminator (the pipeline's
  // framing unit is the line — see GZipLines doc)
  private val lineGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('\t', ' ', '{', '}', '"', ':', '/', '.', '-', 'é', '台')))
      .map(_.mkString)

  describe("GZipLines round-trip (reference GZipSerializer framing)") {
    it("gunzip(gzip(lines)) == lines for arbitrary line batches") {
      check(forAll(Gen.listOf(lineGen)) { lines =>
        val packed = GZipLines.gzip(lines.map(_.getBytes("UTF-8")))
        val back = GZipLines.gunzipLines(new java.io.ByteArrayInputStream(packed))
        back == lines
      })
    }

    it("round-trips arbitrary binary records (newline-free)") {
      val recGen = Gen.listOf(Gen.choose[Byte](Byte.MinValue, Byte.MaxValue))
        .map(_.filter(_ != '\n'.toByte).toArray)
      check(forAll(Gen.listOf(recGen)) { records =>
        val packed = GZipLines.gzip(records)
        val back = GZipLines.gunzipLines(new java.io.ByteArrayInputStream(packed))
        back.map(_.getBytes("UTF-8").toSeq) == records.map(r => new String(r, "UTF-8").getBytes("UTF-8").toSeq)
      })
    }
  }

  describe("Row-type bucketing is a partition of the input") {
    it("every record lands in exactly one non-null bucket, arbitrary content") {
      check(Prop.forAllNoShrink(Gen.listOfN(30, lineGen)) { lines =>
        import spark.implicits._
        val nonEmpty = if (lines.isEmpty) List("x") else lines
        val typed = nonEmpty.toDF("value")
          .withColumn("error", lit(null).cast("array<string>"))
          .select(RowTypes.partition(col("value"), col("error")).as("rt"))
          .collect()
        typed.length == nonEmpty.length && typed.forall(r => !r.isNullAt(0) && r.getString(0).nonEmpty)
      })
    }
  }

  describe("Collector-tstamp extraction is total") {
    it("never throws and yields either null or a valid timestamp, arbitrary TSV-ish rows") {
      val rowGen = Gen.oneOf(
        lineGen,
        // TSV shape with a timestamp-ish column 3
        for {
          pre <- Gen.listOfN(3, Gen.alphaNumStr)
          ts <- Gen.oneOf("2020-11-26 00:01:05", "2020-11-26 00:01:05.123", "garbage",
            "9999-99-99 99:99:99", "", "2020-11-26T00:01:05Z")
          post <- Gen.alphaNumStr
        } yield (pre :+ ts :+ post).mkString("\t"))
      check(Prop.forAllNoShrink(Gen.listOfN(30, rowGen)) { rows =>
        import spark.implicits._
        val nonEmpty = if (rows.isEmpty) List("x") else rows
        // totality: the parse expression must not throw on ANY input
        // (ANSI-safe try_to_timestamp path, reference Common.scala:88-96)
        val out = nonEmpty.toDF("value")
          .select(Tstamps.collectorTstamp(col("value")).as("ts"))
          .collect()
        out.length == nonEmpty.length
      })
    }
  }

  describe("DynamicPath decoration is total") {
    it("never throws on arbitrary brace patterns") {
      val patGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('{', '}', '/', '-', '.')))
        .map(_.mkString)
      check(forAll(patGen) { pat =>
        val out = DynamicPath.decorateDirectoryWithTime(pat, java.time.Instant.ofEpochMilli(100000))
        out != null
      })
    }
  }

  describe("media codec round-trips on arbitrary content") {
    import graft.operators.Multimodal.{AudioCodec, ImageCodec, VideoCodec}

    it("WAV: decode(encode(samples)) recovers exact samples, rate, and stats") {
      val gen = for {
        rate <- Gen.oneOf(8000, 16000, 44100)
        samples <- Gen.nonEmptyListOf(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
      } yield (rate, samples)
      check(forAll(gen) { case (rate, samples) =>
        val wav = AudioCodec.encodePcm16Wav(rate, samples.length)(samples(_))
        val d = AudioCodec.decode(wav).get
        d.sampleRate == rate && d.nSamples == samples.length &&
          d.smpMin == samples.min && d.smpMax == samples.max &&
          d.smpSum == samples.map(_.toLong).sum
      }, minTests = 30)
    }

    it("GIF: every sampled frame's pixel stats match the generating function") {
      val gen = for {
        w <- Gen.choose(1, 9)
        h <- Gen.choose(1, 7)
        frames <- Gen.choose(1, 6)
        seed <- Gen.choose(0, 1000)
      } yield (w, h, frames, seed)
      check(forAll(gen) { case (w, h, frames, seed) =>
        def px(fr: Int, x: Int, y: Int) = (seed + fr * 31 + y * 7 + x * 3) % 256
        val gif = VideoCodec.encodeGrayGif(w, h, frames)(px)
        val d = VideoCodec.decodeFrames(gif, everyK = 1, cap = frames).get
        val all = for { fr <- 0 until frames; y <- 0 until h; x <- 0 until w } yield px(fr, x, y)
        d.nFrames == frames && d.framesSampled == frames &&
          d.width == w && d.height == h &&
          d.pxMin == all.min && d.pxMax == all.max && d.pxSum == all.map(_.toLong).sum
      }, minTests = 30)
    }

    it("PNG: gray encode/decode is lossless for arbitrary pixel functions") {
      val gen = for {
        w <- Gen.choose(1, 12)
        h <- Gen.choose(1, 12)
        seed <- Gen.choose(0, 1000)
      } yield (w, h, seed)
      check(forAll(gen) { case (w, h, seed) =>
        def px(x: Int, y: Int) = (seed + y * 13 + x * 5) % 256
        val png = ImageCodec.encodeGrayPng(w, h)(px)
        val img = ImageCodec.decode(png).get
        val st = ImageCodec.stats(img)
        val all = for { y <- 0 until h; x <- 0 until w } yield px(x, y)
        st.width == w && st.height == h &&
          st.pxMin == all.min && st.pxMax == all.max && st.pxSum == all.map(_.toLong).sum
      }, minTests = 30)
    }

    it("decoders never throw on arbitrary garbage bytes (totality)") {
      val bytesGen = Gen.listOf(Gen.choose[Byte](Byte.MinValue, Byte.MaxValue)).map(_.toArray)
      check(forAll(bytesGen) { bytes =>
        AudioCodec.decode(bytes).forall(_.nSamples >= 0) &&
          VideoCodec.decodeFrames(bytes, 1, 4).forall(_.nFrames >= 0) &&
          (ImageCodec.decode(bytes) match { case _ => true })
      }, minTests = 50)
    }
  }

  describe("TrieTokenize greedy segmentation (production tokenizer path)") {
    it("equals a sorted-scan reference and reassembles exactly, on arbitrary vocab/text") {
      import graft.catalyst.TrieTokenize
      import org.apache.spark.unsafe.types.UTF8String
      // tight alphabet so vocab pieces actually collide with the text
      val pieceGen = Gen.choose(1, 3)
        .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
      val gen = for {
        vocab <- Gen.nonEmptyListOf(pieceGen).map(_.distinct)
        text <- Gen.listOf(Gen.oneOf(Gen.oneOf('a', 'b', 'c', 'd'), Gen.const(' ')))
          .map(_.mkString)
      } yield (vocab, text)
      check(forAll(gen) { case (vocab, text) =>
        val trie = TrieTokenize.build(vocab)
        val got = TrieTokenize.compute(UTF8String.fromString(text), trie, 100)
          .array.map(_.asInstanceOf[UTF8String].toString).toSeq
        val sorted = vocab.sortBy(p => (-p.length, p))
        val expected = text.split(" ", -1).toSeq.flatMap { w =>
          val out = scala.collection.mutable.Buffer[String]()
          var pos = 0
          while (pos < w.length) {
            val piece = sorted.find(p => w.startsWith(p, pos))
              .getOrElse(w.substring(pos, pos + 1))
            out += piece
            pos += piece.length
          }
          out.toSeq
        }
        got == expected && got.mkString == text.replace(" ", "")
      }, minTests = 200)
    }
  }

  describe("editDistOnePairs (symmetric-delete candidate completeness)") {
    it("equals brute-force levenshtein on arbitrary small vocabularies") {
      import graft.operators.Dedup
      // tight alphabet + short lengths maximize both true distance-1
      // pairs and the distance-2 shared-deletion-key traps the verify
      // step must reject
      val wordGen = Gen.choose(0, 4)
        .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
      check(Prop.forAllNoShrink(Gen.listOfN(12, wordGen)) { words =>
        import spark.implicits._
        val vocab = words.distinct
        val got = Dedup.editDistOnePairs(vocab.toDF("s"), col("s"))
          .select("tok_a", "tok_b").as[(String, String)].collect().toSet
        val expected = (for {
          a <- vocab; b <- vocab if a < b && TestOracles.levenshtein(a, b) == 1
        } yield (a, b)).toSet
        got == expected
      }, minTests = 12)
    }
  }

  describe("Layout.upsertPartitioned ≡ Layout.upsert (on-disk vs DataFrame merge)") {
    it("partition-scoped merges end at the plain-upsert table for arbitrary keyed frames") {
      import spark.implicits._
      import graft.operators.Layout
      val kvGen = Gen.nonEmptyMap(
        Gen.zip(Gen.choose(0L, 60L), Gen.alphaNumStr.map(_.take(8))))
      check(Prop.forAllNoShrink(kvGen, kvGen) { (base, upd) =>
        val dir = java.nio.file.Files.createTempDirectory("graft_prop_upsert")
        try {
          val snap = dir.resolve("snap").toString
          val bucket = pmod(col("k"), lit(7L))
          val baseDf = base.toSeq.toDF("k", "v")
          val updDf = upd.toSeq.toDF("k", "v")
          Layout.writeBucketed(baseDf, snap, bucket)
          Layout.upsertPartitioned(spark, snap, updDf, Seq("k"), bucket)
          val got = spark.read.parquet(snap).drop("__bucket")
            .as[(Long, String)].collect().toMap
          val want = Layout.upsert(baseDf, updDf, Seq("k"))
            .as[(Long, String)].collect().toMap
          got == want && got == (base ++ upd)
        } finally graft.Staging.deleteRecursively(dir)
      }, minTests = 8)
    }
  }

  describe("Hocon parser totality (config loader hardening, ADVICE r10)") {
    import graft.pipeline.Hocon

    // arbitrary text — unicode, braces, quotes, $, CRLF, comments — must
    // parse or yield a readable Left; never throw, never hang
    val junkGen: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf('{', '}', ':', '=', ',', '"', '\\', '$', '?', '#', '/',
        '\n', '\r', '\t', ' ', '.', '-', '_', 'é', '台', ' '))).map(_.mkString)

    it("never throws on arbitrary garbage, and errors carry a message") {
      check(forAll(junkGen) { text =>
        Hocon.parse(text) match {
          case Right(_) => true
          case Left(msg) => msg.nonEmpty
        }
      }, minTests = 200)
    }

    // AST round-trip: random nested configs rendered with mixed
    // separators (: vs =), mixed line endings (LF vs CRLF), interleaved
    // comments, trailing commas, quoted unicode keys
    val strGen: Gen[Hocon.Value] =
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
        Gen.oneOf(' ', '.', '-', '/', 'é', '台', ':')))
        .map(cs => Hocon.Str(cs.mkString))
    val numGen: Gen[Hocon.Value] =
      Gen.oneOf(Gen.choose(Long.MinValue, Long.MaxValue).map(n => Hocon.Num(BigDecimal(n))),
        Gen.zip(Gen.choose(-9999L, 9999L), Gen.choose(0, 99))
          .map { case (a, b) => Hocon.Num(BigDecimal(s"$a.$b")) })
    val keyGen: Gen[String] = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar,
        Gen.oneOf('_', '-', 'é', '台'))).map(_.mkString),
      Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar,
        Gen.oneOf(' ', '{', ':', ',', '台'))).map("\"" + _.mkString + "\""))
    def objGen(depth: Int): Gen[Hocon.Obj] =
      Gen.choose(0, 4).flatMap { n =>
        Gen.listOfN(n, Gen.zip(keyGen,
          if (depth <= 0) Gen.oneOf(strGen, numGen, Gen.oneOf(Hocon.Bool(true), Hocon.Bool(false)))
          else Gen.oneOf(strGen, numGen, Gen.oneOf(Hocon.Bool(true), Hocon.Bool(false)),
            objGen(depth - 1))))
          .map(fs => Hocon.Obj(fs.map { case (k, v) =>
            (if (k.startsWith("\"")) k.substring(1, k.length - 1) else k) -> v }))
      }
    def renderKey(k: String): String =
      if (k.forall(c => c.isLetterOrDigit || c == '_' || c == '-') && k.nonEmpty) k
      else "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def render(o: Hocon.Obj, depth: Int): String = {
      val nl = if (depth % 2 == 0) "\n" else "\r\n"
      o.fields.zipWithIndex.map { case ((k, v), i) =>
        val sep = if ((k.length + i) % 2 == 0) ": " else " = "
        val comment = if (i % 3 == 2) s"  # c$i$nl" else nl
        val field = v match {
          case obj: Hocon.Obj =>
            renderKey(k) + (if (i % 2 == 0) " " else sep) +
              "{" + nl + render(obj, depth + 1) + nl + "}"
          case Hocon.Str(s) =>
            renderKey(k) + sep + "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
          case Hocon.Num(n)  => renderKey(k) + sep + n.toString
          case Hocon.Bool(b) => renderKey(k) + sep + b.toString
        }
        field + (if (i % 2 == 1) "," else "") + comment
      }.mkString
    }

    it("round-trips arbitrary nested configs through mixed-style rendering") {
      check(Prop.forAllNoShrink(objGen(3)) { ast =>
        Hocon.parse(render(ast, 0)) == Right(ast)
      }, minTests = 200)
    }

    it("round-trips survive arbitrary truncation without throwing") {
      check(Prop.forAllNoShrink(objGen(2), Gen.choose(0, 1000)) { (ast, cut) =>
        val text = render(ast, 0)
        Hocon.parse(text.take(math.min(cut, text.length))).isInstanceOf[Either[_, _]]
      }, minTests = 100)
    }

    it("env substitution: optional-unset is empty, required-unset is a readable Left") {
      val unset = "GRAFT_SURELY_UNSET_VAR_993"
      assert(Hocon.parse(s"""k = "pre${"$"}{?$unset}post"""") ==
        Right(Hocon.Obj(List("k" -> Hocon.Str("prepost")))))
      Hocon.parse(s"""k = "${"$"}{$unset}"""") match {
        case Left(msg) => assert(msg.contains(unset))
        case Right(v)  => fail(s"required unset env var must not parse: $v")
      }
      // a set var substitutes; substitution is single-pass (a value that
      // itself looks like ${...} is NOT re-resolved — no cycles possible)
      val (name, value) = sys.env.head
      if (name.matches("[A-Za-z0-9_]+")) {
        assert(Hocon.parse(s"""k = "${"$"}{$name}"""") ==
          Right(Hocon.Obj(List("k" -> Hocon.Str(value)))))
      }
      assert(Hocon.parse("k = \"a${?}b\"") ==
        Right(Hocon.Obj(List("k" -> Hocon.Str("a${?}b"))))) // empty name: literal
    }
  }
}
