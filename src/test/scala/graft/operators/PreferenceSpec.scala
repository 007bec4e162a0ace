package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  // texts built so 3-shingle overlap is controlled exactly:
  // base shares its full 4-shingle run; "noise…" shares nothing
  private val base = "alpha beta gamma delta epsilon zeta"
  private val pairs = Seq(
    (10L, "s1", base, "noise one two three four"),       // clean pair
    (20L, "s1", "unrelated text with no overlap here", base), // rejected ≈ 10's chosen
    (30L, "s2", "one two three four five six", "one two three four seven eight"))
    .toDF("pair_id", "source", "chosen_text", "rejected_text")

  describe("Preference.crossRoleLeakage") {
    it("finds rejected≈chosen across pairs and excludes the same-pair diagonal") {
      val got = Preference.crossRoleLeakage(pairs, col("pair_id"),
          col("chosen_text"), col("rejected_text"), w = 3, minShared = 3)
        .as[(Long, Long, Long)].collect().toSet
      // pair 20's rejected is byte-equal to pair 10's chosen: 4 shared
      // shingles; pair 30's own chosen/rejected share 2 shingles but the
      // diagonal is excluded anyway, and 2 < minShared across pairs
      assert(got == Set((10L, 20L, 4L)))
    }

    it("the chosen-side maxDf stop-shingle cap bounds the candidate volume") {
      // base's shingles sit in BOTH chosen responses (df = 2): at
      // maxDf = 1 they are boilerplate and the leak disappears; the
      // unbounded audit still reports it
      val p = Seq(
        (1L, "x", base, "noise one two three four"),
        (2L, "x", base, "different filler words entirely here"),
        (3L, "x", "unrelated text with no overlap here", base))
        .toDF("pair_id", "source", "chosen_text", "rejected_text")
      def run(maxDf: Int) = Preference.crossRoleLeakage(p, col("pair_id"),
          col("chosen_text"), col("rejected_text"), w = 3, minShared = 3,
          maxDf = maxDf)
        .as[(Long, Long, Long)].collect().toSet
      assert(run(Int.MaxValue) == Set((1L, 3L, 4L), (2L, 3L, 4L)))
      assert(run(1) == Set.empty)
    }
  }

  describe("Preference.pairContamination") {
    it("rolls leg-level eval hits up to the pair frame") {
      val eval = Seq((900L, base), (901L, "one two three four nine ten"))
        .toDF("doc_id", "text")
      val got = Preference.pairContamination(pairs, col("pair_id"),
          col("chosen_text"), col("rejected_text"),
          eval, col("doc_id"), col("text"), w = 3, minShared = 2)
        .as[(Long, Long, Long, Long)].collect().toSet
      // pair 10: chosen leg ≡ eval 900 (4 shingles) AND its rejected leg
      // shares 2 shingles with eval 901 → 2 eval docs, 2 legs; pair 20:
      // rejected leg ≡ eval 900; pair 30: BOTH legs share 2 with 901
      assert(got == Set((10L, 2L, 2L, 4L), (20L, 1L, 1L, 4L), (30L, 1L, 2L, 2L)))
    }

    it("casts pair ids to long before leg encoding and excludes null/negative ids") {
      // an int pair id >= 2^30 would overflow a 32-bit *2 encoding and
      // mis-decode; negative/null ids are excluded by contract
      val big = Int.MaxValue - 1 // even, so decode(big*2L)/2 must round-trip
      val p = Seq(
        (java.lang.Integer.valueOf(big), base, "noise one two three four"),
        (java.lang.Integer.valueOf(-5), base, base),
        (null.asInstanceOf[java.lang.Integer], base, base))
        .toDF("pair_id", "chosen_text", "rejected_text")
      val eval = Seq((900L, base)).toDF("doc_id", "text")
      val got = Preference.pairContamination(p, col("pair_id"),
          col("chosen_text"), col("rejected_text"),
          eval, col("doc_id"), col("text"), w = 3, minShared = 2)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set((big.toLong, 1L, 1L, 4L)))
    }
  }

  describe("Preference plan shapes") {
    it("no operator ever plans a cartesian; the skew global is ONE bounded broadcast") {
      def plan(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.toString
      def count(p: String, n: String) = p.sliding(n.length).count(_ == n)
      val eval = Seq((900L, base)).toDF("doc_id", "text")
      val leak = plan(Preference.crossRoleLeakage(pairs, col("pair_id"),
        col("chosen_text"), col("rejected_text")))
      val cont = plan(Preference.pairContamination(pairs, col("pair_id"),
        col("chosen_text"), col("rejected_text"), eval, col("doc_id"), col("text")))
      val skew = plan(Preference.lengthSkewAudit(pairs, col("source"),
        length(col("chosen_text")), length(col("rejected_text"))))
      Seq(leak, cont, skew).foreach { p =>
        assert(count(p, "CartesianProduct") == 0, p)
      }
      // the only nested-loop anywhere is the 1-row global broadcast
      assert(count(skew, "BroadcastNestedLoopJoin") == 1, skew)
      assert(count(leak, "BroadcastNestedLoopJoin") == 0, leak)
      assert(count(cont, "BroadcastNestedLoopJoin") == 0, cont)
    }
  }

  describe("Preference.annotatorAgreement") {
    def kappa(rows: Seq[(String, String, String)]) =
      Preference.annotatorAgreement(rows.toDF("src", "a", "b"),
          col("src"), col("a"), col("b"))
        .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

    it("matches a hand-computed kappa, exact rational") {
      // n=10, agree=7; marginals r1: yes 6 / no 4, r2: yes 7 / no 3
      // pe_cross = 6*7 + 4*3 = 54; num = 10*7 - 54 = 16; den = 100 - 54 = 46
      // (kappa = 8/23 exactly)
      val rows = Seq.fill(5)(("g", "yes", "yes")) ++ Seq.fill(2)(("g", "no", "no")) ++
        Seq(("g", "yes", "no"), ("g", "no", "yes"), ("g", "no", "yes"))
      assert(kappa(rows) == Seq(("g", 10L, 7L, 54L, 16L, 46L)))
    }

    it("systematic disagreement yields a NEGATIVE kappa") {
      // raters always flip: n=4, agree=0; marginals r1 yes 2/no 2,
      // r2 yes 2/no 2 -> pe = 8; num = -8, den = 8 (kappa = -1)
      val rows = Seq(("g", "yes", "no"), ("g", "no", "yes"),
        ("g", "yes", "no"), ("g", "no", "yes"))
      assert(kappa(rows) == Seq(("g", 4L, 0L, 8L, -8L, 8L)))
    }

    it("constant same-label raters release the 0/0 indeterminate verbatim") {
      val rows = Seq(("g", "yes", "yes"), ("g", "yes", "yes"))
      // pe_cross = n^2 -> num = n*a - n^2 = 0, den = 0
      assert(kappa(rows) == Seq(("g", 2L, 2L, 4L, 0L, 0L)))
    }

    it("raters sharing NO label get pe_cross 0, not a dropped group") {
      val rows = Seq(("g", "x", "y"), ("g", "x", "y"))
      assert(kappa(rows) == Seq(("g", 2L, 0L, 0L, 0L, 4L)))
    }

    it("a group past the int64 overflow cap fails loudly, not with wrapped rationals") {
      val rows = Seq(("g", "yes", "yes"), ("g", "no", "no"), ("g", "yes", "no"))
      val ex = intercept[Exception] {
        Preference.annotatorAgreementCapped(rows.toDF("src", "a", "b"),
          col("src"), col("a"), col("b"), maxPairs = 2L).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains("exceeds 2 rated pairs")), ex.toString)
    }

    it("excludes rows with a null label on either side") {
      val p = Seq(
        ("g", "yes", "yes"),
        ("g", null.asInstanceOf[String], "yes"),
        ("g", "yes", null.asInstanceOf[String]))
        .toDF("src", "a", "b")
      val got = Preference.annotatorAgreement(p, col("src"), col("a"), col("b"))
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      assert(got == Seq(("g", 1L, 1L, 1L, 0L, 0L)))
    }
  }

  describe("Preference.fleissKappa") {
    // rows are (group, item, label); ALL goldens hand-computed from the
    // row lists below — per-item n_ik, S = Σ n_ik², pooled marginals
    // m_k, Σ m_k², then num = (S−T)·T − (r−1)Σm², den = (r−1)(T²−Σm²)
    def fk(rows: Seq[(String, Long, String)]) =
      Preference.fleissKappa(rows.toDF("g", "i", "l"),
          col("g"), col("i"), col("l"))
        .as[(String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq

    it("matches a hand-computed 3-rater kappa, exact rational") {
      // item 1: a,a,b (n=2,1); item 2: b,b,b (n=3)
      // r=3, N=2, T=6, S = 4+1+9 = 14
      // marginals: m_a=2, m_b=4 -> Σm² = 20
      // num = (14−6)·6 − 2·20 = 8; den = 2·(36−20) = 32 (κ = 1/4;
      // cross-check: P̄ = 8/12 = 2/3, P̄e = 20/36 = 5/9 -> (1/9)/(4/9))
      val rows = Seq(("g", 1L, "a"), ("g", 1L, "a"), ("g", 1L, "b"),
        ("g", 2L, "b"), ("g", 2L, "b"), ("g", 2L, "b"))
      assert(fk(rows) == Seq(("g", 2L, 3L, 6L, 14L, 20L, 8L, 32L)))
    }

    it("complete 3-way disagreement hits the r=3 floor kappa = -1/2") {
      // both items rated a,b,c: S = 6, T = 6, m = (2,2,2) -> Σm² = 12
      // num = 0 − 2·12 = −24; den = 2·(36−12) = 48 (κ = −1/2)
      val rows = Seq(("g", 1L, "a"), ("g", 1L, "b"), ("g", 1L, "c"),
        ("g", 2L, "a"), ("g", 2L, "b"), ("g", 2L, "c"))
      assert(fk(rows) == Seq(("g", 2L, 3L, 6L, 6L, 12L, -24L, 48L)))
    }

    it("every rating one label releases the 0/0 indeterminate verbatim") {
      // S = 9+9 = 18, T = 6, Σm² = 36
      // num = (18−6)·6 − 2·36 = 0; den = 2·(36−36) = 0
      val rows = (1L to 2L).flatMap(i => Seq.fill(3)(("g", i, "x")))
      assert(fk(rows) == Seq(("g", 2L, 3L, 6L, 18L, 36L, 0L, 0L)))
    }

    it("r = 1 releases 0/0 (chance agreement undefined), not a crash") {
      // S = 2, T = 2, m = (1,1) -> Σm² = 2; num = 0·2 − 0·2 = 0; den = 0
      val rows = Seq(("g", 1L, "a"), ("g", 2L, "b"))
      assert(fk(rows) == Seq(("g", 2L, 1L, 2L, 2L, 2L, 0L, 0L)))
    }

    it("null GROUPS are excluded explicitly, never silently half-joined away") {
      // the null-group ratings vanish by CONTRACT (unattributable pool,
      // documented) — g keeps its golden untouched; without the filter
      // the inner marginal join would drop the null pool's row silently
      val rows = Seq(("g", 1L, "a"), ("g", 1L, "a"), ("g", 1L, "b"),
        ("g", 2L, "b"), ("g", 2L, "b"), ("g", 2L, "b"),
        (null.asInstanceOf[String], 1L, "a"),
        (null.asInstanceOf[String], 2L, "b"))
      assert(fk(rows) == Seq(("g", 2L, 3L, 6L, 14L, 20L, 8L, 32L)))
    }

    it("null labels are excluded BEFORE the equal-count check") {
      // item 2 carries one null rating on top of 3 real ones — the
      // null is unratable, so the group still has a constant r = 3
      // and matches the first golden exactly
      val rows = Seq(("g", 1L, "a"), ("g", 1L, "a"), ("g", 1L, "b"),
        ("g", 2L, "b"), ("g", 2L, "b"), ("g", 2L, "b"),
        ("g", 2L, null.asInstanceOf[String]))
      assert(fk(rows) == Seq(("g", 2L, 3L, 6L, 14L, 20L, 8L, 32L)))
    }

    it("unequal per-item rating counts fail loudly — Fleiss needs a constant r") {
      val rows = Seq(("g", 1L, "a"), ("g", 1L, "b"), ("g", 1L, "a"),
        ("g", 2L, "b"), ("g", 2L, "b"))
      val ex = intercept[Exception] { fk(rows) }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains("unequal per-item rating counts")), ex.toString)
    }

    it("a group past the injectable overflow cap fails loudly") {
      val rows = (1L to 3L).flatMap(i =>
        Seq(("g", i, "a"), ("g", i, "b")))
      val ex = intercept[Exception] {
        Preference.fleissKappaCapped(rows.toDF("g", "i", "l"),
          col("g"), col("i"), col("l"), maxRatings = 5L).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains("exceeds 5 ratings")), ex.toString)
    }

    it("independent groups do not bleed into each other's marginals") {
      // g1 = the 1/4-kappa golden; g2 = all-same-label 0/0 — pooled
      // marginals are PER GROUP, so g1's numbers must not move
      val rows = Seq(("g1", 1L, "a"), ("g1", 1L, "a"), ("g1", 1L, "b"),
        ("g1", 2L, "b"), ("g1", 2L, "b"), ("g1", 2L, "b")) ++
        (1L to 2L).flatMap(i => Seq.fill(3)(("g2", i, "x")))
      assert(fk(rows) == Seq(
        ("g1", 2L, 3L, 6L, 14L, 20L, 8L, 32L),
        ("g2", 2L, 3L, 6L, 18L, 36L, 0L, 0L)))
    }
  }

  describe("Preference.lengthSkewAudit") {
    it("computes per-source longer-chosen ppm vs the global rate, exact") {
      val p = Seq(
        ("a", 10L, 5L), ("a", 10L, 20L), ("a", 10L, 3L), // 2/3 longer
        ("b", 1L, 2L))                                    // 0/1 longer
        .toDF("source", "chosen_len", "rejected_len")
      val got = Preference.lengthSkewAudit(p, col("source"),
          col("chosen_len"), col("rejected_len"))
        .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      // global: 2/4 = 500000 ppm
      assert(got == Seq(
        ("a", 3L, 666666L, 500000L, 166666L),
        ("b", 1L, 0L, 500000L, -500000L)))
    }

    it("excludes pairs with a null length on either side from n_pairs and the global") {
      // counting a null-length pair while null-compare makes it never
      // "longer" would silently deflate longer_ppm
      val p = Seq(
        ("a", java.lang.Long.valueOf(10L), java.lang.Long.valueOf(5L)),
        ("a", null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)),
        ("a", java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long]))
        .toDF("source", "chosen_len", "rejected_len")
      val got = Preference.lengthSkewAudit(p, col("source"),
          col("chosen_len"), col("rejected_len"))
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(got == Seq(("a", 1L, 1000000L, 1000000L, 0L)))
    }
  }

  describe("Preference.krippendorffAlpha") {
    // rows are (group, item, label); ALL goldens hand-computed from the
    // row lists — per-unit m_u and Σn_uc², the (den, Σnum) fold into
    // (P, N), pairable marginals n_c, then
    // alpha = [P·(n²−Σn_c²) − (n−1)·N] / [P·(n²−Σn_c²)]
    def ka(rows: Seq[(String, Long, String)]) =
      Preference.krippendorffAlpha(rows.toDF("g", "i", "l"),
          col("g"), col("i"), col("l"))
        .as[(String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq

    it("matches a hand-computed ragged-pool alpha, exact rational") {
      // unit 1: a,a,b (m=3, Σn²=5, num=9−5=4, den=2)
      // unit 2: a,b   (m=2, Σn²=2, num=2, den=1)
      // unit 3: b,b   (m=2, Σn²=4, num=0, den=1)
      // unit 4: a     (m=1 — unpairable, DROPPED)
      // dens sorted: (1, 2+0=2), (2, 4) → fold: (p,nn)=(1,0) →
      //   d=1: (1, 0·1+2·1=2) → d=2: (2, 2·2+4·1=8) ⇒ D_o = 8/2 = 4
      //   (check: 4/2 + 2/1 + 0/1 = 4 ✓)
      // pairable marginals: n_a=3, n_b=4, n=7, Σn_c²=25, se=49−25=24
      // alpha_num = 2·24 − 6·8 = 0; alpha_den = 48 (α = 0 exactly)
      val rows = Seq(("g", 1L, "a"), ("g", 1L, "a"), ("g", 1L, "b"),
        ("g", 2L, "a"), ("g", 2L, "b"),
        ("g", 3L, "b"), ("g", 3L, "b"),
        ("g", 4L, "a"))
      assert(ka(rows) == Seq(("g", 3L, 7L, 2L, 8L, 2L, 0L, 48L)))
    }

    it("perfect within-unit agreement releases alpha = 1") {
      // unit 1: a,a; unit 2: b,b → every num=0 ⇒ N=0, P=1
      // marginals n_a=n_b=2, n=4, se=16−8=8 → (8, 8)
      val rows = Seq(("g", 1L, "a"), ("g", 1L, "a"),
        ("g", 2L, "b"), ("g", 2L, "b"))
      assert(ka(rows) == Seq(("g", 2L, 4L, 2L, 0L, 1L, 8L, 8L)))
    }

    it("systematic disagreement yields a NEGATIVE alpha") {
      // unit 1: a,b; unit 2: a,b → num=2 each, dens [(1,4)] ⇒ (P,N)=(1,4)
      // marginals 2,2 → se=8 → alpha_num = 8 − 3·4 = −4 (α = −1/2)
      val rows = Seq(("g", 1L, "a"), ("g", 1L, "b"),
        ("g", 2L, "a"), ("g", 2L, "b"))
      assert(ka(rows) == Seq(("g", 2L, 4L, 2L, 4L, 1L, -4L, 8L)))
    }

    it("every rating one label releases the 0/0 indeterminate verbatim") {
      val rows = Seq(("g", 1L, "x"), ("g", 1L, "x"),
        ("g", 2L, "x"), ("g", 2L, "x"))
      assert(ka(rows) == Seq(("g", 2L, 4L, 1L, 0L, 1L, 0L, 0L)))
    }

    it("single-rating units drop and null labels shrink m, never corrupt") {
      // unit 1: a alone (dropped); unit 2: a,null,b → null excluded,
      // m=2 pairable (num=2, den=1); marginals n_a=1, n_b=1, se=4−2=2
      // → alpha_num = 2 − 1·2 = 0, den = 2
      val raw = Seq(("g", 1L, Some("a")),
        ("g", 2L, Some("a")), ("g", 2L, None), ("g", 2L, Some("b")))
      val got = Preference.krippendorffAlpha(raw.toDF("g", "i", "l"),
          col("g"), col("i"), col("l"))
        .as[(String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq
      assert(got == Seq(("g", 1L, 2L, 2L, 2L, 1L, 0L, 2L)))
    }

    it("a group with NO pairable unit has no row — nothing is estimable") {
      val rows = Seq(("g", 1L, "a"), ("g", 2L, "b"), ("h", 1L, "a"),
        ("h", 1L, "b"))
      assert(ka(rows).map(_._1) == Seq("h"))
    }

    it("independent groups do not bleed into each other's marginals") {
      val rows = Seq(("g", 1L, "a"), ("g", 1L, "a"),
        ("h", 1L, "a"), ("h", 1L, "b"))
      // h's lone a,b unit: D_o = 2, se = 2, alpha_num = 2 − 1·2 = 0
      // (a single mixed unit is exactly chance-level, α = 0 — had the
      // pools bled, g's two a's would inflate h's marginals)
      assert(ka(rows) == Seq(("g", 1L, 2L, 1L, 0L, 1L, 0L, 0L),
        ("h", 1L, 2L, 2L, 2L, 1L, 0L, 2L)))
    }

    it("a group past the injectable overflow cap fails loudly") {
      val rows = Seq(("g", 1L, "a"), ("g", 1L, "a"),
        ("g", 2L, "a"), ("g", 2L, "b"))
      val e = intercept[Exception] {
        Preference.krippendorffAlphaCapped(rows.toDF("g", "i", "l"),
          col("g"), col("i"), col("l"), maxRatings = 3L).collect()
      }
      assert(e.getMessage.contains("exceeds 3 ratings"))
    }

    it("agrees with the definitional coincidence-matrix alpha on a ragged pool") {
      // independent cross-check: compute α in plain Scala from the
      // textbook definition (o_ck pair weights 1/(m_u−1)) over a
      // deterministic ragged pool, compare to the released rational
      val rows = for {
        u <- 1L to 40L
        j <- 1 to 4 if (u + j) % (j + 1) != 0
      } yield ("g", u, s"l${(u * (2 * j + 1) + j) % 3}")
      val byUnit = rows.groupBy(_._2).view.mapValues(_.map(_._3))
        .toMap.filter(_._2.size >= 2)
      val n = byUnit.values.map(_.size).sum.toDouble
      val doNum = byUnit.values.map { ls =>
        val m = ls.size.toDouble
        val sq = ls.groupBy(identity).values.map(g => g.size.toDouble * g.size).sum
        (m * m - sq) / (m - 1.0)
      }.sum
      val margSq = byUnit.values.flatten.groupBy(identity).values
        .map(g => g.size.toDouble * g.size).sum
      val expected = 1.0 - (n - 1.0) * doNum / (n * n - margSq)
      val Seq((_, _, _, _, _, _, num, den)) = ka(rows)
      assert(math.abs(num.toDouble / den - expected) < 1e-12)
    }
  }
}
