package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 batch 2: integer z-score anomalies, banded-Levenshtein
  * near-dup (losslessness at the band boundary), Simpson char diversity,
  * positional phrase search, value histograms, and the salted two-phase
  * aggregation's algebraic equality with the plain group-by. */
class CurationOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  // ---- duplicateSpans (ExactSubstr detection, round 12) ----------------

  test("duplicateSpans: cross-doc shared run is found, merged, and positioned exactly") {
    val s = spark
    import s.implicits._
    // doc 1 and 2 share a 12-char run at different offsets; doc 3 is
    // unique noise. L=8: hit positions inside the run merge into ONE
    // span covering exactly the shared characters.
    val shared = "ABCDEFGHIJKL" // 12 chars
    val d = Seq(
      (1L, "xxxx" + shared + "yyyyyy"),     // run at 5..16
      (2L, "qrstuvwxyz" + shared + "zz"),   // run at 11..22
      (3L, "0123456789abcdefghij")).toDF("doc_id", "text")
    val r = TextOps.duplicateSpans(d, "text", "doc_id", minLen = 8)
      .orderBy("doc_id").collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2)))
    // 12-char run with L=8: gram starts run-start..run-start+4, span end
    // = last start + 7 = run end — the exact shared range
    assert(r.toSeq == Seq((1L, 5L, 16L), (2L, 11L, 22L)))
  }

  test("duplicateSpans: self-repeat within one doc, contiguous islands merge") {
    val s = spark
    import s.implicits._
    // "PATTERN--PATTERN": the 7-gram "PATTERN" occurs twice in the SAME
    // doc — both occurrences are duplicated spans; the gap (--) keeps
    // them separate islands
    val d = Seq((7L, "PATTERNXY" * 2 + "tail padding to pass")).toDF("doc_id", "text")
    val r = TextOps.duplicateSpans(d, "text", "doc_id", minLen = 9)
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    // "PATTERNXY" repeats at 1 and 10 -> grams 1..10 all duplicated
    // (stride-1 over the doubled region), one merged island 1..18
    assert(r.toSeq == Seq((1L, 18L)))
    // and a doc with no duplication yields nothing
    val none = TextOps.duplicateSpans(
      Seq((8L, "entirely unique text with no repeats at all"))
        .toDF("doc_id", "text"), "text", "doc_id", minLen = 9)
    assert(none.count() == 0)
  }

  test("cutSpans removes exactly the spans; full-cover -> empty; untouched pass through") {
    val s = spark
    import s.implicits._
    val shared = "ABCDEFGHIJKL"
    val d = Seq(
      (1L, "xxxx" + shared + "yyyyyy"),
      (2L, "qrstuvwxyz" + shared + "zz"),
      (3L, "0123456789abcdefghij"),
      (4L, shared), (5L, shared)).toDF("doc_id", "text") // 4/5: full cover
    val spans = TextOps.duplicateSpans(d, "text", "doc_id", minLen = 8)
    val r = TextOps.cutSpans(d, "text", "doc_id", spans)
      .orderBy("doc_id").collect().map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq(
      (1L, "xxxxyyyyyy"),           // span 5..16 cut
      (2L, "qrstuvwxyzzz"),         // span 11..22 cut
      (3L, "0123456789abcdefghij"), // untouched
      (4L, ""), (5L, "")))          // fully duplicated -> empty
  }

  test("cutSpans stitches around a MID-doc span and multiple spans correctly") {
    val s = spark
    import s.implicits._
    // two separated shared runs inside one doc -> two spans, three kept
    // segments (head, middle, tail)
    val a = "AAAABBBB" // 8
    val b = "CCCCDDDD"
    val d = Seq(
      (1L, "head" + a + "-mid-" + b + "tail"),
      (2L, "<<" + a + "__" + b + ">>")).toDF("doc_id", "text")
    val spans = TextOps.duplicateSpans(d, "text", "doc_id", minLen = 8)
    val r = TextOps.cutSpans(d, "text", "doc_id", spans)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(r.toSeq == Seq("head-mid-tail", "<<__>>"))
  }

  test("duplicateSpansAnchored: the k+w-1 winnowing guarantee holds on random plants") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val (k, w) = (3, 4)
    val guarantee = k + w - 1 // 6 tokens
    // noise tokens are globally unique (uN prefix per doc), so any gram
    // touching them occurs once — anchors can only match inside the
    // planted run, making spans' positions exactly assertable
    val caseGen = for {
      runLen <- Gen.choose(guarantee, guarantee + 6)
      run <- Gen.listOfN(runLen, Gen.oneOf("alpha", "beta", "gamma", "delta",
        "eps", "zeta", "eta", "theta"))
      preA <- Gen.choose(0, 8); preB <- Gen.choose(0, 8)
      sufA <- Gen.choose(k, 8); sufB <- Gen.choose(k, 8)
    } yield (run, preA, sufA, preB, sufB)
    val cases = (1 to 25).flatMap { i =>
      caseGen(Gen.Parameters.default, Seed(44000L + i))
    }
    assert(cases.size >= 20)
    cases.foreach { case (run, preA, sufA, preB, sufB) =>
      def doc(tag: String, pre: Int, suf: Int) =
        ((0 until pre).map(j => s"u$tag$j") ++ run ++
          (0 until suf).map(j => s"v$tag$j")).mkString(" ")
      val d = Seq((1L, doc("a", preA, sufA)), (2L, doc("b", preB, sufB)))
        .toDF("doc_id", "text")
      val spans = TextOps.duplicateSpansAnchored(d, "text", "doc_id", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // guarantee: BOTH docs report a span...
      assert(Set(1L, 2L).subsetOf(spans.map(_._1).toSet),
        s"run=${run.mkString(" ")} preA=$preA: spans=${spans.toSeq}")
      // ...and every span sits inside the planted run's gram range
      spans.foreach { case (id, st, en) =>
        val pre = if (id == 1L) preA else preB
        assert(st >= pre && en <= pre + run.size - 1,
          s"span ($id,$st,$en) outside plant at $pre..${pre + run.size - 1}")
      }
    }
  }

  test("duplicateSpansAnchored: unique docs are empty; a long run merges to one span") {
    val s = spark
    import s.implicits._
    val unique = Seq(
      (1L, (0 until 30).map(j => s"a$j").mkString(" ")),
      (2L, (0 until 30).map(j => s"b$j").mkString(" "))).toDF("doc_id", "text")
    assert(TextOps.duplicateSpansAnchored(unique, "text", "doc_id", 3, 4).count() == 0)
    // one 40-token shared run: anchors ≤ w apart merge into ONE island
    val run = (0 until 40).map(j => s"s${j % 7}").mkString(" ")
    val d = Seq((1L, "x0 x1 " + run), (2L, run + " y0 y1")).toDF("doc_id", "text")
    val spans = TextOps.duplicateSpansAnchored(d, "text", "doc_id", 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.count(_._1 == 1L) == 1 && spans.count(_._1 == 2L) == 1,
      s"expected one merged span per doc: ${spans.toSeq}")
  }

  test("duplicateSpansAnchoredChars: char spans are exactly the token spans " +
      "mapped through a reference offset scanner (random whitespace/case)") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val (k, w) = (3, 4)
    // reference tokenizer: maximal non-ws runs with 1-based char ranges
    def offsets(text: String): Vector[(Int, Int)] = {
      val out = Vector.newBuilder[(Int, Int)]
      var i = 0
      while (i < text.length) {
        if (!text.charAt(i).isWhitespace) {
          val st = i
          while (i < text.length && !text.charAt(i).isWhitespace) i += 1
          out += ((st + 1, i)) // 1-based inclusive
        } else i += 1
      }
      out.result()
    }
    val wsGen = Gen.oneOf(" ", "  ", "   ", "\t", " \t ")
    val caseGen = for {
      runLen <- Gen.choose(k + w - 1, k + w + 5)
      run <- Gen.listOfN(runLen, Gen.oneOf("Alpha", "BETA", "gamma", "Delta",
        "eps", "ZeTa", "eta", "theta"))
      pre <- Gen.choose(0, 5); suf <- Gen.choose(k, 6)
      // leading ws is SPACES only: tokens() trims spaces (not tabs), so a
      // leading tab gives duplicateSpansAnchored a spurious empty token 0
      // and shifts ITS indices — the char variant's sentinel tokenization
      // has no such artifact (verified by the slice test below), but the
      // differential mapping here needs both sides to agree on indices
      lead <- Gen.oneOf(" ", "  ", "   ")
      // trailing ws (SPACES only, same index-alignment constraint as
      // lead): split(-1) emits a trailing empty token for these docs —
      // the regression ADVICE r13 flagged; the oracle filters it out
      trail <- Gen.oneOf("", " ", "  ")
      seps <- Gen.listOfN(runLen + pre + suf + 2, wsGen)
    } yield (run, pre, suf, lead, trail, seps)
    (1 to 12).foreach { i =>
      val (run, pre, suf, lead, trail, seps) =
        caseGen(Gen.Parameters.default, Seed(77000L + i)).get
      def doc(tag: String) = {
        val toks = (0 until pre).map(j => s"u$tag$j") ++ run ++
          (0 until suf).map(j => s"v$tag$j")
        lead + toks.zip(seps).map { case (t, sp) => t + sp }.mkString.trim + trail
      }
      val d = Seq((1L, doc("a")), (2L, doc("b"))).toDF("doc_id", "text")
      val tokSpans = TextOps.duplicateSpansAnchored(d, "text", "doc_id", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val texts = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = tokSpans.map { case (id, ts, te) =>
        val off = offsets(texts(id))
        (id, off(ts.toInt)._1.toLong, off(te.toInt)._2.toLong)
      }.toSet
      val got = TextOps.duplicateSpansAnchoredChars(d, "text", "doc_id", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"case $i: got=$got expected=$expected")
      assert(got.nonEmpty) // the >= k+w-1 plant guarantees detection
    }
  }

  test("anchored detect -> cutSpans: the 100 TB ExactSubstr pipeline cuts " +
      "exactly the detected char ranges and passes unique docs through") {
    val s = spark
    import s.implicits._
    val run = "alpha beta gamma delta eps zeta theta kappa" // 8 tokens >= k+w-1
    val d = Seq(
      (1L, s"uA0 uA1 $run vA0 vA1 vA2"),
      (2L, s"$run vB0 vB1 vB2"),
      (3L, "only unique tokens here w0 w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val spans = TextOps.duplicateSpansAnchoredChars(d, "text", "doc_id", 3, 4)
    val cut = TextOps.cutSpans(d, "text", "doc_id", spans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val texts = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = spans.collect().groupBy(_.getLong(0))
    // every detected span sits inside the planted run, in BOTH docs
    assert(byDoc.keySet == Set(1L, 2L))
    byDoc.foreach { case (id, ss) =>
      val base = texts(id).indexOf("alpha") // 0-based
      ss.foreach { r =>
        assert(r.getLong(1) >= base + 1 && r.getLong(2) <= base + run.length)
      }
    }
    // the cut output is the original minus exactly the span char ranges
    def splice(text: String, ss: Seq[(Long, Long)]): String = {
      val keep = new StringBuilder
      var next = 1
      ss.sortBy(_._1).foreach { case (st, en) =>
        keep ++= text.substring(next - 1, st.toInt - 1); next = en.toInt + 1
      }
      keep ++= text.substring(next - 1)
      keep.toString
    }
    (1L to 2L).foreach { id =>
      val ss = byDoc(id).map(r => (r.getLong(1), r.getLong(2))).toSeq
      assert(cut(id) == splice(texts(id), ss), s"doc $id")
    }
    assert(cut(3L) == texts(3L)) // untouched pass-through
  }

  // ---- anomalyReport --------------------------------------------------

  test("anomalyReport flags strictly-beyond-k-sigma values only") {
    val s = spark; import s.implicits._
    // type A: {0 ×20, 100} — the 100 sits at ~4.5σ even though it drags σ
    // itself (n·x−S = 2e6, 9·(n·SS−S²) = 1.8e12 < 4e12); type B uniform
    val rows =
      (1L to 20L).map(i => (i, ts("2024-01-01 00:00:00"), i, "A", 0.0, "{}")) ++
        Seq((21L, ts("2024-01-01 00:00:00"), 21L, "A", 100.0, "{}")) ++
        (22L to 26L).map(i => (i, ts("2024-01-01 00:00:00"), i, "B", 5.0, "{}"))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.anomalyReport(ev, k = 3).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(21L))
    assert(out.head.getLong(2) == 100000L) // milli-units
  }

  test("anomalyReport boundary is strict: exactly k-sigma is NOT an outlier") {
    val s = spark; import s.implicits._
    // {0, 0, 6, 6}: mean 3, sigma 3 -> at k=1 every value sits EXACTLY at
    // 1 sigma; the > comparison must flag none. (n*x-s)^2 = k^2(n*ss-s^2)
    // holds with pure integers, so this is deterministic, not epsilon-luck.
    val ev = Seq((1L, 0.0), (2L, 0.0), (3L, 6.0), (4L, 6.0))
      .map { case (i, v) => (i, ts("2024-01-01 00:00:00"), i, "A", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(Events.anomalyReport(ev, k = 1).count() == 0L)
  }

  test("anomalyReport equals a BigInt reference on random data incl. negatives") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(20260813)
    // adversarial magnitudes: body ±1e3, spikes to ±5e3 (v_m to ±5e6 —
    // past the operator's documented v_m<1e6 sizing, safe here because
    // n≈430/type keeps decimal(38) intermediates ≤ ~1e21) — the
    // decimal-width arithmetic must agree with unbounded BigInt per row
    val rows = (1L to 3000L).map { i =>
      val tp = s"T${i % 7}"
      // heavy tail: ~2% of rows spike 5x (a uniform body alone never
      // exceeds 2sigma — max |v| < 2*stddev of U(-a, a))
      val base = (rnd.nextDouble() - 0.5) * 2000.0
      val v = if (rnd.nextInt(50) == 0) base * 5 else base
      (i, ts("2024-01-01 00:00:00"), i, tp, v, "{}")
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.anomalyReport(ev, k = 2)
      .collect().map(_.getLong(0)).sorted
    // reference: same integer test in BigInt
    val vm = rows.map { case (id, _, _, tp, v, _) => (id, tp, math.floor(v * 1000).toLong) }
    val moments = vm.groupBy(_._2).map { case (tp, rs) =>
      tp -> (BigInt(rs.size), rs.map(r => BigInt(r._3)).sum,
        rs.map(r => BigInt(r._3) * BigInt(r._3)).sum)
    }
    val expected = vm.filter { case (_, tp, x) =>
      val (n, sS, ss) = moments(tp)
      val d = n * x - sS
      d * d > BigInt(4) * (n * ss - sS * sS)
    }.map(_._1).sorted
    assert(got.toSeq == expected)
    assert(expected.nonEmpty, "vacuous: no outliers drawn")
  }

  test("charDiversity equals a naive local computation on random unicode-ish text") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(99)
    val alphabet = "abγδ∂ 日x"
    val docs = (1L to 50L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val expected = docs.map { case (id, text) =>
      val counts = text.groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum; val sum2 = counts.map(c => c * c).sum
      (id, n, 10000L * (n * n - sum2) / (n * n))
    }.sorted
    val got = TextOps.charDiversity(docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == expected)
  }

  // ---- editDistanceNearDup --------------------------------------------

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
  }

  test("editDistanceNearDup catches pairs straddling a length-band boundary") {
    // bandWidth=8: len 7 (band 0) vs len 9 (band 1) — only the
    // adjacent-band probe can pair them; distance 2 (two inserts)
    val docs = docsDf(Seq((1L, "abcdefg"), (2L, "abcdefgxy")))
    val out = Dedup.editDistanceNearDup(docs, "text", "doc_id",
      Seq("lang", "source"), maxDist = 8, bandWidth = 8).collect()
    assert(out.length == 1)
    assert((out.head.getLong(0), out.head.getLong(1), out.head.getInt(2)) ==
      ((1L, 2L, 2)))
  }

  test("editDistanceNearDup excludes pairs beyond maxDist and across blocks") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "aaaaaaaa", "en", "src0"),
      (2L, "bbbbbbbb", "en", "src0"),   // dist 8 > maxDist 4
      (3L, "aaaaaaab", "en", "src1"))   // dist 1 but different block
      .toDF("doc_id", "text", "lang", "source")
    assert(Dedup.editDistanceNearDup(docs, "text", "doc_id",
      Seq("lang", "source"), maxDist = 4, bandWidth = 8).count() == 0L)
  }

  test("editDistanceNearDup emits each pair once despite dual-orientation probes") {
    // same band both ways: the (a,b)/(b,a) matches must collapse to one row
    val docs = docsDf(Seq((1L, "abcdefgh"), (2L, "abcdefgx"), (3L, "abcdefgy")))
    val out = Dedup.editDistanceNearDup(docs, "text", "doc_id",
      Seq("lang", "source"), maxDist = 8, bandWidth = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("editDistanceNearDup refuses a band narrower than maxDist") {
    val docs = docsDf(Seq((1L, "abc")))
    intercept[IllegalArgumentException] {
      Dedup.editDistanceNearDup(docs, "text", "doc_id", Seq("lang"),
        maxDist = 16, bandWidth = 8)
    }
  }

  test("canonicalKeep picks the best-quality member per component, ties to smallest id") {
    val s = spark; import s.implicits._
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("id", "component")
    val quality = Seq((1L, 50L), (2L, 80L), (3L, 80L), (9L, 10L))
      .toDF("doc_id", "n_chars")
    val out = Dedup.canonicalKeep(comp, quality, "doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
    // component 1: ids 2 and 3 tie at quality 80 -> keep 2 (smallest id)
    assert(out.toSeq == Seq((1L, 3L, 2L, 80L), (9L, 1L, 9L, 10L)))
  }

  // ---- charDiversity --------------------------------------------------

  test("charDiversity: repeated char scores 0, known mix is exact") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "aaaa"), (2L, "ab"), (3L, "aab"))
      .toDF("doc_id", "text")
    val out = TextOps.charDiversity(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // "aaaa": (16-16)/16 = 0; "ab": 10000*(4-2)/4 = 5000;
    // "aab": 10000*(9-5)/9 = 4444 (floor)
    assert(out.toSeq == Seq((1L, 4L, 0L), (2L, 2L, 5000L), (3L, 3L, 4444L)))
  }

  // ---- phraseMatches --------------------------------------------------

  test("phraseMatches counts overlapping and repeated-token matches") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a a a b"),     // "a a" starts at 0 and 1 -> 2 matches
      (2L, "x y a a"),     // 1 match
      (3L, "a b a"))       // 0 matches (never consecutive)
      .toDF("doc_id", "text")
    val out = TextOps.phraseMatches(docs, "text", "doc_id", Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("phraseMatches handles 3-token phrases positionally") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the quick fox jumps"),
      (2L, "quick the fox"),          // right tokens, wrong order
      (3L, "the quick quick fox"))    // gap breaks the phrase
      .toDF("doc_id", "text")
    val out = TextOps.phraseMatches(docs, "text", "doc_id",
      Seq("the", "quick", "fox")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L)))
  }

  // ---- valueHistogram + salted agg ------------------------------------

  test("valueHistogram buckets milli-units with exact sums; negatives floor to -1") {
    val s = spark; import s.implicits._
    val ev = Seq((1L, "A", 10.0), (2L, "A", 30.0), (3L, "A", 49.999),
        (4L, "B", 0.0), (5L, "B", -0.5))
      .map { case (i, tp, v) => (i, ts("2024-01-01 00:00:00"), i, tp, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.valueHistogram(ev, widthM = 25000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
    // -0.5 -> v_m = -500 -> FLOOR bucket -1 (truncation would merge it
    // into bucket 0, diverging from the oracle's // semantics)
    assert(out.toSeq == Seq(
      ("A", 0L, 1L, 10000L), ("A", 1L, 2L, 79999L),
      ("B", -1L, 1L, -500L), ("B", 0L, 1L, 0L)))
  }

  // ---- perceptual hash ------------------------------------------------

  test("decodePHash matches the hash derived straight from the pixel formula") {
    // differential: decode(pngEncode(id)) -> aHash must equal the aHash
    // computed from the generator formula without any PNG in between
    for (id <- Seq(0L, 1L, 7L, 123L)) {
      val w = Multimodal.widthOf(id); val h = Multimodal.heightOf(id)
      val bsum = new Array[Long](64); val bn = new Array[Long](64)
      for (y <- 0 until h; x <- 0 until w) {
        val s = (0 until 3).map(ch => ((id + 7L * y + 13L * (4 * x + ch)) % 251L)).sum
        val i = (8 * y / h) * 8 + 8 * x / w
        bsum(i) += s; bn(i) += 1
      }
      val tsum = bsum.sum; val tn = w.toLong * h
      var hi = 0L; var lo = 0L
      for (i <- 0 until 64 if bsum(i) * tn > tsum * bn(i))
        if (i >= 32) hi |= 1L << (i - 32) else lo |= 1L << i
      val got = Multimodal.decodePHash(id, Multimodal.pngEncode(id, w, h)).get
      assert((got.width, got.height, got.ahash_hi, got.ahash_lo) == ((w, h, hi, lo)))
    }
  }

  test("decodePHash returns None on corrupt or non-PNG payloads") {
    assert(Multimodal.decodePHash(1L, Array[Byte](1, 2, 3)).isEmpty)
    val png = Multimodal.pngEncode(1L, 16, 16)
    png(20) = (png(20) ^ 0x55).toByte // corrupt IHDR data -> CRC mismatch
    assert(Multimodal.decodePHash(1L, png).isEmpty)
  }

  test("ivfPqTopK with full probing degenerates to plain PQ ADC") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(31337)
    val emb = (0L until 60L)
      .map(i => (i, Array.fill(8)(rnd.nextDouble().toFloat)))
      .toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 3)
    val cents = emb.filter(col("vec_id") % 11 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cb = Similarity.pqCodebook(emb, m = 2, seedMod = 13)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3))
    // probing EVERY list must reproduce the unrestricted PQ ranking
    val full = rows(Similarity.ivfPqTopK(emb, queries, cents, cb,
      m = 2, dim = 8, k = 4, nProbe = 100))
    val plain = rows(Similarity.pqTopKWith(emb, queries, cb, m = 2, dim = 8, k = 4))
    assert(full.toSeq == plain.toSeq)
    // restricted probing returns a SUBSET of vectors, never new ones
    val probed = rows(Similarity.ivfPqTopK(emb, queries, cents, cb,
      m = 2, dim = 8, k = 4, nProbe = 1))
    val probedPerQ = probed.groupBy(_._1)
    assert(probed.nonEmpty && probedPerQ.values.forall(_.length <= 4))
  }

  // ---- profiling --------------------------------------------------------

  test("profile reports exact nulls and cardinality per column") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, None, Some(1.0)),
      (3L, Some("a"), None),
      (4L, Some("b"), Some(2.0)))
      .toDF("id", "tag", "v")
    val out = Profiling.profile(df, Seq("id", "tag", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      ("id", 4L, 0L, 4L), ("tag", 4L, 1L, 2L), ("v", 4L, 1L, 2L)))
  }

  test("profile approx variant keeps the same shape (counts close, not hashed)") {
    val s = spark; import s.implicits._
    val df = (1L to 100L).map(i => (i, i % 10)).toDF("id", "m")
    val out = Profiling.profile(df, Seq("id", "m"), exact = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(100L, 100L))
    assert(out.map(_._3).toSeq == Seq(0L, 0L))
    // HLL estimates: within 10% of truth is all this asserts
    assert(math.abs(out(0)._4 - 100L) <= 10 && math.abs(out(1)._4 - 10L) <= 2)
  }

  // ---- streaming anomaly ------------------------------------------------

  test("anomalyStream flags outliers against pre-event state only") {
    import graft.streaming.StreamingOps
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[StreamingOps.ValueEvent]
    // 12 calm values (5.0) then a spike; minCount=10 means the spike at
    // position 13 is judged against 12 seen events -> flagged. The early
    // values are never flagged (warm-up) even though the spike inflates
    // nothing retroactively.
    val base = (1 to 12).map(i => StreamingOps.ValueEvent(
      i.toLong, "A", ts(f"2024-01-01 00:${i}%02d:00"), 5.0 + (i % 2) * 0.2))
    in.addData(base :+ StreamingOps.ValueEvent(99L, "A", ts("2024-01-01 01:00:00"), 500.0): _*)
    val q = StreamingOps.runToMemory(
      StreamingOps.anomalyStream(in.toDS(), k = 3, minCount = 10L).toDF(), "anoms")
    val out = s.sql("SELECT event_id, n_seen FROM anoms").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    assert(out.toSeq == Seq((99L, 12L)))
  }

  test("anomalyStream carries moments across micro-batches") {
    import graft.streaming.StreamingOps
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[StreamingOps.ValueEvent]
    val stream = StreamingOps.anomalyStream(in.toDS(), k = 3, minCount = 10L).toDF()
    val q = stream.writeStream.format("memory").queryName("anoms2")
      .outputMode("append").start()
    in.addData((1 to 11).map(i => StreamingOps.ValueEvent(
      i.toLong, "A", ts(f"2024-01-01 00:${i}%02d:00"), 5.0)): _*)
    q.processAllAvailable()
    // second micro-batch: the spike must be judged against the 11 events
    // from batch 1 (state carried), so it IS flagged with n_seen = 11
    in.addData(StreamingOps.ValueEvent(99L, "A", ts("2024-01-01 02:00:00"), 500.0))
    q.processAllAvailable()
    val out = s.sql("SELECT event_id, n_seen FROM anoms2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    assert(out.toSeq == Seq((99L, 11L)))
  }

  test("winsorizeReport: exact rank statistics and capped sums on a known set") {
    val s = spark; import s.implicits._
    // 10 values 1..9 + spike 100 (type A): n=10, lower median = rank 5 = 5;
    // capBp 8000 -> cap rank (8000*10+9999) DIV 10000 = 8 -> cap_m = 8
    val ev = ((1L to 9L).map(i => (i, "A", i.toDouble)) :+ (10L, "A", 100.0))
      .map { case (i, tp, v) => (i, ts("2024-01-01 00:00:00"), i, tp, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.winsorizeReport(ev, capBp = 8000).collect().head
    assert(out.getLong(1) == 10L)      // n
    assert(out.getLong(2) == 5000L)    // median (lower) in milli-units
    assert(out.getLong(3) == 8000L)    // cap_m: the p80 order statistic
    // capped sum: 1..8 kept, 9 and 100 capped to 8 -> 36+8+8 = 52 units
    assert(out.getLong(4) == 52000L)
    assert(out.getLong(5) == 2L)       // rows the cap touched
  }

  test("gapFillDaily zero-fills and marks the missing grid cells") {
    val s = spark; import s.implicits._
    // type A has days 1 and 3 (day 2 missing); type B only day 1 — its
    // day-2/day-3 cells must appear zero-filled too (full grid, not
    // per-type spans)
    val ev = Seq(
      (1L, "A", "2024-01-01 10:00:00", 5.0),
      (2L, "A", "2024-01-03 10:00:00", 7.0),
      (3L, "B", "2024-01-01 10:00:00", 1.0))
      .map { case (i, tp, t, v) => (i, ts(t), i, tp, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.gapFillDaily(ev)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
        r.getLong(2), r.getLong(4)))
      .sorted
    assert(out.toSeq == Seq(
      ("A", "2024-01-01", 1L, 0L), ("A", "2024-01-02", 0L, 1L),
      ("A", "2024-01-03", 1L, 0L),
      ("B", "2024-01-01", 1L, 0L), ("B", "2024-01-02", 0L, 1L),
      ("B", "2024-01-03", 0L, 1L)))
  }

  test("cmSketch counters merge with SUM across any data split") {
    val s = spark; import s.implicits._
    def evs(range: Seq[Long]) = range
      .map(i => (i, ts("2024-01-01 00:00:00"), i % 5, "A", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val whole = Sketches.cmSketch(evs(1L to 40L), "user_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val p1 = Sketches.cmSketch(evs(1L to 17L), "user_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val p2 = Sketches.cmSketch(evs(18L to 40L), "user_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val merged = (p1.keySet ++ p2.keySet)
      .map(k => k -> (p1.getOrElse(k, 0L) + p2.getOrElse(k, 0L))).toMap
    assert(merged == whole)
    // every key hits exactly `depth` cells; total mass = depth * rows
    assert(whole.values.sum == 4L * 40L)
  }

  test("editDistanceNearDup equals brute force on random corpora (banding lossless)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(4242)
    def randDoc(): String = {
      val n = 3 + rnd.nextInt(30)
      Seq.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString
    }
    // Java-side reference Levenshtein
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
        if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (round <- 1 to 3) {
      val docs = (1L to 40L).map(i => (i, randDoc(), "en", "src0"))
      val expected = (for {
        (ia, ta, _, _) <- docs; (ib, tb, _, _) <- docs if ia < ib
        d = lev(ta, tb) if d <= 8
      } yield (ia, ib, d)).sorted
      val got = Dedup.editDistanceNearDup(
          docs.toDF("doc_id", "text", "lang", "source"),
          "text", "doc_id", Seq("lang", "source"), maxDist = 8, bandWidth = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
      assert(got.toSeq == expected, s"round $round")
    }
  }

  test("phraseMatches equals naive sliding-window counts on random token streams") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(777)
    val vocab = Array("a", "b", "c")
    val docs = (1L to 30L).map { i =>
      (i, Seq.fill(5 + rnd.nextInt(30))(vocab(rnd.nextInt(3))).mkString(" "))
    }
    val phrase = Seq("a", "b", "a")
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.split(" ")
      val n = toks.sliding(3).count(_.sameElements(phrase))
      if (n > 0) Some((id, n.toLong)) else None
    }.sorted
    val got = TextOps.phraseMatches(docs.toDF("doc_id", "text"), "text", "doc_id", phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == expected)
  }

  test("mergeRollups(base, delta) equals the full recompute") {
    val s = spark; import s.implicits._
    val ev = (1L to 60L).map(i => (i, ts(f"2024-01-${1 + (i % 9).toInt}%02d 05:00:00"),
        i, if (i % 2 == 0) "A" else "B", i * 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getTimestamp(1).toString, r.getLong(2), r.getLong(3))
    val full = Events.dailyRollup(ev).collect().map(key).sorted
    val merged = Events.mergeRollups(
        Events.dailyRollup(ev.filter(col("event_id") % 3 === 0)),
        Events.dailyRollup(ev.filter(col("event_id") % 3 =!= 0)))
      .collect().map(key).sorted
    assert(merged.toSeq == full.toSeq)
  }

  test("intervalJoinStreams pairs events within the bound via symmetric hash join") {
    import graft.streaming.StreamingOps
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = s.sqlContext
    val clicks = MemoryStream[StreamingOps.ValueEvent]
    val buys = MemoryStream[StreamingOps.ValueEvent]
    // purchase 101 at 10:30 matches click 1 (10:00, within 1h) but not
    // click 2 (09:00, outside); purchase 102 is another user entirely;
    // purchase 103 PRECEDES its user's click -> no match
    buys.addData(
      StreamingOps.ValueEvent(101L, "u1", ts("2024-01-01 10:30:00"), 9.99),
      StreamingOps.ValueEvent(102L, "u2", ts("2024-01-01 10:30:00"), 5.0),
      StreamingOps.ValueEvent(103L, "u3", ts("2024-01-01 08:00:00"), 1.0))
    clicks.addData(
      StreamingOps.ValueEvent(1L, "u1", ts("2024-01-01 10:00:00"), 0.0),
      StreamingOps.ValueEvent(2L, "u1", ts("2024-01-01 09:00:00"), 0.0),
      StreamingOps.ValueEvent(3L, "u3", ts("2024-01-01 09:00:00"), 0.0))
    val joined = StreamingOps.intervalJoinStreams(
      buys.toDS().toDF(), clicks.toDS().toDF(),
      key = "event_type", tsCol = "ts", boundSeconds = 3600L)
    val q = StreamingOps.runToMemory(joined, "attrib")
    val out = s.sql("SELECT l_event_id, r_event_id FROM attrib").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    q.stop()
    assert(out.toSeq == Seq((101L, 1L)))
  }

  test("sketch estimate readers: local hash matches the distributed one; estimates sane") {
    val s = spark; import s.implicits._
    // differential: localHash60 == portableHash60 on the same strings
    val strs = Seq("0|42", "3|user-9", "plain", "")
    val dist = strs.toDF("x")
      .select(TextOps.portableHash60(col("x"))).collect().map(_.getLong(0))
    assert(strs.map(Sketches.localHash60) == dist.toSeq)

    def evs(uids: Seq[Long]) = uids.zipWithIndex
      .map { case (u, i) => (i.toLong, ts("2024-01-01 00:00:00"), u, "A", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // CM: key 7 appears 12 times, key 3 twice; estimates are exact here
    // (no collisions at this sparsity) and NEVER underestimates by design
    val cm = Sketches.cmSketch(evs(Seq.fill(12)(7L) ++ Seq(3L, 3L)), "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(Sketches.cmEstimate(cm, "7") == 12L)
    assert(Sketches.cmEstimate(cm, "3") == 2L)
    assert(Sketches.cmEstimate(cm, "999") == 0L)

    // HLL: 40 distinct users; the 64-register estimate lands within 25%
    val regs = Sketches.hllRegisters(evs((1L to 40L) ++ (1L to 40L)), "user_id", Nil)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val est = Sketches.hllEstimate(regs)
    assert(est > 30 && est < 50, s"estimate $est")
  }

  test("saltedCountByKey equals the plain group-by exactly") {
    val s = spark; import s.implicits._
    val df = (1L to 400L).map(i => (i % 7, i)).toDF("k", "x")
    val salted = Skew.saltedCountByKey(df, "k", "k", factor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val plain = df.groupBy("k").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(salted.toSeq == plain.toSeq)
  }
}
