package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 event-analytics + retrieval operators: funnel, cohort
  * retention, transition matrix, CDC latest-state, integer BM25, and the
  * exact prefix-filtered similarity self-join (losslessness checked
  * against the brute-force all-pairs join). */
class EventAnalyticsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  private def eventsDf(rows: Seq[(Long, Long, String, String)]) = {
    val s = spark; import s.implicits._
    rows.map { case (id, uid, tp, t) => (id, uid, tp, ts(t), 1.0 * id) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
  }

  // ---- funnel ---------------------------------------------------------

  test("funnelReport counts ordered in-window completions per stage") {
    // u1 completes all 3; u2's click PRECEDES its view (order violation);
    // u3's click lands outside the 7-day window; u4 never views;
    // u5 completes with the purchase just inside the window
    val ev = eventsDf(Seq(
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (2L, 1L, "click", "2024-01-01 01:00:00"),
      (3L, 1L, "purchase", "2024-01-01 02:00:00"),
      (4L, 2L, "click", "2024-01-01 00:00:00"),
      (5L, 2L, "view", "2024-01-01 01:00:00"),
      (6L, 2L, "purchase", "2024-01-01 02:00:00"),
      (7L, 3L, "view", "2024-01-01 00:00:00"),
      (8L, 3L, "click", "2024-01-09 00:00:00"),
      (9L, 4L, "click", "2024-01-01 00:00:00"),
      (10L, 4L, "purchase", "2024-01-01 01:00:00"),
      (11L, 5L, "view", "2024-01-01 00:00:00"),
      (12L, 5L, "click", "2024-01-01 00:01:00"),
      (13L, 5L, "purchase", "2024-01-07 23:00:00")))
    val out = Events.funnelReport(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 4L, 2L -> 2L, 3L -> 2L))
  }

  test("funnelReport purchase must follow the click, not just the view") {
    // purchase sits between view and click → step 3 not reached
    val ev = eventsDf(Seq(
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (2L, 1L, "purchase", "2024-01-01 01:00:00"),
      (3L, 1L, "click", "2024-01-01 02:00:00")))
    val out = Events.funnelReport(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("funnelReport maxEventsPerUser excludes a hot bot key, keeps real users") {
    // u1: a normal 3-step completion (3 step events). u9: a bot hammering
    // 500 step events, all of which WOULD convert — with the cap set below
    // 500 the key must be excluded outright (not truncated into a
    // conversion), so every stage counts u1 only.
    val normal = Seq(
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (2L, 1L, "click", "2024-01-01 01:00:00"),
      (3L, 1L, "purchase", "2024-01-01 02:00:00"))
    val bot = (0 until 500).map { i =>
      val tp = Seq("view", "click", "purchase")(i % 3)
      (100L + i, 9L, tp, f"2024-01-01 03:${i / 60}%02d:${i % 60}%02d")
    }
    val ev = eventsDf(normal ++ bot)
    val capped = Events.funnelReport(ev, Seq("view", "click", "purchase"),
        maxEventsPerUser = Some(100L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(capped == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // without the cap the bot converts — proving the cap did the exclusion
    val uncapped = Events.funnelReport(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uncapped == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  // ---- cohort retention -----------------------------------------------

  test("cohortRetention buckets users by first-event week") {
    // weeks: W1 = 2024-01-01 (Mon), W2 = 2024-01-08, W3 = 2024-01-15
    val ev = eventsDf(Seq(
      (1L, 1L, "view", "2024-01-02 10:00:00"), // u1 cohort W1
      (2L, 1L, "view", "2024-01-16 10:00:00"), // u1 active W3 (offset 2)
      (3L, 2L, "view", "2024-01-03 10:00:00"), // u2 cohort W1 only
      (4L, 3L, "view", "2024-01-08 00:00:00"), // u3 cohort W2
      (5L, 3L, "view", "2024-01-15 10:00:00"))) // u3 active W3 (offset 1)
    val out = Events.cohortRetention(ev)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01 00:00:00.0", 0L) -> 2L, ("2024-01-01 00:00:00.0", 2L) -> 1L,
      ("2024-01-08 00:00:00.0", 0L) -> 1L, ("2024-01-08 00:00:00.0", 1L) -> 1L))
  }

  // ---- transition matrix ----------------------------------------------

  test("transitionMatrix counts consecutive pairs, ties broken by event_id") {
    // u1: view → click → view; u2: two events at the SAME ts — order must
    // come from event_id (click id=4 before error id=5)
    val ev = eventsDf(Seq(
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (2L, 1L, "click", "2024-01-01 00:01:00"),
      (3L, 1L, "view", "2024-01-01 00:02:00"),
      (4L, 2L, "click", "2024-01-01 00:00:00"),
      (5L, 2L, "error", "2024-01-01 00:00:00")))
    val out = Events.transitionMatrix(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("view", "click") -> 1L, ("click", "view") -> 1L,
      ("click", "error") -> 1L))
  }

  // ---- CDC latest state -----------------------------------------------

  test("latestState keeps the max-(ts, event_id) row per key") {
    val ev = eventsDf(Seq(
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (2L, 1L, "click", "2024-01-02 00:00:00"), // latest ts for u1
      (3L, 2L, "view", "2024-01-01 00:00:00"),
      (4L, 2L, "error", "2024-01-01 00:00:00"))) // same ts: id 4 > id 3
    val out = Events.latestState(ev)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out == Map(1L -> ("click", 2.0), 2L -> ("error", 4.0)))
  }

  // ---- moving window --------------------------------------------------

  test("movingDailyStats trailing row-window sums per type") {
    val ev = eventsDf(Seq(
      (1L, 1L, "view", "2024-01-01 05:00:00"), // day 1: value 1.0
      (2L, 1L, "view", "2024-01-01 06:00:00"), // day 1: value 2.0 → 3.0
      (3L, 1L, "view", "2024-01-02 05:00:00"), // day 2: value 3.0
      (4L, 1L, "view", "2024-01-05 05:00:00"), // day 5 (gap): value 4.0
      (5L, 1L, "click", "2024-01-01 05:00:00"))) // other partition
    val out = Events.movingDailyStats(ev, windowDays = 2)
      .filter(col("event_type") === "view")
      .orderBy("day")
      .collect().map(r => (r.getDouble(3), r.getDouble(4), r.getLong(5)))
    // rows-window: day 5 sums with day 2 (last OBSERVED day), gap or not
    assert(out.toSeq == Seq((3.0, 3.0, 2L), (3.0, 6.0, 3L), (4.0, 7.0, 2L)))
  }

  // ---- HLL registers --------------------------------------------------

  test("hllRegisters matches the hand-derived md5 register and rank") {
    val s = spark; import s.implicits._
    def expected(key: String): (Long, Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val b = h / 64
      (h % 64, if (b == 0) 0L else java.lang.Long.numberOfTrailingZeros(b) + 1L)
    }
    val out = Sketches.hllRegisters(
        Seq((1L, "a"), (2L, "a"), (1L, "a"), (7L, "b")).toDF("user_id", "g"),
        "user_id", Seq("g"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (r1, rho1) = expected("1")
    val (r2, rho2) = expected("2")
    val (r7, rho7) = expected("7")
    // duplicates of key 1 are absorbed by max; groups stay separate
    val want = Seq(("a", r1) -> rho1, ("a", r2) -> rho2, ("b", r7) -> rho7)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(out == want)
  }

  // ---- integer PageRank -----------------------------------------------

  test("pageRank: exact milli-scores on a hand-computed star graph") {
    val s = spark; import s.implicits._
    // undirected star a(1)–b(2), a–c(3): a emits halves, b/c emit whole
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val out1 = Graph.pageRank(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out1 == Map(1L -> 1850L, 2L -> 575L, 3L -> 575L))
    val out2 = Graph.pageRank(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter2: in(a) = 575+575 → 150 + 8500·1150 div 10⁴ = 1127;
    //        in(b) = in(c) = 1850 div 2 → 150 + 8500·925 div 10⁴ = 936
    assert(out2 == Map(1L -> 1127L, 2L -> 936L, 3L -> 936L))
  }

  // ---- integer BM25 ---------------------------------------------------

  /** The operator's exact integer formula, recomputed independently. */
  private def bm25m(tf: Long, df: Long, dl: Long, n: Long, t: Long): Long =
    (1000L * (2 * n - 2 * df + 1) * 22 * tf * t) /
      ((2 * df + 1) * (10 * tf * t + 3 * t + 9 * dl * n))

  test("bm25TopK matches the hand formula and ranks rare terms higher") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple durian fig grape"),
      (3L, "banana banana banana"),
      (4L, "fig grape kiwi lemon")).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(docs, "text", "doc_id",
        terms = Seq("apple", "banana"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // N = 4 docs, T = 15 tokens; df(apple) = 2, df(banana) = 2
    val expected = Map(
      1L -> 2 * bm25m(1, 2, 3, 4, 15), // apple + banana, both tf=1, dl=3
      2L -> bm25m(2, 2, 5, 4, 15),
      3L -> bm25m(3, 2, 3, 4, 15))
    assert(out == expected)
    // doc 4 matches no term → absent
    assert(!out.contains(4L))
  }

  // ---- histogram-path exact percentiles -------------------------------

  test("exactPercentiles is bit-identical to Spark percentile() incl. ties and 1-row groups") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    // heavy ties (values drawn from a small decimal grid) + a 1-row group
    val rows = (1 to 400).map { i =>
      val g = "g" + (i % 5)
      (g, math.floor(rnd.nextDouble() * 40) / 4.0)
    } :+ (("solo", 3.25))
    val df = rows.toDF("grp", "value")
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)) {
      val expected = df.groupBy("grp")
        .agg(expr(s"percentile(value, $p)").as("e"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = Events.exactPercentiles(df, Seq("grp"), "value", Seq(p))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expected, s"p=$p") // == on doubles: BIT-identical
    }
    // multiple percentiles in one pass agree with singles
    val multi = Events.exactPercentiles(df, Seq("grp"), "value", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val p50 = Events.exactPercentiles(df, Seq("grp"), "value", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(multi.view.mapValues(_._1).toMap == p50)
  }

  // ---- exact prefix-filtered similarity join --------------------------

  test("prefixJaccardJoin finds exactly the above-threshold pairs") {
    val s = spark; import s.implicits._
    // d1/d2 trigram sets: {abc,bcd,cde,def} vs {abc,bcd,cde,deg}:
    // inter 3, union 5 → 6000 bp; d3 shares nothing
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e g"),
      (3L, "x y z w v u")).toDF("doc_id", "text")
    val out = Dedup.prefixJaccardJoin(docs, "text", "doc_id",
        shingleN = 3, thetaBp = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 6000L)))
  }

  test("prefixJaccardJoin is lossless vs the brute-force all-pairs join") {
    val s = spark; import s.implicits._
    // deterministic corpus with planted near-dups: docs i and i+100 share
    // most tokens; unrelated docs share a small vocabulary (so the corpus
    // has plenty of common shingles to stress the prefix ordering)
    val vocab = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp".split(" ")
    def doc(seed: Long): String =
      (0 until 12).map(j => vocab(((seed * 31 + j * 7) % 16).toInt)).mkString(" ")
    val base = (0L until 20L).map(i => (i, doc(i)))
    val dups = (0L until 6L).map(i => (i + 100L, doc(i) + " zz"))
    val docs = (base ++ dups).toDF("doc_id", "text")
    val got = Dedup.prefixJaccardJoin(docs, "text", "doc_id",
        shingleN = 3, thetaBp = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: every pair, exact Jaccard, same threshold
    val ids = (base ++ dups).map(_._1)
    val allPairs = (for { a <- ids; b <- ids if a < b } yield (a, b))
      .toDF("id_a", "id_b")
    val brute = Dedup.ngramJaccard(allPairs, docs, "text", "doc_id", 3)
      .filter(col("jaccard_bp") >= 5000)
      .select("id_a", "id_b", "jaccard_bp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(got.nonEmpty, "planted near-dups must appear")
    // both candidate paths must be lossless regardless of the shape
    // default: force the positional filter ON and OFF against the same
    // brute-force expectation
    for (pf <- Seq(true, false)) {
      val forced = Dedup.prefixJaccardJoin(docs, "text", "doc_id",
          shingleN = 3, thetaBp = 5000L, posFilter = Some(pf))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(forced == brute, s"posFilter=$pf diverged from brute force")
    }
  }

  test("prefixJaccardJoin blockCols: identical twins in different blocks never pair") {
    val s = spark; import s.implicits._
    // d1/d2 identical text, same block; d3 identical text, OTHER block;
    // d4 near-dup of d1 in the same block
    val docs = Seq(
      (1L, "a b c d e f", "en", "web"),
      (2L, "a b c d e f", "en", "web"),
      (3L, "a b c d e f", "fr", "web"),
      (4L, "a b c d e g", "en", "web")).toDF("doc_id", "text", "lang", "source")
    val got = Dedup.prefixJaccardJoin(docs, "text", "doc_id",
        shingleN = 1, thetaBp = 5000L, blockCols = Seq("lang", "source"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // block-scoped: (1,2) exact dup, (1,4)/(2,4) J=5/7≈7142bp; NOTHING with 3
    assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    // and block-scoped result == global result filtered to same-block pairs
    val global = Dedup.prefixJaccardJoin(docs, "text", "doc_id",
        shingleN = 1, thetaBp = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sameBlock = Set((1L, 2L), (1L, 4L), (2L, 4L))
    assert(global.filter(sameBlock) == got)
  }

  test("minhashCandidates blockCols: cross-block twins share no bucket") {
    val s = spark; import s.implicits._
    val text = (1 to 40).map("t" + _).mkString(" ")
    val docs = Seq(
      (1L, text, "en"), (2L, text, "en"), (3L, text, "fr"))
      .toDF("doc_id", "text", "lang")
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id",
        blockCols = Seq("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
