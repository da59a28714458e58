package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round 14: persisted dedup indexes + incremental batch queries — the
  * daily-pipeline pattern. Each family is differentially tested against
  * the corresponding corpus-level operator restricted to cross
  * (batch, corpus) evidence, plus append-only index maintenance. */
class DedupIndexSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def tmp(tag: String): String = TempDirs.register(
    s"${System.getProperty("java.io.tmpdir")}/graft_idxspec_${tag}_${java.util.UUID.randomUUID()}")

  // ---- exact ----------------------------------------------------------

  test("exact index: batch membership finds exactly the planted re-fetches, " +
      "normalization included; append admits later batches") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox"),
      (2L, "jumps over the lazy dog"),
      (3L, "entirely different text")).toDF("doc_id", "text")
    val path = tmp("exact")
    DedupIndex.writeExactIndex(corpus, "text", "doc_id", path)
    // 101 re-fetches 1 with different whitespace/case (same normalized
    // key); 102 is novel; 103 re-fetches 2 verbatim
    val batch = Seq(
      (101L, "  The   QUICK brown fox "),
      (102L, "novel content never seen"),
      (103L, "jumps over the lazy dog")).toDF("doc_id", "text")
    val got = DedupIndex.exactDuplicatesAgainstIndex(batch, "text", "doc_id", path)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == Set((101L, 1L), (103L, 2L)))
    // append batch 102's key; a later identical fetch is now a dup
    DedupIndex.appendToIndex(Seq((102L, "novel content never seen"))
      .toDF("doc_id", "text"), "text", "doc_id", path, kind = "exact")
    val later = Seq((201L, "novel content NEVER seen")).toDF("doc_id", "text")
    val got2 = DedupIndex.exactDuplicatesAgainstIndex(later, "text", "doc_id", path)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got2 == Set((201L, 102L)))
  }

  // ---- minhash bands ---------------------------------------------------

  test("minhash index: against-index candidates equal the self-join " +
      "candidates of the union restricted to cross pairs") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    def doc(seed: Int, n: Int): String =
      (0 until n).map(j => s"w${seed}x${(j * 7 + seed) % 23}").mkString(" ")
    // corpus: 12 docs; batch: 4 docs, two of which are light edits of
    // corpus docs (near-dups), two novel
    val corpusRows = (1L to 12L).map(i => (i, doc(i.toInt, 30)))
    val nearA = corpusRows(2)._2.split(" ").updated(0, "EDIT").mkString(" ")
    val nearB = corpusRows(7)._2.split(" ").updated(29, "TAIL").mkString(" ")
    val batchRows = Seq((101L, nearA), (102L, nearB),
      (103L, doc(900 + rnd.nextInt(50), 30)), (104L, doc(700, 25)))
    val corpus = corpusRows.toDF("doc_id", "text")
    val batch = batchRows.toDF("doc_id", "text")
    val path = tmp("minhash")
    DedupIndex.writeMinHashIndex(corpus, "text", "doc_id", path,
      k = 64, bands = 16)
    val got = DedupIndex.minhashCandidatesAgainstIndex(batch, "text",
        "doc_id", path, k = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the corpus-level self-join over the union, cross pairs
    // only, re-oriented (batch, corpus)
    val union = corpus.union(batch)
    val self = Dedup.minhashCandidates(union, "text", "doc_id",
        k = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a > 100L) != (b > 100L) }
      .map { case (a, b) => if (a > 100L) (a, b) else (b, a) }.toSet
    assert(got == self)
    assert(got.contains((101L, 3L)) && got.contains((102L, 8L)))
  }

  // ---- winnowed anchors -------------------------------------------------

  test("anchor index: batch spans against the index equal the self-mode " +
      "spans of the union when all duplicate evidence is cross-split") {
    val s = spark; import s.implicits._
    val (k, w) = (3, 4)
    val run = (0 until 14).map(j => s"shared$j").mkString(" ") // >= k+w-1
    val corpus = Seq(
      (1L, s"c-one c-two $run c-tail"),
      (2L, "c only unique alpha beta gamma delta"),
      (3L, "c another unique eps zeta eta theta iota")).toDF("doc_id", "text")
    val batch = Seq(
      (101L, s"b-pre $run b-post b-more"),
      (102L, "b novel text with no shared runs at all here")).toDF("doc_id", "text")
    val path = tmp("anchor")
    DedupIndex.writeAnchorIndex(corpus, "text", "doc_id", path, k = k, w = w)
    val got = DedupIndex.duplicateSpansAgainstIndex(batch, "text", "doc_id",
        path, k = k, w = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only the planted doc, one merged island inside the shared run
    assert(got.map(_._1).toSeq == Seq(101L))
    val text101 = s"b-pre $run b-post b-more"
    val base = text101.indexOf("shared0")
    assert(got.head._2 >= base + 1 && got.head._3 <= base + run.length)
    // differential: self-mode over the union, restricted to batch docs
    // (no within-batch or within-corpus duplicate runs in this fixture,
    // so every batch span's evidence is cross-split)
    val self = TextOps.duplicateSpansAnchoredChars(corpus.union(batch),
        "text", "doc_id", k = k, w = w)
      .filter(col("doc_id") > 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == self.toSet)
    // the spans feed cutSpans unchanged: the cut removes the shared run
    val spansDf = DedupIndex.duplicateSpansAgainstIndex(batch, "text",
      "doc_id", path, k = k, w = w)
    val cut = TextOps.cutSpans(batch, "text", "doc_id", spansDf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!cut(101L).contains("shared5"))
    assert(cut(102L) == "b novel text with no shared runs at all here")
  }

  test("anchor index: a batch with no corpus overlap yields zero spans, " +
      "and within-batch duplication alone never fires (against-index is " +
      "strictly cross evidence)") {
    val s = spark; import s.implicits._
    val corpus = Seq((1L, "c unique alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val path = tmp("anchor2")
    DedupIndex.writeAnchorIndex(corpus, "text", "doc_id", path, k = 3, w = 4)
    val run = (0 until 12).map(j => s"dup$j").mkString(" ")
    // 201/202 duplicate EACH OTHER but share nothing with the corpus
    val batch = Seq((201L, s"x $run"), (202L, s"y $run"))
      .toDF("doc_id", "text")
    assert(DedupIndex.duplicateSpansAgainstIndex(batch, "text", "doc_id",
      path, k = 3, w = 4).count() == 0L)
  }
}
