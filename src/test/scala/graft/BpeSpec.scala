package graft

import graft.operators.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** Differential spec: the distributed BPE trainer/encoder against a
  * plain-Scala transcription of the reference algorithm (Sennrich et al.
  * 2015, arXiv:1508.07909 §3.2 — learn_bpe's count/argmax/merge loop),
  * with the same deterministic tie-break (freq desc, left asc, right asc).
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // ---- plain-Scala reference --------------------------------------------

  /** Left-to-right, non-overlapping merge of (a, b) in a symbol list. */
  def refMergeWord(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  def refTrain(words: Map[String, Long], numMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, f) => (w.split("").toList :+ "</w>") -> f }
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          pairs(p) = pairs.getOrElse(p, 0L) + f
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((a, b), n) = pairs.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((k + 1, a, b, n))
        vocab = vocab.toSeq.map { case (syms, f) =>
          refMergeWord(syms, a, b) -> f
        }.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      }
      k += 1
    }
    merges.toSeq
  }

  def refEncode(word: String, merges: Seq[(Int, String, String, Long)]): List[String] =
    merges.sortBy(_._1).foldLeft(word.split("").toList :+ "</w>") {
      case (syms, (_, a, b, _)) => refMergeWord(syms, a, b)
    }

  // ---- fixtures ---------------------------------------------------------

  // the paper's own illustrative vocabulary (§3.2 Figure 1) plus
  // punctuation/regex-metachar words to exercise pattern quoting
  val corpus: Seq[String] = Seq(
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "a+b a+b (x) (x) (x) low.er $5 $5 $5 $5")

  def wordFreqMap(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  test("distributed trainer matches the reference algorithm merge-for-merge") {
    val s = spark
    import s.implicits._
    val docs = corpus.toDF("text")
    val expected = refTrain(wordFreqMap(corpus), numMerges = 18)
    val got = Bpe.train(docs, "text", numMerges = 18).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
    // sanity on content: the paper's example learns "est</w>" early — the
    // most frequent pair chain comes from newest/widest
    assert(expected.take(4).map(m => m._2 + m._3).contains("est</w>"))
  }

  test("early stop: more merges requested than pairs exist is not an error") {
    val s = spark
    import s.implicits._
    val docs = Seq("ab ab").toDF("text")
    // vocab = {ab}: pairs (a,b),(b,</w>) → exactly 2 merges possible, the
    // third round finds a single fused symbol and stops
    val got = Bpe.train(docs, "text", numMerges = 10).collect()
    assert(got.length == 2)
  }

  test("encode matches the reference per word, preserves document order, handles unseen docs") {
    val s = spark
    import s.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val mergeTable = refTrain(wordFreqMap(corpus), numMerges = 12)
    val merges = mergeTable.map { case (r, a, b, n) => Bpe.Merge(r, a, b, n) }
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .select("doc_id", "tokens", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList, r.getLong(2)))
      .sortBy(_._1)
    val expected = corpus.zipWithIndex.map { case (t, i) =>
      val toks = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => refEncode(w, mergeTable)).toList
      (i.toLong, toks, toks.length.toLong)
    }
    assert(got.toSeq == expected)
    // a doc whose words never appeared still encodes (char-level fallback),
    // and an empty doc yields an empty token array, not a dropped row
    val extra = Seq((100L, "zzz qqq"), (101L, "   ")).toDF("doc_id", "text")
    val enc = Bpe.encode(extra, "doc_id", "text", merges)
      .select("doc_id", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(enc.head == (100L, refEncode("zzz", mergeTable).length.toLong * 2))
    assert(enc.last == (101L, 0L))
  }

  test("merge rewrites scan left-to-right over adjacent repeats (a a a -> aa a)") {
    val s = spark
    import s.implicits._
    // freq argmax is (a,a): "aaa" has 2 adjacent (a,a) positions ×3 docs,
    // beating (a,</w>) at 3 — after one merge "aaa" is [aa, a, </w>]
    val docs = Seq("aaa aaa aaa").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 1).collect()
    assert((merges.head.getString(1), merges.head.getString(2)) == ("a", "a"))
    val enc = Bpe.encode(Seq((1L, "aaa")).toDF("doc_id", "text"), "doc_id",
      "text", Seq(Bpe.Merge(1, "a", "a", 0L)))
      .select("tokens").collect().head.getSeq[String](0)
    assert(enc.toList == List("aa", "a", "</w>"))
  }
}
