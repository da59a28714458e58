package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training + application (Sennrich et al.
  * 2015, arXiv:1508.07909 — the algorithm behind GPT-2/RoBERTa vocabs).
  *
  * The reference has no tokenizer surface; this is part of the "operations
  * a large-scale training-data pipeline needs" mandate (q54's pair-count
  * step is the inner statistic; this is the full trainer/encoder).
  *
  * Scale shape — the part that matters at 100 TB:
  *   - the CORPUS is touched exactly once, by [[wordFreq]] (a hash
  *     aggregate to the distinct-word relation, which is Heaps'-law
  *     sublinear in corpus size: ~10⁶ rows for a ~10¹¹-token corpus);
  *   - every merge iteration runs on that vocab-sized relation only
  *     (explode bigrams → map-side-combinable count → 1-row argmax to the
  *     driver → one codegen'd regexp rewrite). Driver state is one merge
  *     rule per round; lineage is checkpoint-truncated every few rounds
  *     so the plan stays O(1) deep like the Closure fixpoint;
  *   - [[encode]] applies the learned merges per DISTINCT word and
  *     broadcast-joins the word→tokens map back to the corpus, so the
  *     chained-rewrite cost is paid |vocab| times, not |corpus| times.
  *
  * Symbol sequences are SPACE-JOINED STRINGS ("l o w </w>"), not arrays:
  * a merge is then one regexp_replace whose left-to-right non-overlapping
  * replacement IS the reference algorithm's scan order ("a a a" + (a,a) →
  * "aa a"), and the column stays inside whole-stage codegen. `</w>` marks
  * word end (merges never cross words by construction).
  *
  * Determinism: the argmax pair breaks ties by (freq desc, left asc,
  * right asc) — same inputs, same merge table, on any partitioning.
  * BpeSpec proves train/encode bit-equal to a plain-Scala reference
  * implementation of the paper's algorithm.
  */
object Bpe {

  /** (word, freq) over whitespace-tokenized, lower-cased text — the one
    * corpus-wide pass. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol string of a word: characters + the `</w>` terminal,
    * space-joined ("low" → "l o w </w>"). */
  private def symInit(word: Column): Column =
    concat(array_join(split(word, ""), " "), lit(" </w>"))

  /** Regex-quote `s` for use inside a pattern (symbols can contain regex
    * metacharacters once punctuation enters the vocab). */
  private def q(s: String): String = java.util.regex.Pattern.quote(s)

  /** Escape `s` for use as a regexp_replace REPLACEMENT (`$` and `\`). */
  private def repl(s: String): String = s.replaceAll("([\\\\$])", "\\\\$1")

  /** The pattern rewriting one merge (a, b) → ab over a space-joined
    * symbol string: the pair as whole space-delimited tokens. Bounded
    * lookarounds keep adjacent occurrences scanning left-to-right. */
  private def mergePattern(a: String, b: String): String =
    "(?<=^|\\s)" + q(a) + " " + q(b) + "(?=\\s|$)"

  /** One learned merge rule. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Learn `numMerges` merge rules from a (word, freq) relation. Each
    * round: bigram counts over the vocab-sized relation, 1-row argmax to
    * the driver, one regexp rewrite. Stops early when no pair repeats. */
  def trainFromWordFreq(words: DataFrame, numMerges: Int): Seq[Merge] = {
    require(numMerges > 0, "numMerges must be positive")
    var syms = words.select(col("freq"),
      symInit(col("word")).as("syms")).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var done = false
    var k = 0
    while (k < numMerges && !done) {
      val s = split(col("syms"), " ")
      val best = syms
        .select(col("freq"), explode(zip_with(
          slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val a = best.head.getString(0)
        val b = best.head.getString(1)
        val n = best.head.getLong(2)
        merges += Merge(k + 1, a, b, n)
        syms = syms.withColumn("syms",
          regexp_replace(col("syms"), mergePattern(a, b), repl(a + b)))
        // truncate the chained-rewrite lineage like the Closure fixpoint
        if ((k + 1) % 5 == 0) syms = syms.localCheckpoint()
      }
      k += 1
    }
    merges.toSeq
  }

  /** End-to-end trainer: corpus → word frequencies → merge table
    * (rank, left, right, freq), ordered by rank. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainFromWordFreq(wordFreq(docs, textCol), numMerges)
      .toDF("rank", "left", "right", "freq")
  }

  /** Apply a learned merge list to `df[textCol]`: per DISTINCT word, the
    * merges replay in rank order (chained codegen'd rewrites), then the
    * word→tokens map broadcast-joins back onto the corpus rows keyed by
    * `idCol`. Adds `tokens` (array of BPE symbols, `</w>`-terminated per
    * word, document order preserved) and `n_tokens`. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = df
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0).distinct()
    val encoded = merges.sortBy(_.rank).foldLeft(symInit(col("word"))) {
      (c, m) => regexp_replace(c, mergePattern(m.left, m.right),
        repl(m.left + m.right))
    }
    val wordMap = words.select(col("word"), split(encoded, " ").as("_wtoks"))
    val perDoc = df
      .select(col(idCol), posexplode(
        filter(TextOps.tokens(col(textCol)), w => length(w) > 0))
        .as(Seq("_pos", "word")))
      .join(broadcast(wordMap), Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(array_sort(
        collect_list(struct(col("_pos"), col("_wtoks"))))
        .getField("_wtoks")).as("tokens"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("tokens",
        coalesce(col("tokens"), array().cast("array<string>")))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }
}
