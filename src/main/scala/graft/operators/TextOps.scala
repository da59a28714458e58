package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, fingerprinting.
  *
  * Everything here is pure narrow column expressions (codegen'd, no UDFs,
  * no shuffles) — at 100 TB these run at scan speed inside whole-stage
  * codegen, and any aggregation downstream gets map-side partials.
  */
object TextOps {

  /** Whitespace tokens of lower-cased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Word n-gram shingles ("a b c", n=2 → ["a b","b c"]). Documents shorter
    * than n tokens yield one shingle of the whole text. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))

  /** BPE-ish token count: word pieces + standalone punctuation, the usual
    * pre-tokenizer regex shape. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Language → very common words (public knowledge stopword lists). */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pour", "dans", "ce", "une"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Stopword hits for one language over a token array. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => array_contains(lit(stopwords(lang).toArray), t)))

  /** N-gram/stopword-heuristic language id: the language with the most
    * stopword hits, ties broken alphabetically (deterministic). */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l => l -> stopwordHits(toks, l)).toMap
    // alphabetical cascade: first language whose score >= all others wins
    langs.dropRight(1).foldRight(lit(langs.last)) { (l, elseCol) =>
      val geAll = langs.filter(_ != l).map(o => scores(l) >= scores(o)).reduce(_ && _)
      when(geAll, lit(l)).otherwise(elseCol)
    }
  }

  /** Quality-signal columns for a text column (length, token stats,
    * punctuation/digit/stopword ratios). */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nChars = length(text).cast("double")
    Seq(
      "n_tokens" -> size(toks).cast("long"),
      "n_chars_m" -> length(text).cast("long"),
      "avg_token_len" -> round(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks), 4),
      "punct_ratio" -> round(
        length(regexp_replace(lower(text), "[a-z0-9\\s]", "")).cast("double") / nChars, 4),
      "digit_ratio" -> round(
        length(regexp_replace(text, "[^0-9]", "")).cast("double") / nChars, 4),
      "stopword_ratio" -> round(
        stopwordHits(toks, "en").cast("double") / size(toks), 4))
  }

  /** Engine-portable 60-bit token hash: the first 15 hex digits of md5,
    * parsed as an integer. Fits a signed long (< 2^60), and any engine with
    * md5 + hex parsing computes the identical value (DuckDB:
    * `('0x'||substr(md5(t),1,15))::BIGINT`) — unlike xxhash64, whose seed
    * and finalization are Spark-specific. */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Rabin-Karp rolling-fingerprint parameters: Mersenne prime 2^31-1 and a
    * base coprime to it. With acc < 2^31 and base < 2^20 every intermediate
    * stays below 2^51 — exact under Spark 4's default ANSI mode (the naive
    * `acc*B + h` chain overflows long on the second token of any real text
    * and throws ARITHMETIC_OVERFLOW). */
  val RollingP = 2147483647L
  val RollingB = 1000003L

  /** Deterministic rolling-hash fingerprint of the normalized token stream
    * (order-sensitive, Rabin-Karp over portable 60-bit token hashes, mod
    * 2^31-1). Engine-portable: DuckDB reproduces the chain with
    * `list_reduce` over the same md5-derived token hashes. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), t => portableHash60(t) % RollingP),
      lit(0L),
      (acc, h) => (acc * lit(RollingB) + h) % RollingP)

  /** Content-defined fingerprint usable cross-engine: md5 of the normalized
    * (lower, single-spaced) text. */
  def md5Fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** TF-IDF table: (id, term, tf, df, score) with
    * score = round(tf · ln((N+1)/(df+1)), 4). Classic two-aggregation
    * shape: term frequencies per doc (map-side combinable) joined with
    * document frequencies per term; N collected once (a count, not data).
    * Scores are rounded before any downstream ranking so orderings are
    * engine-portable. */
  def tfIdf(df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    val n = df.count()
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = toks.distinct().groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
      .withColumn("score",
        round(col("tf") * log(lit(n + 1.0) / (col("df") + lit(1.0))), 4))
      .select("id", "term", "tf", "df", "score")
  }

  /** Cleaning normalization for training text: lower-case, strip
    * non-alphanumerics to spaces, collapse runs, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), " +", " "))

  /** HTML → text extraction, the first stage of every crawl pipeline
    * (CCNet/C4/RefinedWeb run an extractor before any quality or dedup
    * stage). Codegen'd column algebra in the engine-portable regex
    * subset (no backreferences — script and style blocks are matched by
    * their own literal close tags so RE2 engines agree byte-for-byte):
    *  1. drop <script>…</script> and <style>…</style> WHOLESALE,
    *     case-insensitive, dot-matches-newline (their content is code,
    *     and may itself contain markup inside string literals);
    *  2. drop <!-- comments -->;
    *  3. replace every remaining tag with a space (block boundaries
    *     must not glue words together);
    *  4. decode the named entities &nbsp; &lt; &gt; &quot; &#39;
    *     &apos; and LAST &amp; (decoding amp first would double-decode
    *     "&amp;lt;"); numeric character references beyond &#39; are
    *     out of contract — extraction, not a full HTML5 parser;
    *  5. collapse whitespace runs, trim.
    * Contract: tag-structured input; a bare '<' in running text is
    * consumed up to the next '>' like any tag (same rule as browsers'
    * error recovery for unescaped brackets, and exactly why step 4's
    * escape/decode pair makes escaped text roundtrip losslessly. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComments = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "(?s)<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The matching escape (for fixtures and sinks): & first, then the
    * four markup-significant characters — [[stripHtml]]'s decode inverts
    * it exactly, so escape→wrap→extract roundtrips any text. */
  def escapeHtml(text: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
        "\"" -> "&quot;", "'" -> "&#39;")
      .foldLeft(text) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }

  /** PII patterns for redaction — deliberately restricted to the regex
    * subset with identical semantics in Java's engine and RE2 (DuckDB):
    * character classes, bounded quantifiers and `\b` word boundaries only —
    * no backreferences or lookaround, so match sets agree byte-for-byte
    * cross-engine. Greedy matching is leftmost-longest-prefix in both. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{3,4}\\b" // the reserved fictional NANP block
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII hit counts over (lower-cased) text: emails, phone numbers, IPv4
    * addresses. Pure codegen'd regexp column work — scan-speed at 100 TB. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"),
    "n_phones" -> size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long"),
    "n_ips" -> size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long"))

  /** Redact PII in place (emails, then IPv4, then phones — a fixed order so
    * every engine produces the identical redacted byte stream). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** BPE vocabulary-learning statistics: corpus-wide frequencies of
    * adjacent character pairs inside words — the quantity one BPE merge
    * step maximizes (the highest-count pair becomes the next merge rule).
    * Shape: explode words → explode in-word positions → ONE map-side-
    * combinable hash aggregate on the pair string; the candidate relation
    * never leaves whole-stage codegen (`substr` with a column offset, no
    * interpreted HOF lambdas). Output: (pair, n) for every pair. */
  def bpePairStats(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame =
    df.select(explode(split(normalize(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substr(w, i, 2)").as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))

  /** Corpus-conditional bigram language-model score per document — the
    * n-gram-LM quality signal of CCNet/Gopher-style pipelines, in
    * engine-portable EXACT integer arithmetic: each in-document bigram
    * (t1,t2) scores its corpus conditional probability
    * P(t2|t1) = count(t1 t2)/count(t1 ·) in integer basis points
    * (a log-space perplexity would hinge on cross-engine `ln` bit
    * equality, which no engine pair guarantees). Documents dominated by
    * corpus-rare continuations score low; boilerplate scores high.
    *
    * Shape: positional tokens → `lead` bigrams (one window shuffle keyed
    * by doc), two vocabulary-sized hash aggregates (bigram + history
    * counts, map-side combinable), then hash joins keyed by the term
    * strings — the tfIdf shape, nothing corpus-quadratic.
    *
    * Output per doc with ≥ 1 bigram: (idCol, n_bigrams, sum_prob_bp,
    * avg_prob_bp, min_prob_bp). */
  def bigramLmScores(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val big = toks.withColumn("t2", lead(col("t"), 1).over(w))
      .filter(col("t2").isNotNull)
      .select(col("id"), col("t"), col("t2"))
      .localCheckpoint(false) // reused: doc-side scoring + both count aggregates (lazy, round 19)
    val c2 = big.groupBy(col("t"), col("t2")).agg(count(lit(1)).as("c2"))
    val c1 = big.groupBy(col("t")).agg(count(lit(1)).as("c1"))
    big.join(c2, Seq("t", "t2")).join(c1, Seq("t"))
      .select(col("id"), expr("c2 * 10000 DIV c1").as("bp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bp")).as("sum_prob_bp"),
        min(col("bp")).as("min_prob_bp"))
      .select(col("id").as(idCol), col("n_bigrams"), col("sum_prob_bp"),
        expr("sum_prob_bp DIV n_bigrams").as("avg_prob_bp"), col("min_prob_bp"))
  }

  /** CORPUS-REPEATED N-GRAM FRACTION — the cross-document repetition
    * signal of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" (arXiv:2107.06499), at token n-gram granularity: for
    * each document, the fraction of its n-gram positions whose gram also
    * appears in ≥ `minDocs` OTHER-or-same distinct documents. High
    * fractions mark boilerplate (headers, licenses, templated spam) that
    * survives whole-document dedup because the surrounding text differs.
    *
    * Output per doc with ≥ 1 n-gram: (idCol, n_pos, n_dup, dup_bp) where
    * dup_bp = 10000·n_dup DIV n_pos — integer basis points, engine-exact.
    *
    * Shape (100 TB): posexplode → lead-window gram assembly (n short
    * strings per row on the wire, never whole token arrays) → one
    * count-distinct hash aggregate keyed by gram for the document
    * frequencies → a semi-join of positions against the frequent-gram
    * set → two map-side-combinable per-doc counts. No windows over the
    * corpus, no driver collect; the frequent set is corpus-vocabulary-
    * sized and shuffle-joins (it is NOT assumed broadcastable). A
    * production run at petabyte scale can key the aggregate/join by
    * xxhash64(gram) to halve shuffle bytes at ~2⁻⁶⁴ collision risk; the
    * string key here keeps the operator bit-exact against the oracle. */
  def corpusDupNgrams(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      n: Int, minDocs: Long = 2L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "t0")))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val withNexts = (1 until n).foldLeft(toks) { (acc, j) =>
      acc.withColumn(s"t$j", lead(col("t0"), j).over(w))
    }
    // One evaluation of the gram-assembly subtree (round 10): the grams
    // relation feeds THREE branches (gram-frequency agg, semi-join probe,
    // per-doc n_pos agg). Without an anchor each branch re-runs the
    // posexplode + window sort — three corpus-token sorts instead of one.
    // The planted repartition(gram) is one shuffle of the compact
    // (id, gram) relation whose three canonically-equal subtrees
    // ReuseExchange collapses: gram assembly runs ONCE and the other two
    // branches read the first's shuffle files (same pattern as
    // Dedup.minhashCandidates; ReusedExchange + single-window asserted in
    // PipelineOpsSpec). The key must be GRAM, not id: the window below
    // already hash-distributes by id, so a repartition(id) is elided as
    // redundant and the branches fall back to sharing only the
    // pre-window exchange — re-running the window sort per branch.
    // Keying by gram also serves the consumers: the frequency agg needs
    // no further exchange, the semi-join is co-partitioned on its key,
    // and the two groupBy(id) aggs partial-aggregate map-side before
    // shuffling compact per-doc counts.
    val grams = withNexts.filter(col(s"t${n - 1}").isNotNull)
      .select(col("id"),
        concat_ws(" ", (0 until n).map(j => col(s"t$j")): _*).as("gram"))
      .repartition(col("gram"))
    val freq = grams.groupBy(col("gram"))
      .agg(count_distinct(col("id")).as("d"))
      .filter(col("d") >= minDocs).select(col("gram"))
    // LEFT join + marker + ONE per-doc aggregate (round 10), not the
    // former 3-branch shape (freq agg / semi-join probe / separate n_pos
    // agg + outer re-join on id). Two reasons, both plan-shape:
    //  - a left_semi probe gets rewritten below the planted exchange by
    //    PushDownLeftSemiAntiJoin, and a final outer join on id infers
    //    isnotnull(id) into one branch's scan — either way the branches
    //    stop being canonically equal and gram assembly re-runs;
    //  - with the marker, count(_hit) vs count(*) in a single aggregate
    //    IS n_dup vs n_pos — no second corpus-side agg, no re-join.
    // `freq` is per-gram-unique (groupBy key), so the left join preserves
    // row multiplicity exactly.
    val marked = grams.join(freq.withColumn("_hit", lit(1)), Seq("gram"), "left")
    marked.groupBy(col("id"))
      .agg(count(lit(1)).as("n_pos"), count(col("_hit")).as("n_dup"))
      .select(col("id").as(idCol), col("n_pos"), col("n_dup"),
        expr("10000 * n_dup DIV n_pos").as("dup_bp"))
  }

  /** Corpus-wide N-GRAM COUNT TABLE — the LM count-table data product
    * (KenLM-style estimation, n-gram lookup indexes): every distinct token
    * n-gram with its corpus frequency, pruned at `minCount`. The prune is
    * the scale-critical part: at 100 TB the singleton tail dominates the
    * gram space, and `minCount` drops it INSIDE the one hash aggregate
    * (map-side combinable) before anything is materialized.
    *
    * Shape: posexplode tokens → `lead` windows reassemble gram strings
    * (n strings per row on the wire, never the whole token array) → one
    * count aggregate keyed by the gram. */
  def ngramCounts(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      n: Int, minCount: Long = 1L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "t0")))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val withNexts = (1 until n).foldLeft(toks) { (acc, j) =>
      acc.withColumn(s"t$j", lead(col("t0"), j).over(w))
    }
    withNexts.filter(col(s"t${n - 1}").isNotNull)
      .select(concat_ws(" ", (0 until n).map(j => col(s"t$j")): _*).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Composite Gopher/C4-style QUALITY FILTER with reason codes — the
    * rule-based pre-filter of large-corpus pipelines, with every rule in
    * CROSS-MULTIPLIED integer form (`digits·10⁴ > 2000·chars`, never a
    * float ratio) so the pass/fail decision is bit-identical on any
    * engine. Output per doc: (idCol, n_tokens, reasons, passes) where
    * `reasons` is a bitmask of violated rules:
    *
    *   1  too short (< 50 tokens)
    *   2  mean token length outside [3, 10]
    *   4  digit ratio > 0.2
    *   8  punctuation ratio > 0.2
    *   16 English stopword ratio < 0.02 (non-English/templated text)
    *   32 duplicate 3-gram ratio > 0.2 (repetition rule)
    *
    * Shape: one narrow map pass for the per-doc counters + the q50
    * repetition aggregate left-joined back — scan-speed at 100 TB. */
  def qualityFilter(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      n: Int = 3): org.apache.spark.sql.DataFrame = {
    val toks = tokens(col(textCol))
    val base = df.select(col(idCol).as("id"),
      size(toks).cast("long").as("n_tokens"),
      aggregate(toks, lit(0L), (a, t) => a + length(t)).as("sum_token_len"),
      length(col(textCol)).cast("long").as("n_chars"),
      length(regexp_replace(col(textCol), "[^0-9]", "")).cast("long").as("digit_chars"),
      length(regexp_replace(lower(col(textCol)), "[a-z0-9\\s]", "")).cast("long").as("punct_chars"),
      stopwordHits(toks, "en").cast("long").as("stop_hits"))
    val rep = repetitionStats(df, textCol, idCol, n)
      .select(col(idCol).as("id"), col("dup_gram_bp"))
    def bit(cond: Column, v: Long): Column = when(cond, lit(v)).otherwise(lit(0L))
    base.join(rep, Seq("id"), "left")
      .na.fill(0L, Seq("dup_gram_bp"))
      .withColumn("reasons",
        bit(col("n_tokens") < 50, 1L) +
          bit(col("sum_token_len") < col("n_tokens") * 3 ||
            col("sum_token_len") > col("n_tokens") * 10, 2L) +
          bit(col("digit_chars") * 10000 > col("n_chars") * 2000, 4L) +
          bit(col("punct_chars") * 10000 > col("n_chars") * 2000, 8L) +
          bit(col("stop_hits") * 10000 < col("n_tokens") * 200, 16L) +
          bit(col("dup_gram_bp") > 2000, 32L))
      .select(col("id").as(idCol), col("n_tokens"), col("reasons"),
        (col("reasons") === 0).cast("int").as("passes"))
  }

  /** Fixed-size token-window CHUNKING with overlap — the doc → training/
    * retrieval-window step: windows of `size` tokens starting every
    * `stride` tokens, last window ragged, short docs yield one whole-doc
    * chunk. Output: (idCol, chunk_index, start, end, n_tokens_chunk,
    * chunk_fp) with 0-based token offsets, `end` exclusive, and an md5
    * fingerprint of the chunk's space-joined tokens (engine-portable).
    * Pure narrow work: explode over a computed chunk count, `slice` on
    * the token array — no shuffle at all. */
  def chunkSpans(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      chunkLen: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkLen > 0 && stride > 0, "chunkLen and stride must be positive")
    val nToks = size(tokens(col(textCol))).cast("long")
    val nChunks = when(nToks <= chunkLen, lit(1L))
      .otherwise(ceil((nToks - lit(chunkLen.toLong)).cast("double") / stride).cast("long") + 1L)
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_index"))
      .withColumn("start", col("chunk_index") * stride)
      .withColumn("end", least(col("chunk_index") * stride + chunkLen,
        size(col("toks")).cast("long")))
      .withColumn("n_tokens_chunk", col("end") - col("start"))
      .withColumn("chunk_fp", md5(concat_ws(" ",
        slice(col("toks"), (col("start") + 1).cast("int"),
          col("n_tokens_chunk").cast("int")))))
      .select(col("id").as(idCol), col("chunk_index"), col("start"),
        col("end"), col("n_tokens_chunk"), col("chunk_fp"))
  }

  /** Intra-document repetition: the fraction of a document's token
    * n-grams that are duplicates of an earlier gram in the SAME document
    * — the classic repetitiousness quality signal (boilerplate, keyword
    * stuffing, degenerate generations score high). Output per doc with
    * ≥ 1 gram: (idCol, n_grams, n_distinct, dup_gram_bp) with exact
    * integer basis points. One hash-aggregate over the positional-gram
    * relation — same one-shuffle construction as MinHash/spans. */
  def repetitionStats(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      n: Int = 3): org.apache.spark.sql.DataFrame =
    Dedup.positionalGramHashes(df, textCol, idCol, n)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), countDistinct(col("gh")).as("n_distinct"))
      .select(col("id").as(idCol), col("n_grams"), col("n_distinct"),
        expr("(n_grams - n_distinct) * 10000 DIV n_grams").as("dup_gram_bp"))

  /** Exact duplicated-substring spans (the detection phase of ExactSubstr
    * dedup, Lee et al. 2107.06499 §4.1): every character position whose
    * `minLen`-gram occurs ≥ 2 times ANYWHERE in the corpus (other docs or
    * a self-repeat) is duplicated; overlapping-or-contiguous hit
    * intervals merge per document into maximal spans — the byte ranges
    * ExactSubstr would cut. Output: (idCol, span_start, span_end),
    * 1-based inclusive character positions.
    *
    * Shape: one stride-1 gram explode (corpus chars × ~L-byte keys), one
    * count-window partitioned by the GRAM (exact equality — no hash
    * collisions in the dedup decision), then per-doc windows for the
    * islands merge; the final (doc, island) aggregate reuses the per-doc
    * partitioning (no extra shuffle — hashpartitioning(doc) already
    * clusters (doc, island)). 100 TB notes: (1) a stop-gram ("the same
    * 40 chars everywhere", boilerplate) makes one window partition hot —
    * `hotGramCap` (round 14) swaps the window for a reused-exchange
    * agg+join plan whose skewed partitions AQE splits; (2) to cut the stride-1
    * explode volume, anchor on [[winnowFingerprints]] positions instead —
    * the winnowing guarantee (any shared run ≥ k + w - 1 shares a
    * fingerprint) bounds the missed-span length, the documented recall
    * trade the paper's suffix array avoids by paying O(corpus) memory;
    * (3) a hash-first two-phase count was tried and measured WORSE (see
    * the inline note).
    *
    * `hotGramCap` (opt-in, 0 = off; otherwise ≥ 2): arms the skew-proof
    * plan for corpora with boilerplate headers / license blocks — the
    * count WINDOW (whose hot-gram partition must hold every copy in one
    * task) is replaced by a map-side-combinable count AGGREGATE (a hot
    * gram collapses to one row per map partition, so its shuffle is
    * skew-free) whose ≥2 key set the grams then join UNHINTED: AQE
    * broadcasts it when tiny (no gram shuffle at all) and skew-splits
    * the join when boilerplate-heavy, so no task ever holds a whole hot
    * gram. Results are byte-identical either way; the price is deriving
    * the gram explode twice (round 14 — an explicit
    * repartition+ReuseExchange variant was built and REJECTED at 214 s
    * vs this plan's 108 s at 100×: column pruning specializes the two
    * consumers' exchanges so ReuseExchange can't fire, and the explicit
    * exchange defeats the aggregate's map-side combine). Leave it off
    * when the corpus is known boilerplate-free; turn it on for real
    * crawl data at scale. */
  def duplicateSpans(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      minLen: Int, hotGramCap: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    require(hotGramCap == 0L || hotGramCap >= 2L,
      "hotGramCap must be 0 (off) or >= 2 (a capped gram must still be a duplicate)")
    import org.apache.spark.sql.expressions.Window
    val L = minLen
    // the stride-1 explode multiplies work ~L× per input CHAR; a small
    // (single-split) doc scan would run it on one core (FanOut scaladoc)
    val grams = FanOut.fanOutSmall(df)
      .filter(length(col(textCol)) >= L)
      .select(col(idCol).as("id"),
        explode(sequence(lit(1L),
          (length(col(textCol)) - L + 1).cast("long"))).as("pos"),
        col(textCol).as("t"))
      .select(col("id"), col("pos"), col("t").substr(col("pos"), lit(L)).as("g"))
    // Direct exact count window, deliberately: a two-phase variant
    // (xxhash64 count-aggregate → broadcast dup-hash set → exact verify
    // over candidates only) was built and A/B-measured WORSE at both
    // probe scales (sf0.1 3.1→8.4 s, 100× 108→205 s) — the count guard
    // and candidate pass re-derive the gram explode from the corpus, and
    // that recomputation costs more than the string shuffle it saves.
    // One gram pass beats two at any scale where the explode dominates;
    // the winnowing-anchor path (scaladoc) is the volume lever instead.
    val hits = dupByKey(grams, "g", hotGramCap).select(col("id"), col("pos"))
    // gaps-and-islands: a hit starts a new span iff it begins past the
    // running max end of everything before it (+1 keeps contiguous
    // intervals merged)
    val before = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col("id")).orderBy(col("pos"))
    hits
      .withColumn("new_island",
        when(col("pos") >
          coalesce(max(col("pos") + L - 1).over(before), lit(-1L)) + 1,
          1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(run))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + L - 1).as("span_end"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"))
  }

  /** Corpus-wide duplicate filter over a keyed relation: rows whose `key`
    * value occurs ≥ 2 times ANYWHERE survive, other columns carried
    * through. `cap` ≥ 2 arms the skew-proof plan (round 14): the dup-key
    * set comes from ONE map-side-combinable count aggregate — partial
    * aggregation below the exchange collapses a hot key to one row per
    * map partition, so the count shuffle is skew-free — and the rows
    * then join that set UNHINTED: on boilerplate-light corpora the ≥2
    * set is tiny and AQE broadcasts it (the join costs a probe, no
    * shuffle of the rows at all — the uncapped window can never skip
    * that shuffle); on boilerplate-heavy corpora it falls to a shuffle
    * join whose skewed partitions AQE splits into bounded chunks. The
    * join replaces the count WINDOW, so there is no partition that must
    * hold every copy of a hot key in one task. (Two rejected
    * iterations, both measured: the round-13 count-then-broadcast
    * skip-list re-derived the input from THREE subplans at a 1.3–4×
    * premium; a round-14 explicit repartition+ReuseExchange variant hit
    * 214 s vs 108 s at 100× — column pruning specializes the consumers'
    * exchanges so ReuseExchange can't fire, and the explicit exchange
    * defeats map-side combine. `cap`'s VALUE no longer tunes anything;
    * ≥ 2 arms the plan, the signature is kept for the q165/q168 call
    * sites.) Results are byte-identical with the cap on or off. Shared
    * by the exact and both winnowing-anchored span detectors. */
  private def dupByKey(rows: org.apache.spark.sql.DataFrame, key: String,
      cap: Long, materialize: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(cap == 0L || cap >= 2L,
      "cap must be 0 (off) or >= 2 (a capped key must still be a duplicate)")
    import org.apache.spark.sql.expressions.Window
    if (cap >= 2L) {
      // `materialize` cuts re-derivation by DOWNSTREAM consumers
      // (cutSpans reads the span relation three times) with an eager
      // localCheckpoint: right when `rows` is the REDUCED anchor
      // relation (~2/(w+1) of tokens — the 100× probe measured the
      // capped anchored cut 145 s recomputed vs ~20 s materialized);
      // wrong for the exact detector's full gram explode (corpus × L
      // bytes — recomputation is cheaper than storing it).
      // Plan (measured at 100×, see PLANS.md round 14): the dup-key set
      // from ONE map-side-combinable count aggregate (partial agg below
      // the exchange — a hot gram collapses to one row per map
      // partition, so the count shuffle is skew-free), then the rows
      // join that set UNHINTED: on boilerplate-light corpora the ≥2 set
      // is tiny and AQE broadcasts it (the join costs a probe, no
      // shuffle of the rows AT ALL — the uncapped window can never skip
      // that shuffle); on boilerplate-heavy corpora it falls to a
      // shuffle join whose skewed partitions AQE splits into bounded
      // chunks — the insurance property, without the window's
      // one-task-per-gram straggler. (An explicit repartition-and-reuse
      // variant was built and rejected: column pruning specializes the
      // two consumers' exchanges so ReuseExchange cannot fire, and the
      // explicit exchange defeats the aggregate's map-side combine —
      // it measured 214 s vs this plan at 100×.)
      val r = if (materialize) rows.localCheckpoint() else rows
      val dupKeys = r.groupBy(col(key)).agg(count(lit(1)).as("_c"))
        .filter(col("_c") >= 2).select(col(key))
      r.join(dupKeys, Seq(key))
    } else rows
      .withColumn("_c", count(lit(1)).over(Window.partitionBy(col(key))))
      .filter(col("_c") >= 2).drop("_c")
  }

  /** Winnowing-anchored duplicated-span detection — [[duplicateSpans]]'s
    * documented 100 TB volume lever, implemented: instead of exploding a
    * gram per CHARACTER position, select token k-gram anchors by the
    * winnowing rule (the minimum-hash gram of every w-gram window, the
    * same scheme as [[winnowFingerprints]]) and count only anchors.
    * Volume drops to ~2/(w+1) of the token grams — and the winnowing
    * guarantee bounds the recall trade PRECISELY: any shared run of
    * ≥ k + w - 1 tokens selects at least one IDENTICAL anchor in both
    * copies, so every such run is detected; shorter overlaps may be
    * missed (the exact stride-1 operator is the no-miss tool). Anchors
    * count by their full gram TEXT (carried through the window min), so
    * a hash collision can never fabricate a duplicate. Within a long
    * shared run consecutive anchors sit ≤ w positions apart, so islands
    * merge with gap tolerance w rather than contiguity. Output:
    * (idCol, tok_start, tok_end), 0-based inclusive token positions.
    *
    * Shape: one token explode + per-doc lead/min windows (all partitioned
    * by doc), then the anchor count window keyed by gram text over the
    * REDUCED anchor set — the wide shuffle is ~2/(w+1) the size of the
    * exact operator's, and everything else is per-doc. */
  def duplicateSpansAnchored(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      k: Int = 5, w: Int = 4,
      hotAnchorCap: Long = 0L): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    // NO fan-out here (round 19, VERDICT r18 item 1): the dense phase —
    // the lead/min window chain — runs AFTER the byDoc shuffle, which
    // already spreads it; the round-18 fan-out ahead of the cheap
    // posexplode was pure overhead (driver bench: q164 0.18× at 32c)
    val toks = df.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
    val withNexts = (1 until k).foldLeft(toks) { (acc, j) =>
      acc.withColumn(s"t$j", lead(col("t"), j).over(byDoc))
    }
    val gramCols = col("t") +: (1 until k).map(j => col(s"t$j"))
    val grams = withNexts.filter(col(s"t${math.max(k - 1, 0)}").isNotNull)
      .select(col("id"), col("pos"), concat_ws(" ", gramCols: _*).as("g"))
      .withColumn("gh", portableHash60(col("g")) % RollingP)
    // robust winnowing selection: the (min-hash, leftmost) gram of each
    // full w-window; the struct min carries pos + gram text along
    val winSel = byDoc.rowsBetween(Window.currentRow, w - 1)
    val anchors = grams
      .withColumn("sel", min(struct(col("gh"), col("pos"), col("g"))).over(winSel))
      .withColumn("_full", lead(col("gh"), w - 1).over(byDoc))
      .filter(col("_full").isNotNull)
      .select(col("id"), col("sel.pos").as("pos"), col("sel.g").as("g"))
      .distinct()
    // hotAnchorCap: boilerplate anchors skew this count exactly like the
    // exact detector's grams (winnowing REDUCES volume, it does not
    // de-skew — every copy of a shared header selects the same anchor);
    // dupByKey's skew-proof agg+join plan bounds the per-task volume,
    // byte-identical output. materialize = the anchor relation is the
    // REDUCED set, cheap to checkpoint and consumed by several subplans
    val hits = dupByKey(anchors, "g", hotAnchorCap, materialize = true)
      .select(col("id"), col("pos"))
    val before = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col("id")).orderBy(col("pos"))
    hits
      .withColumn("new_island",
        when(col("pos") >
          coalesce(max(col("pos") + k - 1).over(before), lit(-w - k - 1L)) + w,
          1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(run))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).cast("long").as("tok_start"),
        (max(col("pos")) + k - 1).cast("long").as("tok_end"))
      .select(col("id").as(idCol), col("tok_start"), col("tok_end"))
  }

  /** [[duplicateSpansAnchored]] emitting CHARACTER spans over the
    * ORIGINAL text — the missing half of the 100 TB ExactSubstr pipeline
    * (round 13): the anchored detector is the only detection path whose
    * volume works at corpus scale, but its token-position output could
    * not feed [[cutSpans]], which cuts byte ranges. This variant carries
    * each token's char offsets through the explode so the spans come out
    * as (idCol, span_start, span_end), 1-based inclusive char positions,
    * directly consumable by [[cutSpans]] — same detection semantics and
    * same recall guarantee (any shared run of ≥ k + w - 1 tokens is
    * found; gram text counted exactly, never by hash).
    *
    * Token offsets without a per-character explode: the text is split
    * twice — on `\s+` (the tokens) and on `\S+` (the whitespace runs
    * BETWEEN them) — after prepending a `"x "` sentinel so both arrays
    * align from a non-whitespace start regardless of leading whitespace.
    * Zipping the two posexplodes and one per-doc prefix sum
    * S_i = Σ_{j≤i}(wsLen_j + tokLen_j) gives every token's char range in
    * the original text as (S_i - tokLen_i - 1, S_i - 2) — token volume,
    * not char volume, and every window is per-doc. Tokens lowercase only
    * inside the gram TEXT (the count key, matching [[tokens]]'
    * normalization); offsets always index the original text.
    *
    * Shape: two aligned token-level explodes + per-doc windows, then the
    * anchor-count shuffle over the winnowed ~2/(w+1) subset — identical
    * scale story to [[duplicateSpansAnchored]], plus one extra per-doc
    * zip join that AQE keeps on the same doc-id partitioning. */
  def duplicateSpansAnchoredChars(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      k: Int = 5, w: Int = 4,
      hotAnchorCap: Long = 0L): org.apache.spark.sql.DataFrame = {
    val anchors = anchorOffsets(df, textCol, idCol, k, w)
    // same skew exposure and same cure as [[duplicateSpansAnchored]]
    val hits = dupByKey(anchors, "g", hotAnchorCap, materialize = true)
      .select(col("id"), col("pos"), col("cs"), col("gce"))
    anchoredCharIslands(hits, idCol, k, w)
  }

  /** The winnowed anchor relation WITH char offsets — the shared
    * derivation of [[duplicateSpansAnchoredChars]] and the persisted
    * anchor index ([[DedupIndex.writeAnchorIndex]], round 14): the "x "
    * sentinel double-split token-offset trick, k-gram formation, and
    * the winnowing selection, exactly as documented on
    * [[duplicateSpansAnchoredChars]]. Output: (id, pos, g, cs, gce) —
    * token position, gram TEXT (the count/join key; hash collisions can
    * never fabricate a duplicate), and the gram's 1-based inclusive
    * char range in the ORIGINAL text. */
  private[operators] def anchorOffsets(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      k: Int, w: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val sentinel = concat(lit("x "), col(textCol))
    // NO fan-out (round 19): both explodes feed byDoc windows — the
    // keyed shuffle spreads the dense lead/min chain; see
    // duplicateSpansAnchored
    val dff = df
    val toks = dff.select(col(idCol).as("id"),
      posexplode(split(sentinel, "\\s+")).as(Seq("pos", "t")))
    val wss = dff.select(col(idCol).as("id"),
      posexplode(split(sentinel, "\\S+")).as(Seq("pos", "ws")))
      .select(col("id"), col("pos"), length(col("ws")).cast("long").as("wsl"))
    // aligned zip: ws_i is the whitespace run before tok_i (ws_0 = "",
    // the sentinel start); the trailing ws segment has no token row and
    // drops out of the inner join
    val offs = toks.join(wss, Seq("id", "pos"))
      .withColumn("tl", length(col("t")).cast("long"))
      .withColumn("s", sum(col("wsl") + col("tl")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // drop the sentinel token AND the trailing empty token split(-1)
      // keeps for text ending in whitespace (the oracle's tok2 filters
      // t <> ''); filtering AFTER the prefix-sum window keeps every
      // surviving token's offsets untouched
      .filter(col("pos") >= 1 && col("t") =!= "")
      .select(col("id"), col("pos"), lower(col("t")).as("t"),
        (col("s") - col("tl") - 1).as("cs"), (col("s") - 2).as("ce"))
    val withNexts = (1 until k).foldLeft(offs) { (acc, j) =>
      acc.withColumn(s"t$j", lead(col("t"), j).over(byDoc))
    }
    val gramCols = col("t") +: (1 until k).map(j => col(s"t$j"))
    val grams = withNexts
      .withColumn("gce", lead(col("ce"), k - 1).over(byDoc))
      .filter(col("gce").isNotNull)
      .select(col("id"), col("pos"), col("cs"), col("gce"),
        concat_ws(" ", gramCols: _*).as("g"))
      .withColumn("gh", portableHash60(col("g")) % RollingP)
    val winSel = byDoc.rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("sel", min(struct(col("gh"), col("pos"), col("g"),
        col("cs"), col("gce"))).over(winSel))
      .withColumn("_full", lead(col("gh"), w - 1).over(byDoc))
      .filter(col("_full").isNotNull)
      .select(col("id"), col("sel.pos").as("pos"), col("sel.g").as("g"),
        col("sel.cs").as("cs"), col("sel.gce").as("gce"))
      .distinct()
  }

  /** Gap-w island merge of matched anchors into char spans — the shared
    * tail of [[duplicateSpansAnchoredChars]] and the against-index batch
    * detector: `hits` is (id, pos, cs, gce) anchor rows already known
    * duplicated; output (idCol, span_start, span_end). */
  private[operators] def anchoredCharIslands(
      hits: org.apache.spark.sql.DataFrame, idCol: String,
      k: Int, w: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val before = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col("id")).orderBy(col("pos"))
    hits
      .withColumn("new_island",
        when(col("pos") >
          coalesce(max(col("pos") + k - 1).over(before), lit(-w - k - 1L)) + w,
          1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(run))
      .groupBy(col("id"), col("island"))
      .agg(min(col("cs")).as("span_start"), max(col("gce")).as("span_end"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"))
  }

  /** The cut phase of ExactSubstr dedup (Lee et al. 2107.06499 §4.1):
    * remove every duplicated span from every document — the paper cuts
    * ALL occurrences, relying on the surviving unique context — and
    * return (idCol, clean_text). Docs with no spans pass through
    * untouched; a fully-covered doc becomes "".
    *
    * Shape: the spans relation (tiny — bounded by corpus_chars/minLen)
    * turns into KEEP segments per doc via one lag window (gap between
    * consecutive spans) plus a tail segment, then one substr + ordered
    * array_join per doc rebuilds the text — the corpus is touched once
    * for the rebuild join and once for the untouched anti-join, never
    * shuffled by anything wider than the doc id. */
  def cutSpans(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      spans: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the spans relation is consumed three times below (gap segments,
    // tail segments, pass-through anti-join) — deliberately WITHOUT a
    // .cache(): the three consumers share one physical plan, so AQE's
    // exchange reuse already evaluates the expensive derivation once
    // (measured: q163 ≈ q162's span cost + ~0.2 s), while a cache would
    // leak plan-keyed entries across invocations and fake later timings
    val sp = spans.select(col(idCol).as("_id"),
      col("span_start"), col("span_end"))
    val byDoc = Window.partitionBy(col("_id")).orderBy(col("span_start"))
    val docs = df.select(col(idCol).as("_id"), col(textCol).as("_t"))
    // gaps between consecutive spans + the tail after the last span
    val mids = sp
      .withColumn("seg_start",
        coalesce(lag(col("span_end"), 1).over(byDoc), lit(0L)) + 1)
      .select(col("_id"), col("seg_start"), (col("span_start") - 1).as("seg_end"))
    val lasts = sp.groupBy(col("_id")).agg(max(col("span_end")).as("m"))
      .join(docs, "_id")
      .select(col("_id"), (col("m") + 1).as("seg_start"),
        length(col("_t")).cast("long").as("seg_end"))
    val segs = mids.union(lasts).filter(col("seg_start") <= col("seg_end"))
    val rebuilt = segs.join(docs, "_id")
      .select(col("_id"), struct(col("seg_start"),
        col("_t").substr(col("seg_start").cast("int"),
          (col("seg_end") - col("seg_start") + 1).cast("int")).as("seg")).as("s"))
      .groupBy(col("_id"))
      .agg(array_join(transform(sort_array(collect_list(col("s"))),
        x => x.getField("seg")), "").as("clean_text"))
    val dupDocs = sp.select(col("_id")).distinct()
    // fully-covered docs have no KEEP segments — they clean to ""
    val cleaned = dupDocs.join(rebuilt, Seq("_id"), "left")
      .select(col("_id"), coalesce(col("clean_text"), lit("")).as("clean_text"))
    val untouched = docs.join(dupDocs, Seq("_id"), "left_anti")
      .select(col("_id"), col("_t").as("clean_text"))
    cleaned.union(untouched).select(col("_id").as(idCol), col("clean_text"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken '03, the MOSS
    * local fingerprinting scheme): hash every token k-gram, slide a
    * window of `w` consecutive gram hashes, and keep the minimum of each
    * window — guaranteeing any shared substring of length ≥ k + w - 1
    * tokens contributes at least one IDENTICAL fingerprint to both
    * documents, while storing only ~2/(w+1) of the grams. The selected
    * set is position-independent, so the output is the distinct
    * (document, fingerprint) relation — the index you'd join on to find
    * plagiarized / near-verbatim passages without comparing full texts.
    *
    * Hashes are engine-portable (md5-60-bit of the gram string mod
    * 2^31-1, the q39 convention), NOT xxhash64, because the fingerprint
    * VALUES are the output here. Shape: posexplode + window leads
    * (grams) + a rows-window min — all partitioned by document id, so
    * the single shuffle is per-doc and the window state is w values;
    * the final distinct gets map-side partial aggregation. */
  def winnowFingerprints(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      k: Int = 3, w: Int = 4): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    // NO fan-out (round 19): the lead/min windows run after the byDoc
    // shuffle — see duplicateSpansAnchored
    val toks = df.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
    val withNexts = (1 until k).foldLeft(toks) { (acc, j) =>
      acc.withColumn(s"t$j", lead(col("t"), j).over(byDoc))
    }
    val gramCols = col("t") +: (1 until k).map(j => col(s"t$j"))
    val grams = withNexts.filter(col(s"t${math.max(k - 1, 0)}").isNotNull)
      .select(col("id"), col("pos"),
        (portableHash60(concat_ws(" ", gramCols: _*)) % RollingP).as("gh"))
    val winMin = byDoc.rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("fp", min(col("gh")).over(winMin))
      .withColumn("_full", lead(col("gh"), w - 1).over(byDoc))
      .filter(col("_full").isNotNull)
      .select(col("id").as(idCol), col("fp")).distinct()
  }

  /** Corpus-vocabulary coverage: the fraction of each document's tokens
    * that fall in the corpus's top-`k` most frequent tokens — the
    * corpus-driven generalization of a stopword-coverage filter (C4 /
    * Gopher use fixed lists; on unlabeled multilingual data the corpus
    * head IS the list). Natural text sits high; code, tables and
    * gibberish sit low.
    *
    * Shape: one map-side-combinable token-count aggregate, a fused
    * TakeOrdered for the top-k head (count desc, token asc — fully
    * deterministic at the boundary), broadcast of the k-row vocabulary
    * back onto the token stream, one final per-doc aggregate. No
    * corpus-side window anywhere. */
  def vocabCoverage(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      k: Int = 10): org.apache.spark.sql.DataFrame = {
    val tok = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
    val vocab = tok.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(k)
      .select(col("t"), lit(1L).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("t"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(coalesce(col("in_vocab"), lit(0L))).as("n_in_vocab"))
      .select(col("id").as(idCol), col("n_toks"), col("n_in_vocab"),
        expr("n_in_vocab * 10000 DIV n_toks").as("coverage_bp"))
  }

  /** BM25 relevance scoring of the corpus against a fixed term set — the
    * retrieval primitive behind quality-targeted data selection (rank the
    * corpus by relevance to a seed query, keep the head).
    *
    * Scores are EXACT integers ("milli-points"): BM25's reals are replaced
    * by rational arithmetic — k1 = 6/5, b = 3/4, and the log-free idf
    * ratio (N − df + ½)/(df + ½) — folded into one integer formula
    *
    *   score_m = (1000·(2N−2df+1)·22·tf·T) DIV ((2df+1)·(10·tf·T + 3·T + 9·dl·N))
    *
    * (T = total corpus tokens, so avgdl = T/N stays a ratio and never
    * rounds). Any engine with 64-bit integers reproduces it bit-for-bit.
    * Magnitude bound: the numerator ≈ 44000·N·tf·T must stay < 2⁶³, i.e.
    * N·tf·T < ~2·10¹⁴ (fine for the per-slice corpora this targets; for a
    * web-scale corpus cast the formula's operands to decimal(38,0) /
    * HUGEINT on both engines — same rational, wider registers). The
    * per-doc score is a SUM of integers — aggregation-order independent,
    * unlike float BM25.
    *
    * Shape: token explode → per-doc length agg; term tf agg (the term
    * filter prunes the explode FIRST, so the big agg only sees matching
    * tokens); df and the 1-row corpus totals broadcast back; final per-doc
    * sum + TakeOrdered top-k. No window, no all-terms scoring. */
  def bm25TopK(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int = 20): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
    val dl = toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val totals = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_toks"))
      .withColumn("_j", lit(1))
    val tf = toks.filter(col("tok").isin(terms: _*))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .join(dl, "id")
      .withColumn("_j", lit(1))
      .join(broadcast(totals), "_j")
      .withColumn("score_m", expr(
        "(1000 * (2*n_docs - 2*df + 1) * 22 * tf * total_toks) DIV " +
          "((2*df + 1) * (10*tf*total_toks + 3*total_toks + 9*dl*n_docs))"))
      .groupBy(col("id"))
      .agg(sum(col("score_m")).as("bm25_m"))
      .orderBy(col("bm25_m").desc, col("id"))
      .limit(k)
      .select(col("id").as(idCol), col("bm25_m"))
  }

  /** Character-diversity quality signal: per-document Simpson index in
    * exact basis points, 10000·(N² − Σcᵢ²) DIV N² over character counts
    * cᵢ (0 = one repeated character, →10000 = uniformly diverse). The
    * integer form is engine-portable where entropy's log is not.
    * Boilerplate/gibberish detectors threshold on this next to the q25
    * ratio columns. Shape: char explode → two map-side-combinable hash
    * aggs ((id, char) then id) — state is bounded by |alphabet| per doc. */
  def charDiversity(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame =
    // Split AFTER each code point — Java regex `.` is code-point aware, so
    // a supplementary-plane char (surrogate pair) stays ONE character,
    // matching DuckDB's per-character string_split(text, ''); a bare
    // split(text, "") would cut surrogate pairs into two UTF-16 units.
    // (?s): count newlines as characters too. Bound: 10000·n² needs
    // n < ~9.6e8 chars/doc to stay in long — far beyond any document that
    // belongs in a training corpus; upstream length filters enforce it.
    df.select(col(idCol).as("id"), explode(split(col(textCol), "(?s)(?<=.)")).as("c"))
      .filter(length(col("c")) > 0) // Spark's limit=-1 split keeps a trailing ""
      .groupBy(col("id"), col("c")).agg(count(lit(1)).as("k"))
      .groupBy(col("id")).agg(sum(col("k")).as("n"),
        sum(col("k") * col("k")).as("sum2"))
      .select(col("id"), col("n").as("n_chars_counted"),
        expr("10000 * (n*n - sum2) DIV (n*n)").as("simpson_bp"))

  /** Exact phrase match counts: per document, how many token positions
    * start the consecutive-token `phrase`. The positional-inverted-index
    * primitive behind phrase search and snippet mining.
    *
    * Shape: posexplode → ONE filter to the phrase's token postings (the
    * token predicate prunes before any shuffle — the relation joined is
    * the postings of the phrase tokens, not the corpus) → k−1 equi-joins
    * on (doc, aligned start position). */
  def phraseMatches(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String, phrase: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(phrase.size >= 2, "phrase needs at least 2 tokens")
    val postings = df
      .select(col(idCol).as("id"), posexplode(tokens(col(textCol))).as(Seq("p", "tok")))
      .filter(col("tok").isin(phrase.distinct: _*))
    val first = postings.filter(col("tok") === phrase.head)
      .select(col("id"), col("p"))
    phrase.zipWithIndex.drop(1)
      .foldLeft(first) { case (acc, (w, i)) =>
        acc.join(
          postings.filter(col("tok") === w)
            .select(col("id"), (col("p") - i).as("p")),
          Seq("id", "p"))
      }
      .groupBy(col("id")).agg(count(lit(1)).as("n_matches"))
  }

  /** CANONICAL URL (crawl-dedup house rules): the same page crawled as
    * `HTTPS://WWW.Site.COM:443//a//b/?utm_source=x&id=5#frag` and
    * `https://www.site.com/a/b?id=5` must dedup together — URL-level
    * canonicalization is the cheapest, highest-yield dedup stage in a
    * crawl pipeline (it runs before any content hashing). Rules, each a
    * codegen'd column op in the engine-portable regex subset (character
    * classes, alternation, bounded quantifiers — the PII-op contract):
    *  - strip the fragment;
    *  - lowercase scheme://host[:port], strip default ports 80/443
    *    (path case is PRESERVED — paths are case-sensitive);
    *  - collapse duplicate slashes in the path, drop a trailing slash;
    *  - drop tracking params (utm_*, fbclid, gclid) via split → filter →
    *    rejoin (array algebra, not a regex fixed-point — exact for any
    *    number of consecutive tracking params), keeping real params and
    *    their order; drop an emptied query entirely.
    * Contract: absolute http(s) URLs with a path component. */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // "scheme://host[:port]" = everything before the 3rd '/'
    val schemeHost = lower(substring_index(noFrag, "/", 3))
    val rest = noFrag.substr(length(schemeHost) + 1, length(noFrag))
    // default-port strip is SCHEME-conditioned: http://host:443/x is a
    // real non-default-port resource and must NOT merge with http://host/x
    val noPort = when(schemeHost.startsWith("https:"),
        regexp_replace(schemeHost, ":443$", ""))
      .when(schemeHost.startsWith("http:"),
        regexp_replace(schemeHost, ":80$", ""))
      .otherwise(schemeHost)
    val path = substring_index(rest, "?", 1)
    val cleanPath = regexp_replace(
      regexp_replace(path, "/{2,}", "/"), "(.)/$", "$1")
    val qs = when(instr(rest, "?") > 0,
      rest.substr(instr(rest, "?") + 1, length(rest))).otherwise(lit(""))
    val kept = array_join(filter(split(qs, "&"),
      p => !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid)=")), "&")
    concat(noPort, cleanPath,
      when(kept =!= "", concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** CCNET-STYLE QUALITY BUCKETING (Wenzek et al., arXiv:1911.00359
    * §4.3): split each group's documents into head / middle / tail
    * TERCILES by an integer quality score (CCNet buckets by LM
    * perplexity per language; here any integer score column — e.g.
    * [[bigramLmScores]]' avg_prob_bp, higher = more fluent = head).
    * Training mixes then sample by bucket instead of hard-filtering.
    *
    * Exact percentiles WITHOUT a corpus sort: the per-(group, score)
    * HISTOGRAM is score-domain-sized (basis points: ≤10⁴ rows per
    * group), so the tercile thresholds come from a window over that
    * compact relation — never a window over the corpus (a per-language
    * corpus sort would put whole languages in single partitions: the
    * classic skew trap). Thresholds are "smallest score with cumulative
    * count ≥ ⌈n/3⌉ (resp. ⌈2n/3⌉)" — integer-deterministic, so engine
    * and oracle agree on every tie.
    *
    * One corpus evaluation: the planted repartition(group, score)
    * exchange feeds the histogram aggregate (which it exactly
    * satisfies), the threshold subtree, and the classify probe —
    * ReuseExchange collapses all three (same pattern as
    * corpusDupNgrams); the thresholds relation is group-count-sized and
    * broadcast. */
  def scoreTerciles(
      scored: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
      scoreCol: String, idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    // exactly (id, groups, score) and a histogram that counts the
    // (non-null) ID column: the histogram branch then needs the SAME
    // columns as the classify probe, so column pruning cannot give the
    // two branches divergent ReadSchemas under the planted exchange —
    // which is what decides whether the input evaluates once or twice
    // (count(id) == count(*) for a non-null id, which an id is)
    val anchored = scored
      .select((idCol +: groupCols :+ scoreCol).map(col): _*)
      .repartition((groupCols :+ scoreCol).map(col): _*)
    val hist = anchored.groupBy((groupCols :+ scoreCol).map(col): _*)
      .agg(count(col(idCol)).as("_c"))
    val cum = hist.withColumn("_cum",
      sum(col("_c")).over(Window.partitionBy(g: _*).orderBy(col(scoreCol))))
    val tot = hist.groupBy(g: _*).agg(sum(col("_c")).as("_n"))
    val thr = cum.join(tot, groupCols)
      .groupBy(g: _*)
      .agg(
        min(when(col("_cum") >= expr("(_n + 2) DIV 3"), col(scoreCol))).as("_t1"),
        min(when(col("_cum") >= expr("(2 * _n + 2) DIV 3"), col(scoreCol))).as("_t2"))
    anchored.join(broadcast(thr), groupCols)
      .withColumn("bucket",
        when(col(scoreCol) <= col("_t1"), "tail")
          .when(col(scoreCol) <= col("_t2"), "middle")
          .otherwise("head"))
      .drop("_t1", "_t2")
  }

  /** DSIR-STYLE IMPORTANCE WEIGHTS (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169): score
    * each candidate document by how much more likely its bigrams are under
    * a TARGET-domain language model than under the candidate pool's own
    * ("raw") model — the standard recipe for tilting a web-scale crawl
    * toward a curated target (Wikipedia, books) without hard filtering.
    * Selection then keeps the top-weighted documents (resampling ∝ weight;
    * deterministic top-k here so the result is oracle-exact).
    *
    * Weight per document = Σ over its bigram OCCURRENCES of
    * (bpₜ − bpₛ), where bp = c₂·10⁴ DIV c₁ is the integer basis-point
    * conditional frequency of the bigram under the target (t) and pool (s)
    * models; target-unseen bigrams contribute bpₜ = 0. All-integer
    * arithmetic — engine and oracle agree bit-exactly.
    *
    * Shape (100 TB): one corpus pass builds the positional bigrams (the
    * [[bigramLmScores]] lead-window shape, checkpointed and reused by
    * both models and the scoring join); the two LMs are vocabulary-sized
    * hash-aggregate relations joined back by term strings — map-side
    * combinable, never corpus-quadratic. The paper's production variant
    * hashes n-grams into a fixed 2²⁰-bucket table, capping LM size
    * independent of vocabulary (then the model relation broadcasts); the
    * string-keyed form here keeps the operator bit-exact against the
    * oracle. Final selection is top-k — TakeOrdered, not a corpus sort.
    *
    * Output per candidate (isTarget = false) doc with ≥ 1 bigram:
    * (idCol, n_bigrams, dsir_bp). */
  def dsirWeights(
      df: DataFrame, textCol: String, idCol: String,
      isTarget: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"), isTarget.as("tgt"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val big = toks.withColumn("t2", lead(col("t"), 1).over(w))
      .filter(col("t2").isNotNull)
      .select(col("id"), col("tgt"), col("t"), col("t2"))
      .localCheckpoint(false) // reused: target LM + pool LM + candidate scoring (lazy, round 19)
    val tgt = big.filter(col("tgt"))
    val pool = big.filter(!col("tgt"))
    val tc2 = tgt.groupBy(col("t"), col("t2")).agg(count(lit(1)).as("tc2"))
    val tc1 = tgt.groupBy(col("t")).agg(count(lit(1)).as("tc1"))
    val sc2 = pool.groupBy(col("t"), col("t2")).agg(count(lit(1)).as("sc2"))
    val sc1 = pool.groupBy(col("t")).agg(count(lit(1)).as("sc1"))
    pool
      .join(tc2, Seq("t", "t2"), "left")
      .join(tc1, Seq("t"), "left")
      .join(sc2, Seq("t", "t2"))
      .join(sc1, Seq("t"))
      .select(col("id"),
        (coalesce(expr("tc2 * 10000 DIV tc1"), lit(0L))
          - expr("sc2 * 10000 DIV sc1")).as("dbp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("dbp")).as("dsir_bp"))
      .select(col("id").as(idCol), col("n_bigrams"), col("dsir_bp"))
  }
}
