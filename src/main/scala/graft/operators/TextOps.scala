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
}
