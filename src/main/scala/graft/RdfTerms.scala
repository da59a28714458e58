package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lexical encoding for RDF terms with language tags / datatype IRIs.
  *
  * The quads table stores every term as ONE string column (SURVEY.md
  * §1.2): IRIs bare, plain literals bare, blank nodes `_:{scope}-{n}`.
  * That matches the reference's user-visible stringification exactly —
  * rdflib's `str(term)` drops tags and datatypes at the result boundary
  * (reference: mortar-parquet-client/client.py:43,53) — but the store
  * UNDERNEATH (oxigraph via the OxSled rdflib store) keeps `"x"@en` and
  * `"x"` as distinct terms: a BGP constant `"x"@en` matches only the
  * tagged one, and DISTINCT counts them separately. Dropping annotations
  * at LOAD time (the pre-round-11 behavior) conflated them too early.
  *
  * Encoding (round 11): a literal that carries an annotation keeps it,
  * N-Triples style, inside the stored string —
  *
  *   - `"chat"@en`                      language-tagged literal
  *   - `"P1Y"^^<http://…#duration>`     datatype IRI the lexical shape
  *                                      cannot reconstruct
  *
  * while everything RECONSTRUCTIBLE stays bare, exactly as before: plain
  * string literals, and typed literals whose datatype equals their
  * Turtle-shorthand shape (`"5"^^xsd:integer` ≡ shorthand `5` — both
  * store as `5`; [[shapeDatatype]] recovers xsd:integer). So loading
  * unannotated data produces byte-identical tables to every prior round,
  * and `sameTerm`/BGP joins get true term identity for tagged literals
  * free of charge (codepoint equality of the encoding IS term equality).
  *
  * The rdflib-parity boundary: [[lex]] strips the annotation, applied
  * ONCE at the outermost SELECT projection (BgpPlanner.finish) — after
  * DISTINCT/ORDER BY, which per §18.5 operate on TERMS — mirroring where
  * the reference's `str()` sits (client.py:43).
  *
  * Encoding (round 13): string literals are ALWAYS quoted — a plain /
  * xsd:string literal stores as `"chat"` (no suffix) — so the bare
  * namespace holds ONLY IRIs, numeric/boolean Turtle shorthands, and
  * `_:` blank nodes, and those three never collide (an absolute IRI
  * cannot match a shorthand shape). This removes the long-documented
  * IRI/plain-literal conflation: `isIRI`/`isLiteral` are now decidable
  * from the stored bytes, and LANG/DATATYPE type-error (NULL) on IRIs
  * per §17.4.2. The one remaining (deliberate) normalization: shorthand
  * numerics store bare, so `"5"^^xsd:integer` ≡ shorthand `5` — both
  * bare — while the STRING five is the distinct term `"5"`.
  */
object RdfTerms {

  val XsdNs = "http://www.w3.org/2001/XMLSchema#"
  val XsdString: String = XsdNs + "string"
  val XsdInteger: String = XsdNs + "integer"
  val XsdDecimal: String = XsdNs + "decimal"
  val XsdDouble: String = XsdNs + "double"
  val XsdBoolean: String = XsdNs + "boolean"
  val RdfLangString = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

  // Turtle-shorthand lexical shapes (Turtle §2.5.2 INTEGER/DECIMAL/DOUBLE)
  private val IntShape = "[+-]?\\d+"
  private val DecShape = "[+-]?\\d*\\.\\d+"
  private val DblShape = "[+-]?(?:\\d+\\.?\\d*|\\.\\d+)[eE][+-]?\\d+"

  /** Encoded-form recognizers. `(?s)` because a lexical may span lines;
    * the greedy `(.*)` runs to the LAST quote that is followed by a
    * well-formed suffix, so internal quotes in the lexical are safe. */
  val LangRe: String = "(?s)\\A\"(.*)\"@([A-Za-z]+(?:-[A-Za-z0-9]+)*)\\z"
  val DtRe: String = "(?s)\\A\"(.*)\"\\^\\^<([^>]*)>\\z"

  /** Datatype the bare encoding implies — mirrors Turtle's numeric/
    * boolean shorthands; anything else reads as xsd:string (or an IRI,
    * the documented conflation). */
  def shapeDatatype(lexical: String): String =
    if (lexical.matches(IntShape)) XsdInteger
    else if (lexical.matches(DecShape)) XsdDecimal
    else if (lexical.matches(DblShape)) XsdDouble
    else if (lexical == "true" || lexical == "false") XsdBoolean
    else XsdString

  /** Encode a language-tagged literal (always annotated — a tag is never
    * reconstructible from the lexical). The tag is lowercase-normalized
    * (round 12): RDF 1.1 §3.3 compares language tags case-insensitively
    * for literal term equality (BCP 47 tags are case-insensitive), and
    * this store's term identity IS codepoint equality of the encoding —
    * so `"xyz"@EN` and `"xyz"@en` must encode identically to be one
    * term (W3C open-eq-07 family). Lowercasing at every entry point
    * (Turtle load, query constants, STRLANG) is the normalization
    * oxigraph/Jena apply on parse; LANG() consequently reports the
    * lowercase form, which LANGMATCHES treats case-insensitively. */
  def encodeLang(lexical: String, tag: String): String =
    "\"" + lexical + "\"@" + tag.toLowerCase(java.util.Locale.ROOT)

  /** Encode a simple / xsd:string literal (round 13): quoted, N-Triples
    * style without a suffix — `"chat"` — so a string literal is never
    * byte-equal to the bare IRI with the same characters. This is what
    * makes isIRI/isLiteral decidable and LANG/DATATYPE type-errors on
    * IRIs possible (the round-12 ledger's last semantic wart).
    *
    * Round 14 (ADVICE r13): a SHORTHAND-SHAPED lexical normalizes
    * through [[shapeDatatype]] exactly like a Turtle/query plain
    * literal does, so `"5"^^xsd:string` and plain `"5"` encode to the
    * SAME stored bytes (the bare numeric term `5`) — RDF 1.1 §3.3 makes
    * them one term, and term identity here IS codepoint equality, so
    * the two surface spellings must not produce different terms (BGP
    * joins / DISTINCT / sameTerm all depend on it). This is the
    * documented numeric-shape conflation, applied consistently at every
    * literal entry point rather than at all but one.
    *
    * Conflation ledger (the deliberate residue): a shorthand-shaped
    * STRING five is indistinguishable from the INTEGER five in the
    * store. Consequently DATATYPE("5"^^xsd:string) answers xsd:integer,
    * and STRLANG("5","en") / STRDT("5", xsd:byte) type-error (the bare
    * term fails the simple-literal test) where the spec accepts the
    * simple literal "5" — the W3cConformanceSpec skip ledger carries
    * the row. Non-shorthand lexicals (the overwhelming majority of real
    * strings) are exact. */
  def encodePlain(lexical: String): String =
    if (shapeDatatype(lexical) == XsdString) "\"" + lexical + "\""
    else lexical

  /** Encode a typed literal: xsd:string → the plain-literal shape rule
    * ([[encodePlain]] — quoted unless shorthand-shaped, round 14); bare
    * iff the shape already says the datatype (round-trips through
    * [[shapeDatatype]] — numeric/boolean Turtle shorthands); annotated
    * otherwise. A BARE stored value is therefore either a
    * numeric/boolean shorthand literal or an IRI (blank nodes keep
    * `_:`) — and the two never collide, because an absolute IRI cannot
    * match a shorthand shape. */
  def encodeTyped(lexical: String, dt: String): String =
    if (dt == XsdString) encodePlain(lexical)
    else if (dt == shapeDatatype(lexical)) lexical
    else "\"" + lexical + "\"^^<" + dt + ">"

  // ------------------------------------------------------------------
  // Column forms — pure built-in expressions (startswith guard first, so
  // the overwhelmingly-common bare value never reaches a regex).
  // ------------------------------------------------------------------

  private def quoted(c: Column): Column = c.startsWith("\"")

  def isAnnotated(c: Column): Column =
    quoted(c) && (c.rlike(LangRe) || c.rlike(DtRe))

  /** Quoted-PLAIN recognizer (round 13): `"lex"` with no suffix. The
    * endsWith check suffices to exclude the annotated forms — a lang
    * encoding ends in a tag character and a datatype encoding in '>',
    * never in the closing quote. */
  def isPlain(c: Column): Column =
    quoted(c) && c.endsWith("\"") && length(c) >= 2

  /** The lexical inside a quoted-plain encoding (caller guarantees
    * [[isPlain]]). */
  private def stripPlain(c: Column): Column = c.substr(lit(2), length(c) - 2)

  /** Scala-side lexical extraction (the static mirror of [[lex]]) — for
    * parser-held strings that compile into LEXICAL positions (regex
    * patterns, CONTAINS needles, GROUP_CONCAT separators). */
  def lexicalOf(s: String): String =
    graft.functions.RdfLex.lex(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  /** §17.4.1.1 isIRI (round 13): not a blank node and not any literal
    * form. [[datatypeOf]] is NULL exactly for IRIs and blank nodes, so
    * one native scan decides. */
  def isIri(c: Column): Column =
    datatypeOf(c).isNull && !c.startsWith("_:")

  /** §17.4.1.3 isLiteral (round 13): any term with a datatype — quoted
    * (plain/tagged/typed) or bare numeric/boolean shorthand. */
  def isLiteral(c: Column): Column = datatypeOf(c).isNotNull

  /** The lexical form — §17.4.2.1 STR, and the rdflib `str()` result
    * boundary. Identity on bare values (including NULL). Native
    * single-scan expression (round 12): the CaseWhen+regex Column form
    * ran two compiled-regex passes per annotated check and was freely
    * duplicated by filter pushdown into per-row predicates — lex sits in
    * every query's result boundary, every FILTER coercion, and every
    * ORDER BY key, so it must be a cheap scan (see
    * [[graft.functions.RdfLex]] for the parity contract). */
  def lex(c: Column): Column = graft.functions.RdfLex.lex(c)

  /** §17.4.2.2 LANG: the tag, "" for any untagged literal. Blank nodes
    * are a type error → NULL. (Bare IRIs read "" — the documented
    * IRI/plain-literal conflation.) Native single-scan expression
    * (round 12, same rationale and parity contract as [[lex]]). */
  def langOf(c: Column): Column = graft.functions.RdfLex.langOf(c)

  /** §17.4.2.7 DATATYPE as an IRI string: rdf:langString for tagged,
    * the annotation for typed, the shape datatype for bare. Blank nodes
    * → NULL (type error). Native single-scan expression (round 12) —
    * the Column form ran up to five full-string regexes per row, and
    * isNumeric() evaluates this in FILTER predicates. */
  def datatypeOf(c: Column): Column = graft.functions.RdfLex.datatypeOf(c)

  /** Every xsd numeric datatype of the §17.3 operand lattice —
    * integer/decimal/double/float plus all the integer-derived subtypes
    * XPath promotes through them. Shared by isNUMERIC (§17.4.4) and the
    * round-14 per-row comparison dispatch. */
  val NumericDatatypes: Seq[String] = Seq(
    "integer", "decimal", "double", "float",
    "byte", "short", "int", "long", "negativeInteger",
    "positiveInteger", "nonNegativeInteger", "nonPositiveInteger",
    "unsignedByte", "unsignedShort", "unsignedInt", "unsignedLong")
    .map(XsdNs + _)

  /** True iff the term is a literal of a NUMERIC datatype with a
    * castable lexical form — the per-row operand test behind isNUMERIC
    * and the round-14 promotion dispatch (two numeric terms of ANY xsd
    * subtype compare by VALUE, promoted through double, per §17.3 +
    * the XPath promotion lattice). NULL-in → NULL-out. */
  def isNumericTerm(c: Column): Column =
    datatypeOf(c).isin(NumericDatatypes: _*) &&
      lex(c).try_cast("double").isNotNull

  /** The integer-DERIVED subset of [[NumericDatatypes]] — xsd:integer
    * and everything XPath derives from it (no decimal/float/double).
    * §17.3 says integer/integer comparison is exact; promoting through
    * double (the general lattice path) silently rounds past 2^53, so
    * the round-15 dispatch routes integer/integer pairs through
    * decimal(38,0) instead. */
  val IntegerDatatypes: Seq[String] = Seq(
    "integer", "byte", "short", "int", "long", "negativeInteger",
    "positiveInteger", "nonNegativeInteger", "nonPositiveInteger",
    "unsignedByte", "unsignedShort", "unsignedInt", "unsignedLong")
    .map(XsdNs + _)

  /** True iff the term is an integer-derived numeric literal whose
    * lexical form fits decimal(38,0) — the round-15 exact-comparison
    * guard: when BOTH operands pass, comparison runs on decimal(38,0)
    * values (exact to 38 digits, covering the full 2^63 lexical range
    * and far beyond); otherwise the pair falls to the double-promoted
    * path, whose 2^53 rounding bound then only applies to mixes that
    * genuinely involve a floating/decimal operand (documented next to
    * the 2^63 BIND-arithmetic wrap). A >38-digit integer fails the
    * cast → falls back to double, degrading gracefully rather than
    * erroring. NULL-in → NULL-out. */
  def isIntegerTerm(c: Column): Column =
    datatypeOf(c).isin(IntegerDatatypes: _*) &&
      lex(c).try_cast("decimal(38,0)").isNotNull

  /** §17.4.2.5 STRLANG: tag a SIMPLE literal — in the round-13 encoding
    * exactly the quoted-plain terms; an IRI, blank node, shorthand-typed
    * or already-annotated input is a type error → NULL (the spec's
    * simple-literal domain, now actually checkable). The tag lowercases
    * like [[encodeLang]], so constructed terms join stored ones. */
  def strLang(c: Column, tag: Column): Column =
    when(isPlain(c) && tag.rlike("\\A[A-Za-z]+(?:-[A-Za-z0-9]+)*\\z"),
      concat(lit("\""), stripPlain(c), lit("\"@"), lower(tag)))

  /** §17.4.2.6 STRDT: type a SIMPLE literal (quoted-plain input, as
    * [[strLang]]); normalizes exactly like [[encodeTyped]] so
    * constructed terms join stored ones — xsd:string keeps the
    * quoted-plain form, a shape-matching numeric datatype goes bare,
    * anything else annotates. */
  def strDt(c: Column, dt: Column): Column = {
    val l = stripPlain(c)
    val shape =
      when(l.rlike("\\A" + IntShape + "\\z"), lit(XsdInteger))
        .when(l.rlike("\\A" + DecShape + "\\z"), lit(XsdDecimal))
        .when(l.rlike("\\A" + DblShape + "\\z"), lit(XsdDouble))
        .when(l.isin("true", "false"), lit(XsdBoolean))
        .otherwise(lit(XsdString))
    when(isPlain(c),
      when(lit(XsdString) === dt, c)
        .when(shape === dt, l)
        .otherwise(concat(lit("\""), l, lit("\"^^<"), dt, lit(">"))))
  }

  /** §17.4.3.1 LANGMATCHES = RFC 4647 basic filtering: "*" matches any
    * non-empty tag; otherwise case-insensitive equality or a
    * hyphen-boundary prefix ("en" matches "en-GB", not "enx"). */
  def langMatches(lang: Column, range: Column): Column =
    when(range === "*", lang =!= "")
      .otherwise(lower(lang) === lower(range) ||
        lower(lang).startsWith(concat(lower(range), lit("-"))))
}
