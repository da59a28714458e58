package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The RDF-term accessors (RdfTerms lex / langOf / datatypeOf) as native
  * single-scan expressions.
  *
  * `lex` is the hottest term operation in the engine: it sits in the
  * rdflib-parity result boundary of EVERY query's outermost SELECT, in
  * every string/numeric FILTER's coercion, and (since the §15.1 numeric
  * ordering) in every ORDER BY key over a string column; `datatypeOf`
  * backs isNumeric() and the numeric MIN/MAX/DATATYPE() paths. The
  * Column forms were CaseWhens whose annotated branches each ran
  * full-string compiled regexes (`rlike` + `regexp_extract`, two passes
  * per match; datatypeOf ran up to five), and Catalyst's filter pushdown
  * freely duplicates them into predicates evaluated once per scanned
  * row. These expressions do one left-to-right/right-to-left scan, no
  * regex, and no allocation on the bare fast path (lex of a bare value
  * returns the input object).
  *
  * Exact parity with the encoded-form recognizers (RdfTerms.LangRe/DtRe
  * and the Turtle shorthand shapes, verified by RdfLexFuzzSpec's
  * differential fuzz and the 163-query oracle):
  *   - `"lex"@tag` where tag is [A-Za-z]+(-[A-Za-z0-9]+)* and the closing
  *     quote is the string's LAST '"' (the regex's greedy group)
  *   - `"lex"^^<iri>` with '>' only at the end ('[^>]*' body), closing
  *     quote at the last `"^^<` occurrence
  *   - `"lex"` quoted-PLAIN (round 13, string literals) — checked after
  *     lang/dt, which never end in '"'
  *   - bare numeric/boolean shorthands per Turtle §2.5.2 (datatypeOf);
  *     bare NON-shorthands are IRIs since round 13 — LANG/DATATYPE
  *     type-error (null) on them
  */
object RdfLex {

  /** Index of the closing quote of a `"lex"@tag` encoding, or -1. */
  private def langClose(s: String): Int = {
    val n = s.length
    if (n == 0 || s.charAt(0) != '"') return -1
    val q = s.lastIndexOf('"')
    if (q < 1 || q + 2 >= n || s.charAt(q + 1) != '@') return -1
    var i = q + 2
    var ok = false
    while (i < n && ((s.charAt(i) >= 'A' && s.charAt(i) <= 'Z') ||
        (s.charAt(i) >= 'a' && s.charAt(i) <= 'z'))) { i += 1; ok = true }
    while (ok && i < n && s.charAt(i) == '-') {
      i += 1
      var seg = false
      while (i < n && ((s.charAt(i) >= 'A' && s.charAt(i) <= 'Z') ||
          (s.charAt(i) >= 'a' && s.charAt(i) <= 'z') ||
          (s.charAt(i) >= '0' && s.charAt(i) <= '9'))) { i += 1; seg = true }
      ok = seg
    }
    if (ok && i == n) q else -1
  }

  /** Index of the closing quote of a `"lex"^^<iri>` encoding, or -1. */
  private def dtClose(s: String): Int = {
    val n = s.length
    if (n < 5 || s.charAt(0) != '"' || s.charAt(n - 1) != '>') return -1
    val k = s.lastIndexOf("\"^^<")
    if (k >= 1 && s.indexOf('>', k + 4) == n - 1) k else -1
  }

  /** One-pass lexical extraction; returns the INPUT OBJECT unchanged for
    * bare/unrecognized values so the common case allocates nothing.
    * Round 13: quoted-PLAIN encodings (`"lex"`, no suffix — string
    * literals) strip their outer quotes; the check order (lang → dt →
    * plain) mirrors the encoders' injectivity argument: a lang form ends
    * in a tag character and a dt form in '>', never in '"'. */
  def lex(u: UTF8String): UTF8String = {
    if (u.numBytes() == 0 || u.getByte(0) != '"') return u
    val s = u.toString
    val q = langClose(s)
    if (q >= 0) return UTF8String.fromString(s.substring(1, q))
    val k = dtClose(s)
    if (k >= 0) return UTF8String.fromString(s.substring(1, k))
    if (s.length >= 2 && s.charAt(s.length - 1) == '"')
      return UTF8String.fromString(s.substring(1, s.length - 1))
    u
  }

  /** §17.4.2.2 LANG: the tag; "" for any untagged LITERAL (quoted-plain,
    * typed, or bare shorthand); null (type error) for blank nodes and —
    * round 13 — for bare IRIs, per the spec's literal-only domain. */
  def langOf(u: UTF8String): UTF8String = {
    val s = u.toString
    if (s.startsWith("_:")) return null
    val q = langClose(s)
    if (q >= 0) return UTF8String.fromString(s.substring(q + 2))
    if (s.length >= 2 && s.charAt(0) == '"' &&
        (s.charAt(s.length - 1) == '"' || dtClose(s) >= 0))
      return UTF8String.EMPTY_UTF8
    if (s.length >= 1 && s.charAt(0) != '"' && shapeDt(s) != null)
      return UTF8String.EMPTY_UTF8
    null // bare IRI (or malformed quoted form) — type error
  }

  // Turtle §2.5.2 shorthand shapes, hand-parsed (parity with
  // RdfTerms.IntShape/DecShape/DblShape)
  private def digits(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
    i - from
  }

  /** xsd datatype implied by a BARE lexical's shape; null for "none of
    * the shorthands" (caller renders xsd:string). */
  private def shapeDt(s: String): String = {
    val n = s.length
    if (s == "true" || s == "false") return graft.RdfTerms.XsdBoolean
    var i = if (n > 0 && (s.charAt(0) == '+' || s.charAt(0) == '-')) 1 else 0
    val d1 = digits(s, i)
    i += d1
    if (i == n) return if (d1 > 0) graft.RdfTerms.XsdInteger else null
    if (s.charAt(i) == '.') {
      // decimal: \d*\.\d+ END; double mantissa may continue with [eE]
      val d2 = digits(s, i + 1)
      i += 1 + d2
      if (i == n) return if (d2 > 0) graft.RdfTerms.XsdDecimal else null
      // fall through to exponent check: (\d+\.\d* | \.\d+)[eE]…
      if (d1 == 0 && d2 == 0) return null
    } else if (d1 == 0) return null
    if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      i += 1
      if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      val de = digits(s, i)
      if (de > 0 && i + de == n) return graft.RdfTerms.XsdDouble
    }
    null
  }

  /** §17.4.2.7 DATATYPE as an IRI string: rdf:langString for tagged, the
    * annotation for typed, xsd:string for quoted-plain, the shape
    * datatype for bare shorthands; null (type error) for blank nodes
    * and — round 13 — for bare IRIs. NULL-ness of this function is
    * exactly the "not a literal" predicate (RdfTerms.isIri/isLiteral
    * build on it). */
  def datatypeOf(u: UTF8String): UTF8String = {
    val s = u.toString
    if (s.startsWith("_:")) return null
    if (langClose(s) >= 0)
      return UTF8String.fromString(graft.RdfTerms.RdfLangString)
    val k = dtClose(s)
    if (k >= 0) return UTF8String.fromString(s.substring(k + 4, s.length - 1))
    if (s.length >= 2 && s.charAt(0) == '"' && s.charAt(s.length - 1) == '"')
      return UTF8String.fromString(graft.RdfTerms.XsdString)
    if (s.length >= 1 && s.charAt(0) == '"') return null // malformed quote form
    val shape = shapeDt(s)
    if (shape != null) UTF8String.fromString(shape) else null // bare IRI
  }

  /** The TERM encoding of a constructed simple literal (round 13): the
    * same shape-normalization the Turtle loader and the query parser
    * apply — shorthand-shaped text stays bare (it IS the numeric/boolean
    * term), anything else quotes. Exactly
    * `RdfTerms.encodeTyped(l, RdfTerms.shapeDatatype(l))`, as one scan. */
  def encodeSimple(u: UTF8String): UTF8String = {
    val s = u.toString
    if (shapeDt(s) != null) u
    else UTF8String.fromString("\"" + s + "\"")
  }

  abstract class TermUnary extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${t.simpleString}")
    }
  }

  case class RdfLexExpr(child: Expression) extends TermUnary {
    override def prettyName: String = "rdf_lex"
    override def dataType: DataType = child.dataType
    override def nullSafeEval(s: Any): Any = lex(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.functions.RdfLex.lex($c);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class RdfLangExpr(child: Expression) extends TermUnary {
    override def prettyName: String = "rdf_lang"
    override def nullable: Boolean = true // blank node → type error
    override def nullSafeEval(s: Any): Any = langOf(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
         |${ev.value} = graft.functions.RdfLex.langOf($c);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class RdfDatatypeExpr(child: Expression) extends TermUnary {
    override def prettyName: String = "rdf_datatype"
    override def nullable: Boolean = true // blank node → type error
    override def nullSafeEval(s: Any): Any = datatypeOf(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
         |${ev.value} = graft.functions.RdfLex.datatypeOf($c);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class RdfEncodeSimpleExpr(child: Expression) extends TermUnary {
    override def prettyName: String = "rdf_encode_simple"
    override def nullSafeEval(s: Any): Any =
      encodeSimple(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.functions.RdfLex.encodeSimple($c);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def lex(c: Column): Column = Bridge.column(RdfLexExpr(Bridge.expression(c)))
  def encodeSimple(c: Column): Column =
    Bridge.column(RdfEncodeSimpleExpr(Bridge.expression(c)))
  def langOf(c: Column): Column =
    Bridge.column(RdfLangExpr(Bridge.expression(c)))
  def datatypeOf(c: Column): Column =
    Bridge.column(RdfDatatypeExpr(Bridge.expression(c)))
}
