package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The RDF-term lexical form (RdfTerms.lex) as a native expression.
  *
  * `lex` is the hottest term operation in the engine: it sits in the
  * rdflib-parity result boundary of EVERY query's outermost SELECT, in
  * every string/numeric FILTER's coercion, and (since the §15.1 numeric
  * ordering) in every ORDER BY key over a string column. The Column form
  * is a 5-branch CaseWhen whose annotated branches each run a full-string
  * regex (`rlike` + `regexp_extract`, two compiled-regex passes per
  * match), and Catalyst's filter pushdown freely duplicates it into
  * predicates evaluated once per scanned row. This expression does one
  * left-to-right/right-to-left scan, no regex, no allocation on the bare
  * fast path (the overwhelmingly common case returns the input object).
  *
  * Exact parity with the encoded-form recognizers (RdfTerms.LangRe/DtRe,
  * verified by the expression fuzzers and the 161-query oracle):
  *   - not starting with '"'           → identity (bare value)
  *   - `"lex"@tag` where tag is [A-Za-z]+(-[A-Za-z0-9]+)* and the closing
  *     quote is the string's LAST '"' (the regex's greedy group) → lex
  *   - `"lex"^^<iri>` with '>' only at the end ('[^>]*' body), closing
  *     quote at the last `"^^<` occurrence → lex
  *   - anything else (including NULL)  → identity
  */
object RdfLex {

  /** One-pass lexical extraction; returns the INPUT OBJECT unchanged for
    * bare/unrecognized values so the common case allocates nothing. */
  def lex(u: UTF8String): UTF8String = {
    if (u.numBytes() == 0 || u.getByte(0) != '"') return u
    val s = u.toString
    val n = s.length
    // "lex"@tag — closing quote is the LAST '"' (greedy group), suffix
    // must be @ + alpha segment + (-alnum segment)*
    val q = s.lastIndexOf('"')
    if (q >= 1 && q + 2 < n && s.charAt(q + 1) == '@') {
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
      if (ok && i == n) return UTF8String.fromString(s.substring(1, q))
    }
    // "lex"^^<iri> — terminal '>', '[^>]*' body, closing quote at the
    // last `"^^<`
    if (n >= 5 && s.charAt(n - 1) == '>') {
      val k = s.lastIndexOf("\"^^<")
      if (k >= 1 && s.indexOf('>', k + 4) == n - 1)
        return UTF8String.fromString(s.substring(1, k))
    }
    u
  }

  case class RdfLexExpr(child: Expression) extends UnaryExpression {
    override def prettyName: String = "rdf_lex"
    override def dataType: DataType = child.dataType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${t.simpleString}")
    }

    override def nullSafeEval(s: Any): Any = lex(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.functions.RdfLex.lex($c);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def lex(c: Column): Column = Bridge.column(RdfLexExpr(Bridge.expression(c)))
}
