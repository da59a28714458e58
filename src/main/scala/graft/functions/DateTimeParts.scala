package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass xsd:dateTime component extraction as a native expression.
  *
  * SPARQL's §17.4.5 accessors (YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS/TZ)
  * read the literal's OWN lexical clock — a timestamp cast would shift
  * into the session zone — so they are string surgery, not time math.
  * Compiling each accessor as separate column algebra re-ran the shape
  * validation per accessor per row: the regex form paid 14 full regex
  * passes for q154's seven accessors (1.4 s for a metadata-scale query),
  * and the round-12 positional-substring rewrite measured WORSE (2.3 s vs
  * 1.6 s back-to-back — more, smaller ops, same per-accessor repetition).
  *
  * This expression parses the lexical ONCE into a
  * struct<YEAR,…,TZ: string> with a single hand-rolled scan (no regex),
  * and each accessor compiles to a `getField` of the SAME child
  * expression — whole-stage codegen's subexpression elimination then
  * evaluates the parse once per row across all projected accessors.
  *
  * Grammar (exactly the previous shape guard):
  * `-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?`
  * Non-matching lexicals → NULL struct → every accessor NULL (= unbound,
  * SPARQL's type-error rule). Components render canonically: integer
  * fields lose leading zeros ("09" → "9", year "-0045" → "-45" matching
  * the long-cast rendering), SECONDS is xsd:decimal-canonical (integral →
  * integer lexical, else the double's shortest form), TZ is the
  * designator verbatim or "" when absent (§17.4.5.8). A year beyond
  * Long range returns NULL (documented boundary; the previous cast would
  * have raised under ANSI).
  */
object DateTimeParts {

  private val fieldNames =
    Array("YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS", "TZ")

  val schema: StructType =
    StructType(fieldNames.map(StructField(_, StringType, nullable = true)))

  /** Validate + extract in one left-to-right scan. Returns null when the
    * lexical doesn't match the grammar. */
  def parse(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    var i = if (n > 0 && s.charAt(0) == '-') 1 else 0
    val yStart = 0
    val yDigits = i
    while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
    if (i - yDigits < 4) return null
    val yEnd = i
    // fixed-width tail: -MM-DDTHH:MM:SS
    def d2(at: Int): Boolean = at + 1 < n &&
      s.charAt(at) >= '0' && s.charAt(at) <= '9' &&
      s.charAt(at + 1) >= '0' && s.charAt(at + 1) <= '9'
    if (i + 15 > n) return null
    if (s.charAt(i) != '-' || !d2(i + 1)) return null
    val mo = i + 1
    if (s.charAt(i + 3) != '-' || !d2(i + 4)) return null
    val da = i + 4
    if (s.charAt(i + 6) != 'T' || !d2(i + 7)) return null
    val hh = i + 7
    if (s.charAt(i + 9) != ':' || !d2(i + 10)) return null
    val mi = i + 10
    if (s.charAt(i + 12) != ':' || !d2(i + 13)) return null
    val seStart = i + 13
    i += 15
    // optional fraction
    if (i < n && s.charAt(i) == '.') {
      i += 1
      val fStart = i
      while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      if (i == fStart) return null // bare dot
    }
    val seEnd = i
    // optional timezone designator, then end-of-string
    val tz =
      if (i == n) ""
      else if (s.charAt(i) == 'Z' && i + 1 == n) "Z"
      else if ((s.charAt(i) == '+' || s.charAt(i) == '-') && i + 6 == n &&
          d2(i + 1) && s.charAt(i + 3) == ':' && d2(i + 4))
        s.substring(i)
      else return null

    val year =
      try java.lang.Long.parseLong(s.substring(yStart, yEnd)).toString
      catch { case _: NumberFormatException => return null }
    def num2(at: Int): String =
      Integer.parseInt(s.substring(at, at + 2)).toString
    val secD = java.lang.Double.parseDouble(s.substring(seStart, seEnd))
    val sec = if (secD % 1 == 0) secD.toLong.toString else secD.toString

    new GenericInternalRow(Array[Any](
      UTF8String.fromString(year), UTF8String.fromString(num2(mo)),
      UTF8String.fromString(num2(da)), UTF8String.fromString(num2(hh)),
      UTF8String.fromString(num2(mi)), UTF8String.fromString(sec),
      UTF8String.fromString(tz)))
  }

  case class XsdDateTimeParts(child: Expression) extends UnaryExpression {
    override def prettyName: String = "xsd_datetime_parts"
    override def dataType: DataType = schema
    // a well-shaped input still yields null on year overflow, so the
    // expression is nullable regardless of the child
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${t.simpleString}")
    }

    override def nullSafeEval(s: Any): Any = parse(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
           |  graft.functions.DateTimeParts.parse($c);
           |${ev.isNull} = ${ev.value} == null;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** parts(lexical): struct of the seven accessor components, NULL when
    * the lexical is not an xsd:dateTime shape. */
  def parts(c: Column): Column = Bridge.column(XsdDateTimeParts(Bridge.expression(c)))
}
