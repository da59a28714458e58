package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Crawl text mixes precomposed and decomposed forms ("é" as U+00E9 vs
  * e + U+0301): without canonical normalization, exact dedup hashes,
  * shingles, and tokenizers treat identical text as distinct — so NFC is
  * standard pipeline hygiene immediately after HTML extraction. Spark has
  * no built-in for it; a Scala UDF would pay serialization per row, so
  * this is a Catalyst `UnaryExpression` with `doGenCode`: the generated
  * code stays inside whole-stage codegen and takes a zero-allocation
  * fast path when the value is already normalized
  * (`Normalizer.isNormalized` is a cheap scan that succeeds for the
  * overwhelmingly-ASCII common case).
  *
  * NFC (not NFKC) deliberately: canonical composition is lossless;
  * compatibility folding (ﬁ→fi, ²→2) changes content and belongs in an
  * explicit cleaning step, not default hygiene. Oracle parity: DuckDB's
  * `nfc_normalize` implements the same UAX #15 form.
  */
object UnicodeNorm {

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def prettyName: String = "nfc_normalize"
    override def dataType: DataType = child.dataType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${t.simpleString}")
    }

    override def nullSafeEval(s: Any): Any = {
      val str = s.asInstanceOf[UTF8String].toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val js = ctx.freshName("jstr")
        s"""
           |String $js = $c.toString();
           |${ev.value} = java.text.Normalizer.isNormalized(
           |    $js, java.text.Normalizer.Form.NFC)
           |  ? $c
           |  : org.apache.spark.unsafe.types.UTF8String.fromString(
           |      java.text.Normalizer.normalize($js, java.text.Normalizer.Form.NFC));
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** nfc(text): UAX #15 canonical composition of a string column. */
  def nfc(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
}
