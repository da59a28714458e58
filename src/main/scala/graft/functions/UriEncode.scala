package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** XPath `fn:encode-for-uri` (SPARQL 1.1 §17.4.3.10 ENCODE_FOR_URI) as a
  * native codegen'd expression.
  *
  * Percent-encodes every octet of the UTF-8 form EXCEPT the RFC 3986
  * unreserved set `A-Z a-z 0-9 - _ . ~`, with UPPERCASE hex digits —
  * the exact fn:encode-for-uri contract (reference behavior:
  * oxigraph evaluates this builtin for the reference client,
  * /root/reference/mortar-parquet-client/client.py:42). This is NOT
  * `java.net.URLEncoder` (form encoding: space→'+', '*' kept) and not
  * Spark's `url_encode` (same form-encoding semantics), so neither
  * built-in is usable; a Scala UDF would leave whole-stage codegen.
  * The expression inlines the byte loop into generated Java — branch-
  * free per byte for the ASCII-unreserved common case.
  */
object UriEncode {

  private final val Hex = "0123456789ABCDEF"

  /** Interpreted path (also the spec's executable definition). */
  def encode(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
          (b >= '0' && b <= '9') ||
          b == '-' || b == '_' || b == '.' || b == '~') sb.append(b.toChar)
      else {
        sb.append('%')
        sb.append(Hex.charAt(b >>> 4))
        sb.append(Hex.charAt(b & 0xf))
      }
      i += 1
    }
    sb.toString
  }

  case class EncodeForUri(child: Expression) extends UnaryExpression {
    override def prettyName: String = "encode_for_uri"
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${t.simpleString}")
    }

    override def nullSafeEval(s: Any): Any =
      UTF8String.fromString(encode(s.asInstanceOf[UTF8String].toString))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val bytes = ctx.freshName("bytes")
        val sb = ctx.freshName("sb")
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        s"""
           |byte[] $bytes = $c.toString().getBytes(
           |    java.nio.charset.StandardCharsets.UTF_8);
           |java.lang.StringBuilder $sb =
           |    new java.lang.StringBuilder($bytes.length);
           |for (int $i = 0; $i < $bytes.length; $i++) {
           |  int $b = $bytes[$i] & 0xff;
           |  if (($b >= 'A' && $b <= 'Z') || ($b >= 'a' && $b <= 'z') ||
           |      ($b >= '0' && $b <= '9') ||
           |      $b == '-' || $b == '_' || $b == '.' || $b == '~') {
           |    $sb.append((char) $b);
           |  } else {
           |    $sb.append('%');
           |    $sb.append("0123456789ABCDEF".charAt($b >>> 4));
           |    $sb.append("0123456789ABCDEF".charAt($b & 0xf));
           |  }
           |}
           |${ev.value} =
           |    org.apache.spark.unsafe.types.UTF8String.fromString($sb.toString());
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** encodeForUri(text): fn:encode-for-uri percent-encoding. */
  def encodeForUri(c: Column): Column =
    Bridge.column(EncodeForUri(Bridge.expression(c)))
}
