package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level differential fuzz for the native term expressions that
  * replaced regex column algebra in round 12 — the parity contract is
  * "exactly the old recognizers", so the reference here IS the old
  * regex implementation, evaluated in plain Scala (no Spark needed).
  *
  * The ExprFuzzSpec end-to-end fuzzers pin the Spark plumbing but their
  * value pools deliberately contain no quotes or annotation syntax;
  * this suite aims generators straight at the encoding's tricky region:
  * lexicals containing quotes / '@' / '^^<', malformed tags, annotated
  * forms nested in annotated-looking text. */
class RdfLexFuzzSpec extends AnyFunSuite {

  /** The Column-recognizer semantics as Scala regexes: the round-12
    * LangRe/DtRe contract plus round 13's quoted-plain rule (checked
    * last, exactly the native order — a plain form can't also match
    * lang/dt because those never END in '"'). */
  private def refLex(s: String): String = {
    if (s == null) return null
    val lang = RdfTerms.LangRe.r
    val dt = RdfTerms.DtRe.r
    if (!s.startsWith("\"")) s
    else s match {
      case lang(l, _) => l
      case _ => s match {
        case dt(l, _) => l
        case _ =>
          if (s.length >= 2 && s.endsWith("\"")) s.substring(1, s.length - 1)
          else s
      }
    }
  }

  private def nativeLex(s: String): String = {
    if (s == null) return null // the expression layer handles null-in
    val r = graft.functions.RdfLex.lex(UTF8String.fromString(s))
    if (r == null) null else r.toString
  }

  test("RdfLex == the LangRe/DtRe regex reference on adversarial strings") {
    // fragments chosen to build every boundary shape: bare, tagged,
    // typed, quotes inside lexicals, fake suffixes, multiline lexicals
    val frag = Gen.oneOf("", "a", "ab", "\"", "\"\"", "@", "@en", "@EN-gb",
      "@e n", "@-x", "@en-", "^^<t>", "^^<", ">", "<", "^^<urn:t#k>",
      "chat", "\"x\"@en", "\"y\"^^<urn:q>", "\n", "line\nbreak", "é漢",
      "5", "-3.2", "_:b0", "urn:ex#iri")
    val gen = for {
      n <- Gen.choose(1, 5)
      parts <- Gen.listOfN(n, frag)
    } yield parts.mkString
    val cases = (1 to 600).flatMap { i =>
      gen(Gen.Parameters.default, Seed(88000L + i))
    }
    assert(cases.size >= 550)
    // plus the canonical constructions over random lexicals (tags both
    // cases to cover the encoder's lowercase normalization downstream)
    val canonical = cases.take(150).flatMap { l =>
      Seq("\"" + l + "\"@en", "\"" + l + "\"@EN-GB",
        "\"" + l + "\"^^<urn:t#x>", "\"" + l + "\"^^<>")
    }
    (cases ++ canonical).foreach { s =>
      assert(nativeLex(s) == refLex(s),
        s"lex mismatch on ${s.replace("\n", "\\n")}: " +
          s"native=${nativeLex(s)} reference=${refLex(s)}")
    }
    assert(nativeLex(null) == null)
  }

  test("RdfLex.langOf / datatypeOf == the regex references on adversarial strings") {
    // the pre-round-12 Column semantics, verbatim as Scala regexes
    val lang = RdfTerms.LangRe.r
    val dt = RdfTerms.DtRe.r
    // round-13 semantics: LITERALS answer (quoted plain/tagged/typed,
    // bare shorthands); bare IRIs, blank nodes, and malformed quote
    // forms are type errors (null)
    def shapeOf(s: String): String =
      if (s.matches("[+-]?\\d+")) RdfTerms.XsdInteger
      else if (s.matches("[+-]?\\d*\\.\\d+")) RdfTerms.XsdDecimal
      else if (s.matches("[+-]?(?:\\d+\\.?\\d*|\\.\\d+)[eE][+-]?\\d+"))
        RdfTerms.XsdDouble
      else if (s == "true" || s == "false") RdfTerms.XsdBoolean
      else null
    def plain(s: String): Boolean =
      s.length >= 2 && s.startsWith("\"") && s.endsWith("\"")
    def refLang(s: String): String =
      if (s.startsWith("_:")) null
      else if (s.startsWith("\"")) s match {
        case lang(_, t) => t
        case dt(_, _) => ""
        case _ => if (plain(s)) "" else null
      }
      else if (shapeOf(s) != null) ""
      else null
    def refDatatype(s: String): String =
      if (s.startsWith("_:")) null
      else s match {
        case lang(_, _) => RdfTerms.RdfLangString
        case dt(_, d) => d
        case _ =>
          if (plain(s)) RdfTerms.XsdString
          else if (s.startsWith("\"")) null // malformed quote form
          else shapeOf(s) // null = bare IRI (type error)
      }
    def nat(f: UTF8String => UTF8String, s: String): String = {
      val r = f(UTF8String.fromString(s))
      if (r == null) null else r.toString
    }
    val frag = Gen.oneOf("", "a", "\"", "@en", "@EN-gb", "@e n", "@en-",
      "^^<t>", "^^<", ">", "\"x\"@en", "\"y\"^^<urn:q>", "_:b0", "_:",
      "5", "+5", "-5", "5.", ".5", "5.25", "-0.5", "1e5", "5.e3", ".e3",
      "1E+07", "--5", "true", "false", "truex", "chat", "urn:ex#iri",
      "\n", "é")
    val gen = for {
      n <- Gen.choose(1, 4); parts <- Gen.listOfN(n, frag)
    } yield parts.mkString
    val cases = (1 to 700).flatMap { i =>
      gen(Gen.Parameters.default, Seed(55000L + i))
    } ++ frag.sample.toSeq
    assert(cases.size >= 600)
    cases.foreach { s =>
      assert(nat(graft.functions.RdfLex.langOf, s) == refLang(s),
        s"langOf mismatch on ${s.replace("\n", "\\n")}")
      assert(nat(graft.functions.RdfLex.datatypeOf, s) == refDatatype(s),
        s"datatypeOf mismatch on ${s.replace("\n", "\\n")}: " +
          s"native=${nat(graft.functions.RdfLex.datatypeOf, s)} " +
          s"reference=${refDatatype(s)}")
    }
  }

  test("DateTimeParts == the shape-regex reference on adversarial lexicals") {
    // the old guard pattern, verbatim
    val pat = ("^(-?\\d{4,})-(\\d{2})-(\\d{2})T(\\d{2}):(\\d{2}):" +
      "(\\d{2}(?:\\.\\d+)?)(Z|[+-]\\d{2}:\\d{2})?$").r
    def refParts(s: String): Option[Seq[String]] = s match {
      case pat(y, mo, da, hh, mi, se, tz) =>
        // documented boundary: a shape-valid year beyond Long range is
        // NULL from the native parser (the regex reference would have
        // thrown in the downstream ANSI cast)
        val yl = try y.toLong.toString catch {
          case _: NumberFormatException => return None }
        val sec = { val d = se.toDouble
          if (d % 1 == 0) d.toLong.toString else d.toString }
        Some(Seq(yl, mo.toInt.toString, da.toInt.toString,
          hh.toInt.toString, mi.toInt.toString, sec,
          if (tz == null) "" else tz))
      case _ => None
    }
    def native(s: String): Option[Seq[String]] = {
      val r = graft.functions.DateTimeParts.parse(UTF8String.fromString(s))
      if (r == null) None
      else Some((0 until 7).map(i => r.getUTF8String(i).toString))
    }
    val digits = Gen.choose(0, 99).map(n => f"$n%02d")
    val year = Gen.oneOf(Gen.choose(100, 99999).map(_.toString),
      Gen.choose(100, 9999).map(n => "-" + n), Gen.const("0000"))
    val frac = Gen.oneOf("", ".5", ".25", ".999", ".", ".x")
    val tz = Gen.oneOf("", "Z", "+02:00", "-11:30", "+2:00", "Z ", "z")
    val sep1 = Gen.oneOf("-", ":", "")
    val wellFormedIsh = for {
      y <- year; mo <- digits; da <- digits; hh <- digits; mi <- digits
      se <- digits; f <- frac; z <- tz; s1 <- sep1
    } yield s"$y-$mo${s1}${da}T$hh:$mi:$se$f$z"
    val junk = Gen.oneOf("", "T", "2020-01-01", "not a date",
      "12345678901234567890123-01-01T00:00:00", // year overflows Long
      "2020-01-01T00:00:00+0200", "2020-01-01 00:00:00")
    val cases = (1 to 500).flatMap { i =>
      Gen.frequency(4 -> wellFormedIsh, 1 -> junk)(
        Gen.Parameters.default, Seed(99000L + i))
    }
    assert(cases.size >= 450)
    cases.foreach { s =>
      val (n, r) = (native(s), refParts(s))
      assert(n == r, s"dateTime mismatch on $s: native=$n reference=$r")
    }
  }
}
