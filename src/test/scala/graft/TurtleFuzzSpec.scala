package graft

import graft.sources.Turtle
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip fuzz for the Turtle parser: random triples are serialized
  * with random syntactic choices (prefixed vs full IRIs, `a` keyword,
  * grouped `;`/`,` lists, literal escapes, comments) and must parse back
  * to exactly the same triple set. */
class TurtleFuzzSpec extends AnyFunSuite {

  val ns = "http://example.org/x#"

  val localGen: Gen[String] = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  val iriGen: Gen[String] = localGen.map(ns + _)

  val literalGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const("""line\break"""),
    Gen.const("with \"quotes\" and \\slash"),
    Gen.const("tab\tand\nnewline"),
    Gen.const("42"),
    Gen.const("unicode ü § 漢"))

  val tripleGen: Gen[(String, String, String)] = for {
    s <- iriGen; p <- iriGen
    o <- Gen.oneOf(iriGen, literalGen)
  } yield (s, p, o)

  def escape(l: String): String =
    l.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")

  /** Serialize with random syntax choices, seeded. */
  def serialize(triples: Seq[(String, String, String)], rnd: scala.util.Random): String = {
    val sb = new StringBuilder("@prefix ex: <" + ns + "> .\n")
    def term(t: String, asSubjectOrPred: Boolean): String =
      if (t.startsWith(ns) && rnd.nextBoolean()) "ex:" + t.stripPrefix(ns)
      else if (t.startsWith(ns)) s"<$t>"
      else "\"" + escape(t) + "\""
    triples.groupBy(_._1).foreach { case (s, group) =>
      if (rnd.nextBoolean()) sb.append("# comment line\n")
      sb.append(term(s, true))
      val byPred = group.groupBy(_._2).toSeq
      byPred.zipWithIndex.foreach { case ((p, objs), i) =>
        sb.append(" ").append(term(p, true)).append(" ")
        sb.append(objs.map(o => term(o._3, false)).mkString(", "))
        sb.append(if (i < byPred.length - 1) " ;\n   " else " .\n")
      }
    }
    sb.toString
  }

  test("serialize → parse round-trips random triple sets") {
    (1 to 30).foreach { seed =>
      val triples = Gen.choose(1, 12)
        .flatMap(n => Gen.listOfN(n, tripleGen))
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
        .distinct
      // literals can't be subjects/predicates: tripleGen already guarantees
      val ttl = serialize(triples, new scala.util.Random(seed))
      val parsed = Turtle.parse(ttl, s"fuzz$seed").toSet
      // the loader stores literal objects in the round-13 term encoding
      // (shape-normalized: "42" bare, other strings quoted) — the
      // round-trip is up to that encoding
      val expected = triples.map { case (s, p, o) =>
        (s, p,
          if (o.startsWith(ns)) o
          else RdfTerms.encodeTyped(o, RdfTerms.shapeDatatype(o)))
      }.toSet
      assert(parsed == expected,
        s"seed=$seed\nttl:\n$ttl\nmissing=${expected -- parsed}\nextra=${parsed -- expected}")
    }
  }
}
