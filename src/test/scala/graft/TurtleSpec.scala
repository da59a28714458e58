package graft

import graft.sources.Turtle
import org.scalatest.funsuite.AnyFunSuite

class TurtleSpec extends AnyFunSuite {

  val Brick = "https://brickschema.org/schema/Brick#"
  val RdfType = Model.RdfType

  test("prefixes, 'a', semicolon/comma lists") {
    val ttl =
      """@prefix brick: <https://brickschema.org/schema/Brick#> .
        |@prefix ns: <urn:x#> .
        |ns:AHU01 a brick:Air_Handler_Unit ;
        |    brick:feeds ns:VAV1,
        |        ns:VAV2 ;
        |    brick:isFedBy ns:chiller .
        |""".stripMargin
    val ts = Turtle.parse(ttl).toSet
    assert(ts == Set(
      ("urn:x#AHU01", RdfType, s"${Brick}Air_Handler_Unit"),
      ("urn:x#AHU01", s"${Brick}feeds", "urn:x#VAV1"),
      ("urn:x#AHU01", s"${Brick}feeds", "urn:x#VAV2"),
      ("urn:x#AHU01", s"${Brick}isFedBy", "urn:x#chiller")))
  }

  test("nested blank nodes and literal-with-embedded-caret (bldg1.ttl:36-38 shape)") {
    val ttl =
      """@prefix brick: <https://brickschema.org/schema/Brick#> .
        |@prefix unit: <http://qudt.org/vocab/unit/> .
        |@prefix ns2: <urn:b#> .
        |ns2:bldg1 a brick:Building ;
        |    brick:area [ brick:hasUnits unit:FT_2 ;
        |            brick:value "9973^^<http://www.w3.org/2001/XMLSchema#integer>" ] .
        |""".stripMargin
    val ts = Turtle.parse(ttl, "g")
    val areaObj = ts.collect { case (_, p, o) if p == s"${Brick}area" => o }
    assert(areaObj.size == 1 && areaObj.head.startsWith("_:g-b"))
    val bn = areaObj.head
    assert(ts.contains((bn, s"${Brick}hasUnits", "http://qudt.org/vocab/unit/FT_2")))
    // the odd embedded ^^ is INSIDE the quotes → part of the string value
    // (round 13: stored quoted, like every non-shorthand string literal)
    assert(ts.contains((bn, s"${Brick}value",
      "\"9973^^<http://www.w3.org/2001/XMLSchema#integer>\"")))
  }

  test("timeseries blank node + full IRI subject (bldg1.ttl:82 shape)") {
    val ttl =
      """@prefix brick: <https://brickschema.org/schema/Brick#> .
        |<http://buildsys.org/ontologies/bldg1#p1> brick:timeseries [ brick:hasTimeseriesId "c632b4c5-8744-4540-aa70-9b2d095cf6c3" ] .
        |""".stripMargin
    val ts = Turtle.parse(ttl, "g")
    assert(ts.size == 2)
    val id = ts.collect { case (_, p, o) if p == s"${Brick}hasTimeseriesId" => o }
    // round 13: string literals store quoted (stripped at the SELECT
    // result boundary, so query outputs are unchanged)
    assert(id == Seq("\"c632b4c5-8744-4540-aa70-9b2d095cf6c3\""))
  }

  test("datatyped/lang literals, numbers, booleans, dotted local names") {
    val ttl =
      """@prefix ns: <urn:x#> .
        |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        |ns:bldg1.AHU.AHU01.CCV ns:lit "v1"^^xsd:string ;
        |  ns:lang "hello"@en ;
        |  ns:num 42 ;
        |  ns:dec 4.5 ;
        |  ns:bool true .
        |""".stripMargin
    val m = Turtle.parse(ttl).map { case (s, p, o) => (p, (s, o)) }.toMap
    assert(m("urn:x#lit")._1 == "urn:x#bldg1.AHU.AHU01.CCV")
    // ^^xsd:string ≡ a plain literal (RDF 1.1) → the round-13 quoted
    // string-literal encoding
    assert(m("urn:x#lit")._2 == "\"v1\"")
    // a language tag is never reconstructible → kept, RdfTerms-encoded
    // (round 11; stripped only at the SELECT result boundary)
    assert(m("urn:x#lang")._2 == "\"hello\"@en")
    assert(m("urn:x#num")._2 == "42")
    assert(m("urn:x#dec")._2 == "4.5")
    assert(m("urn:x#bool")._2 == "true")
  }

  test("typed literals: reconstructible datatypes normalize bare, others keep the annotation") {
    val ttl =
      """@prefix ns: <urn:x#> .
        |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        |ns:a ns:int "5"^^xsd:integer ;
        |  ns:dbl "1e0"^^xsd:double ;
        |  ns:intAsStr "5"^^xsd:string ;
        |  ns:date "2020-01-02"^^xsd:date ;
        |  ns:dblDec "5.0"^^xsd:double .
        |""".stripMargin
    val m = Turtle.parse(ttl).map { case (_, p, o) => (p, o) }.toMap
    // shape == declared type → identical to the Turtle shorthand form
    assert(m("urn:x#int") == "5")
    assert(m("urn:x#dbl") == "1e0")
    // xsd:string goes through the SAME shape rule as a plain literal
    // (round 14): RDF 1.1 §3.3 makes "5"^^xsd:string and plain "5" one
    // term, and plain "5" normalizes to the bare shorthand — so both
    // spellings must land on identical stored bytes (the documented
    // numeric-shape conflation, applied consistently); a decimal-shaped
    // double keeps its xsd:double identity through the annotation
    assert(m("urn:x#intAsStr") == "5")
    assert(m("urn:x#dblDec") == "\"5.0\"^^<http://www.w3.org/2001/XMLSchema#double>")
    assert(m("urn:x#date") == "\"2020-01-02\"^^<http://www.w3.org/2001/XMLSchema#date>")
  }

  test("collections become rdf:first/rest chains") {
    val Rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val ttl = """@prefix ns: <urn:x#> . ns:a ns:list ( ns:x ns:y ) ."""
    val ts = Turtle.parse(ttl, "g")
    assert(ts.count(_._2 == s"${Rdf}first") == 2)
    assert(ts.count(_._2 == s"${Rdf}rest") == 2)
    assert(ts.exists { case (_, p, o) => p == s"${Rdf}rest" && o == s"${Rdf}nil" })
  }

  test("comments and escapes") {
    val ttl =
      """# leading comment
        |@prefix ns: <urn:x#> . # trailing
        |ns:a ns:p "line\nbreak \"quoted\"" .
        |""".stripMargin
    val ts = Turtle.parse(ttl)
    assert(ts == Seq(("urn:x#a", "urn:x#p", "\"line\nbreak \"quoted\"\"")))
  }
}
