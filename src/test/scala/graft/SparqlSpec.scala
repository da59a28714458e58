package graft

import graft.Model.Quad
import graft.sources.Turtle
import graft.sparql.{BgpPlanner, Sparql}
import org.scalatest.funsuite.AnyFunSuite

/** BGP + property-path evaluation against the micro Brick graph fixture
  * (FIXTURES.md §A4), with the reference's flagship query
  * (reference: mortar-parquet-client/client.py:129-140). */
class SparqlSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  val fixtureTtl: String =
    """@prefix brick: <https://brickschema.org/schema/Brick#> .
      |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
      |@prefix ns: <urn:fix#> .
      |
      |brick:Zone_Air_Temperature_Sensor rdfs:subClassOf brick:Temperature_Sensor .
      |brick:Temperature_Sensor rdfs:subClassOf brick:Sensor .
      |brick:Sensor rdfs:subClassOf brick:Point .
      |brick:Zone_Air_Temperature_Setpoint rdfs:subClassOf brick:Temperature_Setpoint .
      |brick:Temperature_Setpoint rdfs:subClassOf brick:Point .
      |
      |ns:vav1 a brick:VAV ;
      |    brick:hasPoint ns:sen1, ns:sp1 .
      |ns:sen1 a brick:Zone_Air_Temperature_Sensor ;
      |    brick:timeseries [ brick:hasTimeseriesId "a0dd74ce-05ee-5fee-8335-2d9856bd52be" ] .
      |ns:sp1 a brick:Zone_Air_Temperature_Setpoint ;
      |    brick:timeseries [ brick:hasTimeseriesId "f3b61918-afa9-596d-bef5-40fe1e96454f" ] .
      |""".stripMargin

  lazy val quads = {
    val s = spark
    import s.implicits._
    Turtle.parse(fixtureTtl, "bldg1")
      .map { case (su, p, o) => Quad("urn:bldg1#", su, p, o) }
      .map(TestTerms.t).toDF()
  }

  val prefix =
    """PREFIX brick: <https://brickschema.org/schema/Brick#>
      |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
      |PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
      |""".stripMargin

  test("flagship sensor/setpoint/VAV query — one row, exact bindings (client.py:129-140)") {
    val q = Sparql.parse(prefix +
      """SELECT ?vav ?sen ?sp WHERE {
        |  ?sen_point rdf:type/rdfs:subClassOf* brick:Temperature_Sensor ;
        |      brick:timeseries [ brick:hasTimeseriesId ?sen ] .
        |  ?sp_point rdf:type/rdfs:subClassOf* brick:Temperature_Setpoint ;
        |      brick:timeseries [ brick:hasTimeseriesId ?sp ] .
        |  ?vav a brick:VAV .
        |  ?vav brick:hasPoint ?sen_point, ?sp_point .
        |}""".stripMargin)
    val rows = BgpPlanner.evaluate(quads, q).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "urn:fix#vav1")
    assert(r.getString(1) == "a0dd74ce-05ee-5fee-8335-2d9856bd52be")
    assert(r.getString(2) == "f3b61918-afa9-596d-bef5-40fe1e96454f")
  }

  test("subClassOf* includes the zero-length path (all_points query, client.py:116-123)") {
    val q = Sparql.parse(prefix +
      """SELECT * WHERE {
        |  ?point rdf:type/rdfs:subClassOf* brick:Point .
        |  ?point rdf:type ?type .
        |  ?point brick:timeseries [ brick:hasTimeseriesId ?id ] .
        |}""".stripMargin)
    val rows = BgpPlanner.evaluate(quads, q).collect()
    // sen1 (3 hops to Point) and sp1 (2 hops) both match; vav1 does not
    assert(rows.length == 2)
    val points = rows.map(_.getString(0)).toSet
    assert(points == Set("urn:fix#sen1", "urn:fix#sp1"))
    // SELECT * column order = first appearance: point, type, id
    val q2cols = BgpPlanner.evaluate(quads, q).columns.toSeq
    assert(q2cols == Seq("point", "type", "id"))
  }

  test("zero-length star matches a node typed directly as the target class") {
    val s = spark
    import s.implicits._
    val direct = Seq(
      Quad("urn:g#", "urn:x#n1", Model.RdfType, "https://brickschema.org/schema/Brick#Point")).map(TestTerms.t).toDF()
    val q = Sparql.parse(prefix +
      "SELECT ?p WHERE { ?p rdf:type/rdfs:subClassOf* brick:Point . }")
    val rows = BgpPlanner.evaluate(direct, q).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("urn:x#n1"))
  }

  test("named-graph scoping filters by site; union spans all") {
    val s = spark
    import s.implicits._
    val twoSites = Seq(
      Quad("urn:a#", "urn:a#x", "urn:p#t", "1"),
      Quad("urn:b#", "urn:b#y", "urn:p#t", "2")).map(TestTerms.t).toDF()
    val q = Sparql.parse("PREFIX p: <urn:p#> SELECT ?s ?v WHERE { ?s p:t ?v . }")
    assert(BgpPlanner.evaluate(twoSites, q, Some("urn:a#")).collect().map(_.getString(0)).toSeq == Seq("urn:a#x"))
    assert(BgpPlanner.evaluate(twoSites, q, None).count() == 2)
  }

  test("union semantics dedup triples replicated across graphs (ontology merge, setup-graphs.py:22)") {
    val s = spark
    import s.implicits._
    val dup = Seq(
      Quad("urn:a#", "urn:x#c1", Model.RdfsSubClassOf, "urn:x#c2"),
      Quad("urn:b#", "urn:x#c1", Model.RdfsSubClassOf, "urn:x#c2")).map(TestTerms.t).toDF()
    val q = Sparql.parse("PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> SELECT ?a ?b WHERE { ?a rdfs:subClassOf ?b . }")
    assert(BgpPlanner.evaluate(dup, q, None).count() == 1)
  }

  test("object lists / predicate-object lists are self-joins on the subject") {
    val q = Sparql.parse(prefix +
      "SELECT ?v WHERE { ?v brick:hasPoint ?a, ?b . ?a a brick:Zone_Air_Temperature_Sensor . ?b a brick:Zone_Air_Temperature_Setpoint . }")
    val rows = BgpPlanner.evaluate(quads, q).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("urn:fix#vav1"))
  }

  test("SELECT DISTINCT dedups projected bindings") {
    val q = Sparql.parse(prefix + "SELECT DISTINCT ?v WHERE { ?v brick:hasPoint ?p . }")
    assert(BgpPlanner.evaluate(quads, q).count() == 1)
    val q2 = Sparql.parse(prefix + "SELECT ?v WHERE { ?v brick:hasPoint ?p . }")
    assert(BgpPlanner.evaluate(quads, q2).count() == 2) // projection keeps dups
  }

  test("unsupported SPARQL constructs rejected with a named error") {
    Seq("SERVICE <urn:svc> { ?s <urn:q> ?x }").foreach { frag =>
      val e = intercept[IllegalArgumentException] {
        Sparql.parse(s"SELECT ?s WHERE { ?s <urn:p> <urn:o> . $frag }")
      }
      assert(e.getMessage.contains("outside the supported SPARQL subset"), e.getMessage)
    }
    // GRAPH parses at any depth since round 10
    Sparql.parse("SELECT ?s WHERE { ?s <urn:p> ?v . OPTIONAL { GRAPH <urn:g> { ?s <urn:q> ?w } } }")
  }

  test("subqueries inside nested groups join their enclosing group (§18.2.1)") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:g#", "urn:d#1", "urn:p#t", "alpha"),
      Quad("urn:g#", "urn:d#2", "urn:p#t", "beta"),
      Quad("urn:g#", "urn:d#1", "urn:p#buy", "urn:i#1"),
      Quad("urn:g#", "urn:d#1", "urn:p#buy", "urn:i#2"),
      Quad("urn:g#", "urn:d#2", "urn:p#buy", "urn:i#3")).map(TestTerms.t).toDF()
    // an aggregated subquery INSIDE an OPTIONAL: the per-subject count
    // extends the left rows through the left join
    val q2 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?t ?n WHERE { ?s p:t ?t . " +
        "OPTIONAL { { SELECT ?s (COUNT(?i) AS ?n) WHERE { ?s p:buy ?i } " +
        "GROUP BY ?s HAVING(COUNT(?i) >= 2) } } } ORDER BY ?s")
    val rows = BgpPlanner.evaluate(g, q2).collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)).map(_.toString))) // COUNT alias is a long column
    assert(rows.toSeq == Seq(
      ("urn:d#1", "alpha", Some("2")), ("urn:d#2", "beta", None)))
  }

  test("VALUES and BIND inside nested groups scope to their group") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:g#", "urn:d#1", "urn:p#tag", "alpha"),
      Quad("urn:g#", "urn:d#2", "urn:p#tag", "beta"),
      Quad("urn:g#", "urn:d#3", "urn:p#tag", "gamma"),
      Quad("urn:g#", "urn:d#1", "urn:p#val", "7")).map(TestTerms.t).toDF()
    // VALUES inside OPTIONAL conditions the optional match; BIND inside
    // computes an alias visible outside through the left join
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?lbl WHERE { ?s p:tag ?t . " +
        "OPTIONAL { ?s p:tag ?m . VALUES ?m { \"alpha\" \"beta\" } " +
        "BIND(UCASE(?m) AS ?lbl) } } ORDER BY ?s")
    val rows = BgpPlanner.evaluate(g, q).collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq(
      ("urn:d#1", Some("ALPHA")), ("urn:d#2", Some("BETA")), ("urn:d#3", None)))
  }

  test("EXISTS and MINUS bodies are full recursive groups (UNION/OPTIONAL inside)") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:g#", "urn:d#1", "urn:p#tag", "alpha"),
      Quad("urn:g#", "urn:d#2", "urn:p#tag", "beta"),
      Quad("urn:g#", "urn:d#3", "urn:p#tag", "gamma"),
      Quad("urn:g#", "urn:d#1", "urn:p#a", "urn:x#1"),
      Quad("urn:g#", "urn:d#2", "urn:p#b", "urn:x#2")).map(TestTerms.t).toDF()
    // MINUS { {A} UNION {B} }: drops subjects matching either arm
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s WHERE { ?s p:tag ?t . " +
        "MINUS { { ?s p:a ?x } UNION { ?s p:b ?x } } } ORDER BY ?s")
    assert(BgpPlanner.evaluate(g, q).collect().map(_.getString(0)).toSeq
      == Seq("urn:d#3"))
    // EXISTS { {A} UNION {B} }: keeps subjects matching either arm
    val q2 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s WHERE { ?s p:tag ?t . " +
        "FILTER EXISTS { { ?s p:a ?x } UNION { ?s p:b ?x } } } ORDER BY ?s")
    assert(BgpPlanner.evaluate(g, q2).collect().map(_.getString(0)).toSeq
      == Seq("urn:d#1", "urn:d#2"))
    // OPTIONAL inside EXISTS parses and never reduces the body's matches
    val q3 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s WHERE { ?s p:tag ?t . " +
        "FILTER EXISTS { ?s p:a ?x . OPTIONAL { ?s p:b ?y } } } ORDER BY ?s")
    assert(BgpPlanner.evaluate(g, q3).collect().map(_.getString(0)).toSeq
      == Seq("urn:d#1"))
  }

  test("MINUS and EXISTS inside nested groups scope to their group") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:g#", "urn:d#1", "urn:p#tag", "alpha"),
      Quad("urn:g#", "urn:d#2", "urn:p#tag", "beta"),
      Quad("urn:g#", "urn:d#3", "urn:p#tag", "gamma"),
      Quad("urn:g#", "urn:d#1", "urn:p#flag", "x"),
      Quad("urn:g#", "urn:d#2", "urn:p#val", "9")).map(TestTerms.t).toDF()
    // MINUS inside OPTIONAL: the optional extends only where the minus
    // keeps the inner solution (d1 dropped by its flag, d3 survives)
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?m WHERE { ?s p:tag ?t . " +
        "OPTIONAL { ?s p:tag ?m . MINUS { ?s p:flag ?f } } } ORDER BY ?s")
    val rows = BgpPlanner.evaluate(g, q).collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq(
      ("urn:d#1", None), ("urn:d#2", Some("beta")), ("urn:d#3", Some("gamma"))))
    // EXISTS inside a UNION branch: branch 1 keeps only subjects that
    // also have a val; branch 2 contributes flagged subjects
    val q2 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s WHERE { " +
        "{ ?s p:tag ?t . FILTER EXISTS { ?s p:val ?v } } UNION " +
        "{ ?s p:flag ?f } } ORDER BY ?s")
    val rows2 = BgpPlanner.evaluate(g, q2).collect().map(_.getString(0))
    assert(rows2.toSeq == Seq("urn:d#1", "urn:d#2"))
  }

  // ---- FILTER + OPTIONAL (round 8) --------------------------------------

  lazy val filterQuads = {
    val s = spark
    import s.implicits._
    Seq(
      Quad("urn:g#", "urn:d#1", "urn:p#val", "5"),
      Quad("urn:g#", "urn:d#2", "urn:p#val", "10"),
      Quad("urn:g#", "urn:d#3", "urn:p#val", "50"),
      Quad("urn:g#", "urn:d#4", "urn:p#val", "n/a"),
      Quad("urn:g#", "urn:d#1", "urn:p#tag", "alpha"),
      Quad("urn:g#", "urn:d#3", "urn:p#tag", "beta")).map(TestTerms.t).toDF()
  }
  val fp = "PREFIX p: <urn:p#> "

  test("FILTER numeric comparison: numeric literal forces numeric dispatch; non-numeric binding is a type error (row dropped)") {
    val q = Sparql.parse(fp + "SELECT ?s ?v WHERE { ?s p:val ?v . FILTER(?v > 9) }")
    val got = BgpPlanner.evaluate(filterQuads, q).collect().map(_.getString(0)).sorted
    // "5" is numerically 5 (not lexically "5" > "9"); "n/a" casts to NULL → dropped
    assert(got.toSeq == Seq("urn:d#2", "urn:d#3"))
  }

  test("FILTER comparison dispatches per row: numeric pairs by value, mixed pairs lexically; = and != on IRIs") {
    // round 14 (type-promotion dispatch): the quoted "10" stores as the
    // bare integer term under the shorthand conflation, so numeric
    // bindings compare to it by VALUE (50 > 10 only) while the
    // non-numeric "n/a" keeps the documented lexical-fallback compare
    // ("n/a" > "10" codepoint-wise). Pre-round-14 the whole comparison
    // was lexical ("5" > "10" included).
    val q = Sparql.parse(fp + "SELECT ?s WHERE { ?s p:val ?v . FILTER(?v > \"10\") }")
    val got = BgpPlanner.evaluate(filterQuads, q).collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("urn:d#3", "urn:d#4")) // 50 > 10; "n/a" lexical fallback
    val q2 = Sparql.parse(fp + "SELECT ?v WHERE { ?s p:tag ?t . ?s p:val ?v . FILTER(?s != <urn:d#1>) }")
    assert(BgpPlanner.evaluate(filterQuads, q2).collect().map(_.getString(0)).toSeq == Seq("50"))
  }

  test("FILTER regex (with flags), CONTAINS, STRSTARTS, && and || precedence") {
    val q = Sparql.parse(fp + "SELECT ?s WHERE { ?s p:tag ?t . FILTER(regex(?t, \"^AL\", \"i\")) }")
    assert(BgpPlanner.evaluate(filterQuads, q).collect().map(_.getString(0)).toSeq == Seq("urn:d#1"))
    val q2 = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . ?s p:tag ?t . FILTER(CONTAINS(?t, \"et\") || STRSTARTS(?t, \"al\") && ?v < 7) }")
    val got = BgpPlanner.evaluate(filterQuads, q2).collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("urn:d#1", "urn:d#3")) // d1: alpha&&5<7; d3: beta contains "et"
  }

  test("OPTIONAL keeps left rows, unbound vars are NULL; FILTER(!BOUND) selects them") {
    val q = Sparql.parse(fp + "SELECT ?s ?v ?t WHERE { ?s p:val ?v . OPTIONAL { ?s p:tag ?t } }")
    val rows = BgpPlanner.evaluate(filterQuads, q).collect()
    assert(rows.length == 4)
    val byS = rows.map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(byS("urn:d#1").contains("alpha") && byS("urn:d#3").contains("beta"))
    assert(byS("urn:d#2").isEmpty && byS("urn:d#4").isEmpty)
    val q2 = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . OPTIONAL { ?s p:tag ?t } . FILTER(!BOUND(?t)) }")
    val got = BgpPlanner.evaluate(filterQuads, q2).collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("urn:d#2", "urn:d#4"))
  }

  test("FILTER inside OPTIONAL conditions the join, not the left rows (LeftJoin(P1,P2,F))") {
    val q = Sparql.parse(fp +
      "SELECT ?s ?t WHERE { ?s p:val ?v . OPTIONAL { ?s p:tag ?t . FILTER(STRSTARTS(?t, \"al\")) } }")
    val rows = BgpPlanner.evaluate(filterQuads, q).collect()
    assert(rows.length == 4) // every left row survives
    val bound = rows.filter(_.getString(1) != null)
    assert(bound.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("urn:d#1", "alpha")))
  }

  test("FILTER referencing a variable bound by no pattern fails loudly") {
    val q = Sparql.parse(fp + "SELECT ?s WHERE { ?s p:val ?v . FILTER(?nope > 3) }")
    val e = intercept[IllegalArgumentException] { BgpPlanner.evaluate(filterQuads, q) }
    assert(e.getMessage.contains("bound by no pattern"), e.getMessage)
  }

  test("UNION concatenates branch solutions; unshared vars stay unbound") {
    val q = Sparql.parse(fp +
      "SELECT ?s ?v ?t WHERE { { ?s p:val ?v . FILTER(?v > 20) } UNION { ?s p:tag ?t } }")
    val rows = BgpPlanner.evaluate(filterQuads, q).collect()
    assert(rows.length == 3) // {d3 v=50} ∪ {d1 alpha, d3 beta}
    val withV = rows.filter(_.getString(1) != null)
    assert(withV.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("urn:d#3", "50")))
    assert(withV.forall(_.getString(2) == null)) // branch 1 leaves ?t unbound
    val withT = rows.filter(_.getString(2) != null)
    assert(withT.map(r => (r.getString(0), r.getString(2))).sorted.toSeq ==
      Seq(("urn:d#1", "alpha"), ("urn:d#3", "beta")))
  }

  test("UNION joins outer patterns through shared vars; branch FILTERs scope to their branch") {
    val q = Sparql.parse(fp +
      "SELECT ?s ?v ?t WHERE { ?s p:val ?v . " +
        "{ ?s p:tag ?t . FILTER(STRSTARTS(?t, \"al\")) } UNION " +
        "{ ?s p:tag ?t . FILTER(CONTAINS(?t, \"et\")) } }")
    val got = BgpPlanner.evaluate(filterQuads, q).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(got == Seq(("urn:d#1", "5", "alpha"), ("urn:d#3", "50", "beta")))
  }

  // ---- nested groups + GRAPH (round 9) ---------------------------------

  test("plain nested groups join with the enclosing group; inner FILTER scopes to the group") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:g#", "urn:d#1", "urn:p#val", "5"),
      Quad("urn:g#", "urn:d#2", "urn:p#val", "50"),
      Quad("urn:g#", "urn:d#1", "urn:p#tag", "alpha"),
      Quad("urn:g#", "urn:d#2", "urn:p#tag", "beta")).map(TestTerms.t).toDF()
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?t WHERE { ?s p:tag ?t . { ?s p:val ?v . FILTER(?v > 9) } }")
    val rows = BgpPlanner.evaluate(g, q).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("urn:d#2", "beta")))
  }

  test("OPTIONAL inside OPTIONAL: inner extension only where the outer matched") {
    val s = spark
    import s.implicits._
    // d1 has val+tag+note, d2 has val+tag, d3 has val only
    val g = Seq(
      Quad("urn:g#", "urn:d#1", "urn:p#val", "1"),
      Quad("urn:g#", "urn:d#2", "urn:p#val", "2"),
      Quad("urn:g#", "urn:d#3", "urn:p#val", "3"),
      Quad("urn:g#", "urn:d#1", "urn:p#tag", "alpha"),
      Quad("urn:g#", "urn:d#2", "urn:p#tag", "beta"),
      Quad("urn:g#", "urn:d#1", "urn:p#note", "nb1")).map(TestTerms.t).toDF()
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?t ?n WHERE { ?s p:val ?v . " +
        "OPTIONAL { ?s p:tag ?t . OPTIONAL { ?s p:note ?n } } } ORDER BY ?s")
    val rows = BgpPlanner.evaluate(g, q).collect()
      .map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
    assert(rows.toSeq == Seq(
      ("urn:d#1", Some("alpha"), Some("nb1")),
      ("urn:d#2", Some("beta"), None),
      ("urn:d#3", None, None)))
  }

  test("UNION inside OPTIONAL; OPTIONAL inside UNION branch") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:g#", "urn:d#1", "urn:p#val", "1"),
      Quad("urn:g#", "urn:d#2", "urn:p#val", "2"),
      Quad("urn:g#", "urn:d#3", "urn:p#val", "3"),
      Quad("urn:g#", "urn:d#1", "urn:p#tag", "alpha"),
      Quad("urn:g#", "urn:d#2", "urn:p#label", "beta"),
      Quad("urn:g#", "urn:d#1", "urn:p#note", "nb1")).map(TestTerms.t).toDF()
    // UNION inside OPTIONAL: name comes from tag or label; d3 stays unbound
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?nm WHERE { ?s p:val ?v . " +
        "OPTIONAL { { ?s p:tag ?nm } UNION { ?s p:label ?nm } } } ORDER BY ?s")
    val rows = BgpPlanner.evaluate(g, q).collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq(
      ("urn:d#1", Some("alpha")), ("urn:d#2", Some("beta")), ("urn:d#3", None)))
    // OPTIONAL inside a UNION branch: branch 1 extends with note where present
    val q2 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?n WHERE { " +
        "{ ?s p:tag ?t . OPTIONAL { ?s p:note ?n } } UNION { ?s p:label ?t } } ORDER BY ?s")
    val rows2 = BgpPlanner.evaluate(g, q2).collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows2.toSeq == Seq(("urn:d#1", Some("nb1")), ("urn:d#2", None)))
  }

  test("groups with no binding parts still run their sub-constructs over the empty mapping") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:g#", "urn:d#1", "urn:p#a", "urn:o#1"),
      Quad("urn:g#", "urn:d#1", "urn:p#b", "urn:x#1"),
      Quad("urn:g#", "urn:d#2", "urn:p#a", "urn:o#2")).map(TestTerms.t).toDF()
    // OPTIONAL whose body is ONLY a nested OPTIONAL: the inner extension
    // must still run (regression: an early {μ0} return used to discard it)
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?m WHERE { ?s p:a ?o . " +
        "OPTIONAL { OPTIONAL { ?s p:b ?m } } } ORDER BY ?s")
    val rows = BgpPlanner.evaluate(g, q).collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq(("urn:d#1", Some("urn:x#1")), ("urn:d#2", None)))
    // all-ground group + BIND: the alias binds over the empty mapping
    val q2 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?x WHERE { ?s p:a ?o . " +
        "{ <urn:d#1> p:a <urn:o#1> . BIND(\"hit\" AS ?x) } } ORDER BY ?s")
    val rows2 = BgpPlanner.evaluate(g, q2).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows2.toSeq == Seq(("urn:d#1", "hit"), ("urn:d#2", "hit")))
    // BIND-only WHERE: one solution binding the alias
    val q3 = Sparql.parse("SELECT ?x WHERE { BIND(\"v\" AS ?x) }")
    assert(BgpPlanner.evaluate(g, q3).collect().map(_.getString(0)).toSeq == Seq("v"))
  }

  test("UNION of all-ground branches: matched = join identity, all-failed = empty; mixed pads") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:g#", "urn:a", "urn:b", "urn:c"),
      Quad("urn:g#", "urn:d#1", "urn:p#v", "1")).map(TestTerms.t).toDF()
    // branch 1 matches (empty mapping), branch 2's ground atom fails:
    // the union contributes {μ0} — every outer solution survives
    // (regression: this used to empty the whole query)
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?o WHERE { ?s p:v ?o . " +
        "{ <urn:a> <urn:b> <urn:c> } UNION { <urn:a> <urn:b> <urn:d> } }")
    assert(BgpPlanner.evaluate(g, q).collect()
      .map(_.getString(0)).toSeq == Seq("urn:d#1"))
    // both ground branches fail → the union really has no solutions
    val q2 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s WHERE { ?s p:v ?o . " +
        "{ <urn:a> <urn:b> <urn:x> } UNION { <urn:a> <urn:b> <urn:d> } }")
    assert(BgpPlanner.evaluate(g, q2).count() == 0)
    // mixed: a binding branch + a matched ground branch — the ground
    // branch contributes one all-unbound row (its solution binds nothing)
    val q3 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?v WHERE { " +
        "{ ?s p:v ?v } UNION { <urn:a> <urn:b> <urn:c> } }")
    val rows3 = BgpPlanner.evaluate(g, q3).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSet
    assert(rows3 == Set((Some("urn:d#1"), Some("1")), (None, None)))
  }

  test("EXISTS/MINUS over an otherwise-empty WHERE evaluate from {mu0} (round-10 fix)") {
    val s = spark
    import s.implicits._
    val g = Seq(Quad("urn:g#", "urn:d#1", "urn:p#v", "1")).map(TestTerms.t).toDF()
    // formerly short-circuited to the empty relation -> always false
    val ask1 = Sparql.parse("ASK { FILTER EXISTS { ?s <urn:p#v> ?o } }")
    assert(BgpPlanner.evaluate(g, ask1).collect().head.getString(0) == "true")
    val ask2 = Sparql.parse(
      "ASK { FILTER EXISTS { ?s <urn:p#nope> ?o } }")
    assert(BgpPlanner.evaluate(g, ask2).collect().head.getString(0) == "false")
    val ask3 = Sparql.parse("ASK { FILTER NOT EXISTS { ?s <urn:p#v> ?o } }")
    assert(BgpPlanner.evaluate(g, ask3).collect().head.getString(0) == "false")
    // MINUS against {mu0}: domains are disjoint -> removes nothing -> true
    val ask4 = Sparql.parse("ASK { MINUS { ?s <urn:p#v> ?o } }")
    assert(BgpPlanner.evaluate(g, ask4).collect().head.getString(0) == "true")
  }

  test("UNION keeps the schema of a branch that matched nothing (round-10 fix)") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:g#", "urn:d#1", "urn:p#v", "1"),
      Quad("urn:g#", "urn:d#2", "urn:p#w", "2")).map(TestTerms.t).toDF()
    // branch 2's ground atom fails -> the whole branch has no solutions,
    // but ?x must still exist in the output schema as unbound
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?v ?x WHERE { " +
        "{ ?s p:v ?v } UNION { <urn:nope> p:q <urn:r> . ?s2 p:w ?x } }")
    val rows = BgpPlanner.evaluate(g, q).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(rows.toSeq == Seq((Some("1"), None)))
    // nested variant reaches the same padding through evalGroup
    val q2 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?v ?x WHERE { ?s p:v ?v . " +
        "OPTIONAL { { ?s p:v ?v } UNION { <urn:nope> p:q <urn:r> . ?s p:w ?x } } }")
    val rows2 = BgpPlanner.evaluate(g, q2).collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
    assert(rows2.toSeq == Seq(("urn:d#1", "1", None)))
  }

  test("GRAPH ?var path atoms fail loudly on U+0001 in encoded values (round-10 fix)") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:A#", "urn:x#a", "urn:p#sub", "badname")).map(TestTerms.t).toDF()
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s p:sub+ ?o } }")
    val e = intercept[Throwable] {
      BgpPlanner.evaluate(g, q).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("U+0001")),
      s"expected a loud U+0001 encoding error, got: ${messages(e).mkString(" | ")}")
  }

  test("FROM merges the default graph; FROM NAMED scopes GRAPH (§13.2, round 10)") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:g1#", "urn:s#1", "urn:p#v", "a"),
      Quad("urn:g1#", "urn:s#0", "urn:p#v", "shared"),
      Quad("urn:g2#", "urn:s#0", "urn:p#v", "shared"), // same triple, 2 graphs
      Quad("urn:g2#", "urn:s#2", "urn:p#v", "b"),
      Quad("urn:g3#", "urn:s#3", "urn:p#v", "c")).map(TestTerms.t).toDF()
    // FROM merge: g1 ∪ g2 as the default graph, set semantics (the
    // shared triple appears once)
    val q1 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?o FROM <urn:g1#> FROM <urn:g2#> " +
        "WHERE { ?s p:v ?o } ORDER BY ?s")
    assert(BgpPlanner.evaluate(g, q1).collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq == Seq(
      ("urn:s#0", "shared"), ("urn:s#1", "a"), ("urn:s#2", "b")))
    // FROM-only: no named graphs visible — GRAPH matches nothing
    val q2 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?g ?s FROM <urn:g1#> " +
        "WHERE { GRAPH ?g { ?s p:v ?o } }")
    assert(BgpPlanner.evaluate(g, q2).count() == 0)
    // FROM NAMED only: empty default graph, GRAPH sees only the listed set
    val q3 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?g ?s FROM NAMED <urn:g3#> " +
        "WHERE { GRAPH ?g { ?s p:v ?o } }")
    assert(BgpPlanner.evaluate(g, q3).collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq == Seq(("urn:g3#", "urn:s#3")))
    val q4 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s FROM NAMED <urn:g3#> WHERE { ?s p:v ?o }")
    assert(BgpPlanner.evaluate(g, q4).count() == 0)
    // the explicit graph API parameter (the reference's site scoping)
    // takes precedence over dataset clauses
    assert(BgpPlanner.evaluate(g, q1, graph = Some("urn:g3#")).collect()
      .map(_.getString(0)).toSeq == Seq("urn:s#3"))
    // evaluateTriples cannot honor a dataset; subqueries may not carry one
    val e = intercept[IllegalArgumentException] {
      BgpPlanner.evaluateTriples(g.select("s", "p", "o"), q1)
    }
    assert(e.getMessage.contains("FROM"), e.getMessage)
    val qSub = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s WHERE { " +
        "{ SELECT ?s FROM <urn:g1#> WHERE { ?s p:v ?o } } }")
    val e2 = intercept[IllegalArgumentException] {
      BgpPlanner.evaluate(g, qSub).collect()
    }
    assert(e2.getMessage.contains("subqueries"), e2.getMessage)
  }

  test("ground GRAPH groups: existence tests and graph binders (round 10)") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:siteA#", "urn:x#1", "urn:p#t", "a1"),
      Quad("urn:siteB#", "urn:x#2", "urn:p#t", "b1"),
      Quad("urn:siteB#", "urn:x#2", "urn:p#u", "b2")).map(TestTerms.t).toDF()
    def ask(q: String): String =
      BgpPlanner.evaluate(g, Sparql.parse("PREFIX p: <urn:p#> " + q))
        .collect().head.getString(0)
    // "does this site hold exactly this triple"
    assert(ask("ASK { GRAPH <urn:siteB#> { <urn:x#2> p:t \"b1\" } }") == "true")
    assert(ask("ASK { GRAPH <urn:siteA#> { <urn:x#2> p:t \"b1\" } }") == "false")
    // ground GRAPH group conditions an enclosing SELECT: keep-all / annihilate
    val keep = Sparql.parse("PREFIX p: <urn:p#> SELECT ?s WHERE { " +
      "?s p:t ?v . GRAPH <urn:siteB#> { <urn:x#2> p:u \"b2\" } } ORDER BY ?s")
    assert(BgpPlanner.evaluate(g, keep).collect().map(_.getString(0)).toSeq
      == Seq("urn:x#1", "urn:x#2"))
    val drop = Sparql.parse("PREFIX p: <urn:p#> SELECT ?s WHERE { " +
      "?s p:t ?v . GRAPH <urn:siteA#> { <urn:x#2> p:u \"b2\" } }")
    assert(BgpPlanner.evaluate(g, drop).count() == 0)
    // structural ground body binds ?g to each MATCHING graph only
    val bind = Sparql.parse("PREFIX p: <urn:p#> SELECT ?g WHERE { " +
      "GRAPH ?g { <urn:x#2> p:t \"b1\" . OPTIONAL { <urn:x#2> p:u \"b2\" } } }")
    assert(BgpPlanner.evaluate(g, bind).collect().map(_.getString(0)).toSeq
      == Seq("urn:siteB#"))
  }

  test("GRAPH ?g may reuse the graph variable in a term position") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:gA#", "urn:s#1", "urn:p#x", "urn:gA#"), // object == graph name
      Quad("urn:gB#", "urn:s#1", "urn:p#x", "urn:gA#"), // object != its graph
      Quad("urn:gB#", "urn:s#2", "urn:p#x", "urn:o#1")).map(TestTerms.t).toDF()
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?g WHERE { GRAPH ?g { <urn:s#1> p:x ?g } }")
    assert(BgpPlanner.evaluate(g, q).collect().map(_.getString(0)).toSeq
      == Seq("urn:gA#"))
  }

  test("GRAPH <iri> scopes matching to one named graph; GRAPH ?g binds the graph") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:siteA#", "urn:x#1", "urn:p#t", "a1"),
      Quad("urn:siteB#", "urn:x#2", "urn:p#t", "b1"),
      Quad("urn:siteB#", "urn:x#2", "urn:p#u", "b2"),
      Quad("urn:siteC#", "urn:x#3", "urn:p#u", "c1")).map(TestTerms.t).toDF()
    // constant graph: only siteB's triples match
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?v WHERE { GRAPH <urn:siteB#> { ?s p:t ?v } }")
    val rows = BgpPlanner.evaluate(g, q).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("urn:x#2", "b1")))
    // variable graph: ?g binds per matching graph, and both patterns must
    // match within the SAME graph (x2's t+u are both in siteB)
    val q2 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?g ?s WHERE { GRAPH ?g { ?s p:t ?v . ?s p:u ?w } }")
    val rows2 = BgpPlanner.evaluate(g, q2).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows2.toSeq == Seq(("urn:siteB#", "urn:x#2")))
    // variable graph joins the outer group through shared vars
    val q3 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?g ?v WHERE { ?s p:t ?v . GRAPH ?g { ?s p:u ?w } } ORDER BY ?g")
    val rows3 = BgpPlanner.evaluate(g, q3).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows3.toSeq == Seq(("urn:siteB#", "b1")))
    // GRAPH needs the quads relation: evaluateTriples without it errors
    val e = intercept[IllegalArgumentException] {
      BgpPlanner.evaluateTriples(g.select("s", "p", "o"), q)
    }
    assert(e.getMessage.contains("GRAPH requires"), e.getMessage)
  }

  test("GRAPH ?var supports property paths via per-graph closure; nesting stays named") {
    val s = spark
    import s.implicits._
    // two graphs with DIFFERENT sub-class chains sharing node names:
    // closure must never cross graphs (a→b→c in A; only b→c in B)
    val g = Seq(
      Quad("urn:A#", "urn:x#a", "urn:p#sub", "urn:x#b"),
      Quad("urn:A#", "urn:x#b", "urn:p#sub", "urn:x#c"),
      Quad("urn:B#", "urn:x#b", "urn:p#sub", "urn:x#c")).map(TestTerms.t).toDF()
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?g ?s WHERE { GRAPH ?g { ?s p:sub+ <urn:x#c> } } ORDER BY ?g ?s")
    val rows = BgpPlanner.evaluate(g, q).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(
      ("urn:A#", "urn:x#a"), ("urn:A#", "urn:x#b"), ("urn:B#", "urn:x#b")))
    // `*` adds the zero-length pairs per graph: c itself appears in both
    val q2 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?g ?s WHERE { GRAPH ?g { ?s p:sub* <urn:x#c> } } ORDER BY ?g ?s")
    val rows2 = BgpPlanner.evaluate(g, q2).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows2.toSeq == Seq(
      ("urn:A#", "urn:x#a"), ("urn:A#", "urn:x#b"), ("urn:A#", "urn:x#c"),
      ("urn:B#", "urn:x#b"), ("urn:B#", "urn:x#c")))
  }

  test("GRAPH ?var with nested structure: per-graph OPTIONAL/UNION scoping (round 10)") {
    val s = spark
    import s.implicits._
    // same subject in both graphs; the u-triple exists ONLY in A — the
    // nested OPTIONAL must match within each branch's own graph, never
    // leaking A's u into B's solution
    val g = Seq(
      Quad("urn:A#", "urn:x#a", "urn:p#sub", "urn:x#b"),
      Quad("urn:A#", "urn:x#a", "urn:p#u", "ua"),
      Quad("urn:B#", "urn:x#a", "urn:p#sub", "urn:x#c")).map(TestTerms.t).toDF()
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?g ?o ?w WHERE { " +
        "GRAPH ?g { ?s p:sub ?o . OPTIONAL { ?s p:u ?w } } } ORDER BY ?g")
    val rows = BgpPlanner.evaluate(g, q).collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
    assert(rows.toSeq == Seq(
      ("urn:A#", "urn:x#b", Some("ua")),
      ("urn:B#", "urn:x#c", None)))
    // UNION inside GRAPH ?var: each branch still graph-scoped
    val q2 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?g ?v WHERE { " +
        "GRAPH ?g { { ?s p:u ?v } UNION { ?s p:sub ?v } } } ORDER BY ?g ?v")
    val rows2 = BgpPlanner.evaluate(g, q2).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows2.toSeq == Seq(
      ("urn:A#", "ua"), ("urn:A#", "urn:x#b"), ("urn:B#", "urn:x#c")))
    // BIND inside GRAPH ?var
    val q3 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?g ?b WHERE { " +
        "GRAPH ?g { ?s p:sub ?o . BIND(UCASE(?o) AS ?b) } } ORDER BY ?g")
    val rows3 = BgpPlanner.evaluate(g, q3).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows3.toSeq == Seq(("urn:A#", "URN:X#B"), ("urn:B#", "URN:X#C")))
  }

  test("GRAPH inside OPTIONAL/UNION/nested groups joins its enclosing group (round 10)") {
    val s = spark
    import s.implicits._
    val g = Seq(
      Quad("urn:siteA#", "urn:x#1", "urn:p#t", "a1"),
      Quad("urn:siteB#", "urn:x#2", "urn:p#t", "b1"),
      Quad("urn:siteB#", "urn:x#2", "urn:p#u", "b2"),
      Quad("urn:siteC#", "urn:x#3", "urn:p#u", "c1")).map(TestTerms.t).toDF()
    // OPTIONAL { GRAPH ?g { … } }: find the site that has the point, if
    // any — x#1 has no u-triple anywhere → ?g/?w unbound, row kept
    val q = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?g ?w WHERE { " +
        "?s p:t ?v . OPTIONAL { GRAPH ?g { ?s p:u ?w } } } ORDER BY ?s")
    val rows = BgpPlanner.evaluate(g, q).collect()
      .map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
    assert(rows.toSeq == Seq(
      ("urn:x#1", None, None),
      ("urn:x#2", Some("urn:siteB#"), Some("b2"))))
    // GRAPH <iri> inside an OPTIONAL: constant-scoped existence extension
    val q2 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s ?w WHERE { " +
        "?s p:t ?v . OPTIONAL { GRAPH <urn:siteB#> { ?s p:u ?w } } } ORDER BY ?s")
    val rows2 = BgpPlanner.evaluate(g, q2).collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows2.toSeq == Seq(("urn:x#1", None), ("urn:x#2", Some("b2"))))
    // GRAPH inside a UNION branch
    val q3 = Sparql.parse(
      "PREFIX p: <urn:p#> SELECT ?s WHERE { " +
        "{ GRAPH <urn:siteA#> { ?s p:t ?v } } UNION " +
        "{ GRAPH <urn:siteC#> { ?s p:u ?v } } } ORDER BY ?s")
    assert(BgpPlanner.evaluate(g, q3).collect().map(_.getString(0)).toSeq
      == Seq("urn:x#1", "urn:x#3"))
  }

  test("FILTER on the flagship fixture: regex narrows timeseries bindings") {
    val q = Sparql.parse(prefix +
      """SELECT ?id WHERE {
        |  ?p brick:timeseries ?b . ?b brick:hasTimeseriesId ?id .
        |  FILTER(regex(?id, "^a0dd"))
        |}""".stripMargin)
    val rows = BgpPlanner.evaluate(quads, q).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a0dd74ce-05ee-5fee-8335-2d9856bd52be"))
  }

  // ---- extended property paths: ^, +, (p|q) ----------------------------

  def strings(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.getString(0)).sorted.toSeq

  test("p+ excludes the zero-length path that p* includes") {
    def ask(mod: String) = strings(BgpPlanner.evaluate(quads, Sparql.parse(prefix +
      s"SELECT ?x WHERE { ?x rdfs:subClassOf$mod brick:Point . }")))
    val plus = ask("+")
    val star = ask("*")
    // every strict subclass reaches Point in >=1 step; only * adds Point itself
    assert(plus.size == 5 && !plus.exists(_.endsWith("#Point")), plus)
    assert(star.toSet == plus.toSet + "https://brickschema.org/schema/Brick#Point")
  }

  test("^p swaps subject and object of the underlying edge") {
    val q = Sparql.parse(prefix +
      "SELECT ?sub WHERE { brick:Point ^rdfs:subClassOf ?sub . }")
    assert(strings(BgpPlanner.evaluate(quads, q)) == Seq(
      "https://brickschema.org/schema/Brick#Sensor",
      "https://brickschema.org/schema/Brick#Temperature_Setpoint"))
  }

  test("(^p)+ walks the reversed closure: all descendants of Point") {
    val q = Sparql.parse(prefix +
      "SELECT ?x WHERE { brick:Point (^rdfs:subClassOf)+ ?x . }")
    assert(strings(BgpPlanner.evaluate(quads, q)).size == 5)
  }

  test("bare top-level alternative p|q unions single-step edges") {
    val q = Sparql.parse(prefix + "PREFIX ns: <urn:fix#>\n" +
      "SELECT ?o WHERE { ns:vav1 brick:hasPoint|rdf:type ?o . }")
    assert(strings(BgpPlanner.evaluate(quads, q)) == Seq(
      "https://brickschema.org/schema/Brick#VAV", "urn:fix#sen1", "urn:fix#sp1"))
  }

  test("sequence step with + : rdf:type/rdfs:subClassOf+ gives strict supertypes") {
    val q = Sparql.parse(prefix + "PREFIX ns: <urn:fix#>\n" +
      "SELECT ?c WHERE { ns:sen1 rdf:type/rdfs:subClassOf+ ?c . }")
    assert(strings(BgpPlanner.evaluate(quads, q)) == Seq(
      "https://brickschema.org/schema/Brick#Point",
      "https://brickschema.org/schema/Brick#Sensor",
      "https://brickschema.org/schema/Brick#Temperature_Sensor"))
  }

  // ---- aggregates, solution modifiers, VALUES, MINUS --------------------

  lazy val aggQuads = {
    val s = spark
    import s.implicits._
    Seq(
      Quad("urn:g#", "urn:u#1", "urn:p#buy", "3"),
      Quad("urn:g#", "urn:u#1", "urn:p#buy", "7"),
      Quad("urn:g#", "urn:u#2", "urn:p#buy", "10"),
      Quad("urn:g#", "urn:u#2", "urn:p#buy", "x"),
      Quad("urn:g#", "urn:u#3", "urn:p#buy", "2")).map(TestTerms.t).toDF()
  }

  test("global aggregates: COUNT(*), SUM skips non-numeric (type-error) bindings") {
    val q = Sparql.parse(fp +
      "SELECT (COUNT(*) AS ?n) (SUM(?v) AS ?s) WHERE { ?d p:val ?v . }")
    val r = BgpPlanner.evaluate(filterQuads, q).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 4L && r.head.getDouble(1) == 65.0) // n/a -> NULL
  }

  test("GROUP BY with COUNT/SUM/MAX; MAX dispatches numerically per group, " +
      "lexical fallback on mixed groups") {
    val q = Sparql.parse(fp + "SELECT ?u (COUNT(?v) AS ?n) (SUM(?v) AS ?s) " +
      "(MAX(?v) AS ?mx) WHERE { ?u p:buy ?v . } GROUP BY ?u ORDER BY ?u")
    val r = BgpPlanner.evaluate(aggQuads, q).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2), x.getString(3)))
    assert(r.toSeq == Seq(
      ("urn:u#1", 2L, 10.0, "7"),
      ("urn:u#2", 2L, 10.0, "x"), // mixed group -> lexical; SUM skips "x"
      ("urn:u#3", 1L, 2.0, "2")))
  }

  test("MIN/MAX take the numeric extreme on all-numeric groups (round 12)") {
    val s = spark
    import s.implicits._
    // {"10","9"}: lexical min is "10"; numeric dispatch must say "9" and
    // keep the TERM ("09" loses to "9" only via the lexical tie-break)
    val quads = Seq(
      Quad("urn:g#", "urn:u#1", "urn:p#buy", "10"),
      Quad("urn:g#", "urn:u#1", "urn:p#buy", "9"),
      Quad("urn:g#", "urn:u#2", "urn:p#buy", "2.5"),
      Quad("urn:g#", "urn:u#2", "urn:p#buy", "30"),
      Quad("urn:g#", "urn:u#3", "urn:p#buy", "a"),
      Quad("urn:g#", "urn:u#3", "urn:p#buy", "9")).map(TestTerms.t).toDF()
    val q = Sparql.parse("PREFIX p: <urn:p#> SELECT ?u (MIN(?v) AS ?lo) " +
      "(MAX(?v) AS ?hi) WHERE { ?u p:buy ?v . } GROUP BY ?u ORDER BY ?u")
    val r = BgpPlanner.evaluate(quads, q).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2)))
    assert(r.toSeq == Seq(
      ("urn:u#1", "9", "10"),   // numeric order, terms kept
      ("urn:u#2", "2.5", "30"), // decimal shapes included
      ("urn:u#3", "9", "a")))   // mixed -> lexical fallback
  }

  test("ORDER BY sorts numeric-literal keys by value (round-12 §15.1)") {
    val s = spark
    import s.implicits._
    val quads = Seq("10", "9", "2.5", "100").zipWithIndex.map {
      case (v, i) => Quad("urn:g#", s"urn:s#$i", "urn:p#v", v) }.map(TestTerms.t).toDF()
    val q = Sparql.parse("PREFIX p: <urn:p#> SELECT ?v WHERE { ?s p:v ?v . } " +
      "ORDER BY ?v")
    assert(BgpPlanner.evaluate(quads, q).collect().map(_.getString(0)).toSeq ==
      Seq("2.5", "9", "10", "100"))
    val qd = Sparql.parse("PREFIX p: <urn:p#> SELECT ?v WHERE { ?s p:v ?v . } " +
      "ORDER BY DESC(?v) LIMIT 2")
    assert(BgpPlanner.evaluate(quads, qd).collect().map(_.getString(0)).toSeq ==
      Seq("100", "10"))
    // IRI/string keys keep exact codepoint order (flag/value constant)
    val sq = Seq("b", "a", "c").zipWithIndex.map {
      case (v, i) => Quad("urn:g#", s"urn:s#$i", "urn:p#v", v) }.map(TestTerms.t).toDF()
    assert(BgpPlanner.evaluate(sq, q).collect().map(_.getString(0)).toSeq ==
      Seq("a", "b", "c"))
  }

  test("HAVING with an inline aggregate call; COUNT(DISTINCT ?u)") {
    val q = Sparql.parse(fp +
      "SELECT ?u WHERE { ?u p:buy ?v . } GROUP BY ?u HAVING(COUNT(?v) > 1) ORDER BY ?u")
    assert(strings(BgpPlanner.evaluate(aggQuads, q)) == Seq("urn:u#1", "urn:u#2"))
    val q2 = Sparql.parse(fp +
      "SELECT (COUNT(DISTINCT ?u) AS ?n) WHERE { ?u p:buy ?v . }")
    assert(BgpPlanner.evaluate(aggQuads, q2).collect().head.getLong(0) == 3L)
  }

  test("ORDER BY DESC with LIMIT and OFFSET slices the sorted solutions") {
    val q = Sparql.parse(fp +
      "SELECT ?d WHERE { ?d p:val ?v . } ORDER BY DESC(?d) LIMIT 2 OFFSET 1")
    assert(BgpPlanner.evaluate(filterQuads, q).collect().map(_.getString(0)).toSeq
      == Seq("urn:d#3", "urn:d#2"))
  }

  test("aggregates over an empty solution set: global COUNT yields its 0 row") {
    // unmatched pattern (empty relation path)
    val q = Sparql.parse(fp + "SELECT (COUNT(?v) AS ?n) WHERE { ?d p:nope ?v . }")
    val r = BgpPlanner.evaluate(filterQuads, q).collect()
    assert(r.length == 1 && r.head.getLong(0) == 0L)
    // failed ground pattern (early-return path)
    val q2 = Sparql.parse(fp +
      "SELECT (COUNT(*) AS ?n) WHERE { <urn:d#1> p:val \"999\" . }")
    val r2 = BgpPlanner.evaluate(filterQuads, q2).collect()
    assert(r2.length == 1 && r2.head.getLong(0) == 0L)
    // grouped aggregate over empty yields no rows
    val q3 = Sparql.parse(fp +
      "SELECT ?d (COUNT(?v) AS ?n) WHERE { ?d p:nope ?v . } GROUP BY ?d")
    assert(BgpPlanner.evaluate(filterQuads, q3).count() == 0)
  }

  test("VALUES single-var restricts via join; row form joins on both columns") {
    val q = Sparql.parse(fp +
      "SELECT ?d ?v WHERE { ?d p:val ?v . VALUES ?d { <urn:d#1> <urn:d#3> } } ORDER BY ?d")
    assert(BgpPlanner.evaluate(filterQuads, q).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("urn:d#1", "5"), ("urn:d#3", "50")))
    val q2 = Sparql.parse(fp + "SELECT ?d ?v WHERE { ?d p:val ?v . " +
      "VALUES (?d ?v) { (<urn:d#1> \"5\") (<urn:d#2> \"999\") } }")
    assert(BgpPlanner.evaluate(filterQuads, q2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("urn:d#1", "5")))
  }

  test("MINUS removes compatible solutions; disjoint domains remove nothing") {
    val q = Sparql.parse(fp +
      "SELECT ?d WHERE { ?d p:val ?v . MINUS { ?d p:tag \"alpha\" } } ORDER BY ?d")
    assert(strings(BgpPlanner.evaluate(filterQuads, q))
      == Seq("urn:d#2", "urn:d#3", "urn:d#4"))
    // ?z shares nothing with the outer group -> SPARQL dom-disjoint rule
    val q2 = Sparql.parse(fp +
      "SELECT ?d WHERE { ?d p:val ?v . MINUS { ?z p:tag \"alpha\" } }")
    assert(BgpPlanner.evaluate(filterQuads, q2).count() == 4)
  }

  test("aggregate/modifier misuse rejected with named errors") {
    def bad(qs: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        val df = BgpPlanner.evaluate(filterQuads, Sparql.parse(fp + qs))
        df.collect() // planner errors may surface at plan build
      }
      assert(e.getMessage.contains(needle), s"$qs => ${e.getMessage}")
    }
    bad("SELECT ?d ?v WHERE { ?d p:val ?v . } GROUP BY ?d",
      "must appear in GROUP BY")
    bad("SELECT * WHERE { ?d p:val ?v . } GROUP BY ?d",
      "SELECT * cannot be combined")
    // non-projected keys are legal since round 11 (§18.2.5) — only a key
    // that exists NOWHERE in scope is an error now
    bad("SELECT ?d WHERE { ?d p:val ?v . } ORDER BY ?nope",
      "not an in-scope")
    bad("SELECT ?d WHERE { ?d p:val ?v . } BOGUS TRAILING",
      "trailing content")
  }

  test("VALUES UNDEF cells join as compatible-with-anything (§10.2.2)") {
    // filterQuads: d1..d4 have val; d1 tag=alpha, d3 tag=beta
    // row (UNDEF, "alpha"): any d with tag alpha → d1
    // row (<urn:d#3>, UNDEF): d3 with any tag → d3/beta
    val q = Sparql.parse(fp +
      "SELECT ?d ?t WHERE { ?d p:tag ?t . " +
        "VALUES (?d ?t) { (UNDEF \"alpha\") (<urn:d#3> UNDEF) } } ORDER BY ?d")
    val rows = BgpPlanner.evaluate(filterQuads, q).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("urn:d#1", "alpha"), ("urn:d#3", "beta")))
    // single-var UNDEF row matches every solution (bag: d joins both rows)
    val q2 = Sparql.parse(fp +
      "SELECT ?d WHERE { ?d p:tag ?t . VALUES ?d { UNDEF <urn:d#1> } } ORDER BY ?d")
    val rows2 = BgpPlanner.evaluate(filterQuads, q2).collect().map(_.getString(0))
    assert(rows2.toSeq == Seq("urn:d#1", "urn:d#1", "urn:d#3"))
    // a VALUES-only group of UNDEF rows still yields its rows (fresh var
    // stays unbound on the UNDEF row)
    val q3 = Sparql.parse(fp +
      "SELECT ?x WHERE { VALUES ?x { UNDEF \"k\" } }")
    val rows3 = BgpPlanner.evaluate(filterQuads, q3).collect()
      .map(r => Option(r.getString(0)))
    assert(rows3.toSet == Set(None, Some("k")))
  }

  test("BIND: string builtins, integer arithmetic, chained aliases, FILTER over alias") {
    val q = Sparql.parse(fp +
      "SELECT ?s ?key ?vv ?tag WHERE { ?s p:val ?v . ?s p:tag ?t . " +
        "BIND(STRAFTER(STR(?s), \"#\") AS ?key) " +
        "BIND(?v * 2 AS ?vv) " +
        "BIND(CONCAT(UCASE(?t), \"/\", ?key) AS ?tag) } ORDER BY ?s")
    val rows = BgpPlanner.evaluate(filterQuads, q).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      ("urn:d#1", "1", "10", "ALPHA/1"),
      ("urn:d#3", "3", "100", "BETA/3")))
    // non-integer binding under arithmetic -> unbound (NULL), row kept
    val q2 = Sparql.parse(fp +
      "SELECT ?s ?vv WHERE { ?s p:val ?v . BIND(?v + 1 AS ?vv) } ORDER BY ?s")
    val byS = BgpPlanner.evaluate(filterQuads, q2).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byS("urn:d#1").contains("6") && byS("urn:d#4").isEmpty)
    // FILTER can test a BIND alias (group-final scope)
    val q3 = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . BIND(?v + 0 AS ?n) . FILTER(?n > 9) }")
    assert(BgpPlanner.evaluate(filterQuads, q3).collect()
      .map(_.getString(0)).sorted.toSeq == Seq("urn:d#2", "urn:d#3"))
  }

  test("FILTER: string builtins as comparison operands (numeric + string dispatch)") {
    // STRLEN vs numeric literal -> numeric dispatch on the builtin result
    val q = Sparql.parse(fp +
      "SELECT ?t WHERE { ?s p:tag ?t . FILTER(STRLEN(?t) > 4) }")
    assert(BgpPlanner.evaluate(filterQuads, q).collect()
      .map(_.getString(0)).toSeq == Seq("alpha"))
    // STRAFTER/SUBSTR vs string literal -> string comparison
    val q2 = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . FILTER(STRAFTER(STR(?s), \"#\") = \"3\") }")
    assert(BgpPlanner.evaluate(filterQuads, q2).collect()
      .map(_.getString(0)).toSeq == Seq("urn:d#3"))
    val q3 = Sparql.parse(fp +
      "SELECT ?t WHERE { ?s p:tag ?t . FILTER(SUBSTR(?t, 1, 1) = \"b\") }")
    assert(BgpPlanner.evaluate(filterQuads, q3).collect()
      .map(_.getString(0)).toSeq == Seq("beta"))
    // in HAVING: rejected loudly, not mis-evaluated
    val e = intercept[IllegalArgumentException] {
      BgpPlanner.evaluate(filterQuads, Sparql.parse(fp +
        "SELECT ?t (COUNT(?s) AS ?n) WHERE { ?s p:tag ?t . } " +
        "GROUP BY ?t HAVING (STRLEN(?t) > 4)")).collect()
    }
    assert(e.getMessage.contains("HAVING"))
  }

  test("BIND: STRAFTER/STRBEFORE absent-separator and empty-separator edges; STRLEN") {
    val q = Sparql.parse(fp +
      "SELECT ?t ?a ?b ?l WHERE { ?s p:tag ?t . " +
        "BIND(STRAFTER(?t, \"x\") AS ?a) BIND(STRBEFORE(?t, \"l\") AS ?b) " +
        "BIND(STRLEN(?t) AS ?l) } ORDER BY ?t")
    val rows = BgpPlanner.evaluate(filterQuads, q).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    // SPARQL: separator absent -> "" ; beta has no 'l' -> "" ; alpha -> "a"
    assert(rows.toSeq == Seq(("alpha", "", "a", "5"), ("beta", "", "", "4")))
  }

  test("BIND division: exact-integral, fractional double, by-zero, non-numeric") {
    // ?v is 5 for d#1 (see filterQuads): 5/5 = "1" (exact-integral branch,
    // canonical xsd:decimal of an integer is its plain lexical);
    // 5/2 = "2.5" (double branch, shortest-round-trip rendering);
    // 5/0 and a non-numeric operand (d#4) are SPARQL errors → unbound.
    val q = Sparql.parse(fp +
      "SELECT ?s ?e ?f ?z WHERE { ?s p:val ?v . " +
        "BIND(?v / 5 AS ?e) BIND(?v / 2 AS ?f) BIND(?v / 0 AS ?z) } ORDER BY ?s")
    val rows = BgpPlanner.evaluate(filterQuads, q).collect()
      .map(r => r.getString(0) ->
        (Option(r.getString(1)), Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(rows("urn:d#1") == ((Some("1"), Some("2.5"), None)))
    assert(rows("urn:d#4") == ((None, None, None))) // non-numeric lexical
    // negative dividend keeps exactness rules: -6/4 = "-1.5"
    val q2 = Sparql.parse(fp +
      "SELECT ?x WHERE { BIND(0 - 6 AS ?m) BIND(?m / 4 AS ?x) }")
    assert(BgpPlanner.evaluate(filterQuads, q2).collect()
      .map(_.getString(0)).toSeq == Seq("-1.5"))
  }

  test("BIND misuse rejected: rebinding, unknown var, decimals") {
    def bad(qs: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        BgpPlanner.evaluate(filterQuads, Sparql.parse(fp + qs)).collect()
      }
      assert(e.getMessage.contains(needle), s"$qs => ${e.getMessage}")
    }
    bad("SELECT ?s WHERE { ?s p:val ?v . BIND(?v + 1 AS ?v) }", "rebind")
    bad("SELECT ?s WHERE { ?s p:val ?v . BIND(?v + 1.5 AS ?x) }", "integer arithmetic")
    // a variable bound NOWHERE in the group is simply out of scope at the
    // BIND — §18.2.2.6 makes that an expression error = unbound alias
    // (round 11; previously rejected loudly)
    val unb = BgpPlanner.evaluate(filterQuads, Sparql.parse(fp +
      "SELECT ?s ?x WHERE { ?s p:val ?v . BIND(?nope AS ?x) }")).collect()
    assert(unb.nonEmpty && unb.forall(_.isNullAt(1)))
    // BIND inside OPTIONAL is supported since round 9 (group scope)
    val ok = BgpPlanner.evaluate(filterQuads, Sparql.parse(fp +
      "SELECT ?s ?x WHERE { ?s p:val ?v . OPTIONAL { ?s p:tag ?t . BIND(UCASE(?t) AS ?x) } }"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(ok("urn:d#1") == Some("ALPHA") && ok("urn:d#2").isEmpty)
  }

  test("p? zero-or-one: identity plus one step, targeted and var-var forms") {
    // const subject: sen1 itself + its direct type (no transitive closure)
    val q = Sparql.parse(prefix +
      "SELECT ?t WHERE { <urn:fix#sen1> rdf:type? ?t . }")
    val got = strings(BgpPlanner.evaluate(quads, q))
    assert(got.contains("urn:fix#sen1") &&
      got.contains("https://brickschema.org/schema/Brick#Zone_Air_Temperature_Sensor"))
    assert(!got.contains("https://brickschema.org/schema/Brick#Temperature_Sensor"))
    // sequence with ?: type then at-most-one subClassOf hop
    val q2 = Sparql.parse(prefix +
      "SELECT ?t WHERE { <urn:fix#sen1> rdf:type/rdfs:subClassOf? ?t . }")
    val got2 = strings(BgpPlanner.evaluate(quads, q2))
    assert(got2.toSet == Set(
      "https://brickschema.org/schema/Brick#Zone_Air_Temperature_Sensor",
      "https://brickschema.org/schema/Brick#Temperature_Sensor"))
    // var-var: every term relates to itself, plus the single-step edges
    val q3 = Sparql.parse(fp +
      "SELECT ?a ?b WHERE { ?a p:tag? ?b . VALUES ?a { <urn:d#1> } } ORDER BY ?b")
    assert(BgpPlanner.evaluate(filterQuads, q3).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("urn:d#1", "alpha"), ("urn:d#1", "urn:d#1")))
  }

  // ---- EXISTS / NOT EXISTS, IN, STRENDS ---------------------------------

  test("FILTER EXISTS keeps rows with a compatible match; NOT EXISTS inverts") {
    val q = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . FILTER EXISTS { ?s p:tag ?t } }")
    assert(strings(BgpPlanner.evaluate(filterQuads, q)).sorted
      == Seq("urn:d#1", "urn:d#3"))
    val q2 = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . FILTER NOT EXISTS { ?s p:tag ?t } }")
    assert(strings(BgpPlanner.evaluate(filterQuads, q2)).sorted
      == Seq("urn:d#2", "urn:d#4"))
    // ground object narrows the candidate group: only d1 has tag "alpha"
    val q3 = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . FILTER NOT EXISTS { ?s p:tag \"alpha\" } }")
    assert(strings(BgpPlanner.evaluate(filterQuads, q3)).sorted
      == Seq("urn:d#2", "urn:d#3", "urn:d#4"))
    // inner FILTER conditions the candidate group before the anti-join
    val q4 = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . FILTER EXISTS { ?s p:val ?w . FILTER(?w > 9) } }")
    assert(strings(BgpPlanner.evaluate(filterQuads, q4)).sorted
      == Seq("urn:d#2", "urn:d#3"))
  }

  test("uncorrelated EXISTS decides globally; ground-failure NOT EXISTS removes nothing") {
    // some ?x has tag "alpha" → every row survives
    val q = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . FILTER EXISTS { ?x p:tag \"alpha\" } }")
    assert(BgpPlanner.evaluate(filterQuads, q).count() == 4)
    // no ?x has tag "gamma" → nothing survives
    val q2 = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . FILTER EXISTS { ?x p:tag \"gamma\" } }")
    assert(BgpPlanner.evaluate(filterQuads, q2).count() == 0)
    // unsatisfiable ground triple inside NOT EXISTS → removes nothing
    val q3 = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . FILTER NOT EXISTS { <urn:d#9> p:val \"1\" . } }")
    assert(BgpPlanner.evaluate(filterQuads, q3).count() == 4)
  }

  test("EXISTS nested in a boolean expression is rejected with a named error") {
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(fp +
        "SELECT ?s WHERE { ?s p:val ?v . FILTER(EXISTS { ?s p:tag ?t } && ?v > 9) }")
    }
    assert(e.getMessage.contains("whole FILTER constraint"), e.getMessage)
  }

  test("IN restricts by =-disjunction; NOT IN numeric mode drops type errors") {
    val q = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . FILTER(?s IN (<urn:d#1>, <urn:d#3>)) }")
    assert(strings(BgpPlanner.evaluate(filterQuads, q)).sorted
      == Seq("urn:d#1", "urn:d#3"))
    // numeric mode ("5" = 5 numerically); "n/a" is a type error → dropped
    // for NOT IN just as for IN
    val q2 = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . FILTER(?v NOT IN (5, 10)) }")
    assert(strings(BgpPlanner.evaluate(filterQuads, q2)) == Seq("urn:d#3"))
  }

  test("STRENDS narrows on a suffix") {
    val q = Sparql.parse(fp +
      "SELECT ?s WHERE { ?s p:val ?v . FILTER(STRENDS(?s, \"1\")) }")
    assert(strings(BgpPlanner.evaluate(filterQuads, q)) == Seq("urn:d#1"))
  }

  // ---- GROUP_CONCAT / SAMPLE --------------------------------------------

  test("GROUP_CONCAT sorts values (deterministic order), honors SEPARATOR and DISTINCT") {
    val q = Sparql.parse(fp +
      "SELECT ?u (GROUP_CONCAT(?v; SEPARATOR=\",\") AS ?vs) " +
      "WHERE { ?u p:buy ?v . } GROUP BY ?u ORDER BY ?u")
    val r = BgpPlanner.evaluate(aggQuads, q).collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(r.toSeq == Seq(("urn:u#1", "3,7"), ("urn:u#2", "10,x"), ("urn:u#3", "2")))
    // global, default " " separator, DISTINCT collapses duplicates
    val q2 = Sparql.parse(fp +
      "SELECT (GROUP_CONCAT(DISTINCT ?v) AS ?all) WHERE { ?d p:val ?v . }")
    assert(BgpPlanner.evaluate(filterQuads, q2).collect().head.getString(0)
      == "10 5 50 n/a")
  }

  test("SAMPLE returns a deterministic representative (min)") {
    val q = Sparql.parse(fp +
      "SELECT ?u (SAMPLE(?v) AS ?one) WHERE { ?u p:buy ?v . } GROUP BY ?u ORDER BY ?u")
    val r = BgpPlanner.evaluate(aggQuads, q).collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(r.toSeq == Seq(("urn:u#1", "3"), ("urn:u#2", "10"), ("urn:u#3", "2")))
  }

  test("SEPARATOR on a non-GROUP_CONCAT aggregate is rejected") {
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(fp +
        "SELECT (SUM(?v; SEPARATOR=\",\") AS ?s) WHERE { ?d p:val ?v . }")
    }
    assert(e.getMessage.contains("GROUP_CONCAT"), e.getMessage)
  }

  // ---- subqueries -------------------------------------------------------

  test("subquery joins the outer group on its projected variables") {
    val q = Sparql.parse(fp +
      "SELECT DISTINCT ?u ?n WHERE { ?u p:buy ?v . " +
      "{ SELECT ?u (COUNT(?w) AS ?n) WHERE { ?u p:buy ?w . } GROUP BY ?u } } " +
      "ORDER BY ?u")
    val r = BgpPlanner.evaluate(aggQuads, q).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq(("urn:u#1", 2L), ("urn:u#2", 2L), ("urn:u#3", 1L)))
  }

  test("subquery solution modifiers (ORDER/LIMIT) bound the join input") {
    val q = Sparql.parse(fp +
      "SELECT DISTINCT ?u WHERE { ?u p:buy ?v . " +
      "{ SELECT ?u WHERE { ?u p:buy ?w . } GROUP BY ?u ORDER BY ?u LIMIT 2 } } " +
      "ORDER BY ?u")
    assert(strings(BgpPlanner.evaluate(aggQuads, q)) == Seq("urn:u#1", "urn:u#2"))
  }

  test("SELECT * subqueries are rejected with a named error") {
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(fp +
        "SELECT ?u WHERE { ?u p:buy ?v . { SELECT * WHERE { ?u p:buy ?w . } } }")
    }
    assert(e.getMessage.contains("explicit variables"), e.getMessage)
  }

  // ---- ASK / CONSTRUCT --------------------------------------------------

  test("ASK: one true/false row; FILTERs and ground-only groups behave") {
    def ask(s: String): String =
      BgpPlanner.evaluate(filterQuads, Sparql.parse(fp + s))
        .collect().map(_.getString(0)).head
    assert(ask("ASK { ?s p:val \"5\" . }") == "true")
    assert(ask("ASK { ?s p:val \"999\" . }") == "false")
    assert(ask("ASK { ?s p:val ?v . FILTER(?v > 40) }") == "true")
    assert(ask("ASK { ?s p:val ?v . FILTER(?v > 400) }") == "false")
    // all-ground group: matched → the one empty-mapping solution → true
    assert(ask("ASK WHERE { <urn:d#1> p:val \"5\" . }") == "true")
    assert(ask("ASK WHERE { <urn:d#1> p:val \"6\" . }") == "false")
  }

  test("CONSTRUCT instantiates the template per solution, distinct, unbound dropped") {
    val q = Sparql.parse(fp +
      "CONSTRUCT { ?s <urn:p#hasVal> ?v . ?s <urn:p#isDoc> \"y\" } " +
      "WHERE { ?s p:val ?v . FILTER(?v > 9) }")
    val got = BgpPlanner.evaluate(filterQuads, q).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("urn:d#2", "urn:p#hasVal", "10"), ("urn:d#3", "urn:p#hasVal", "50"),
      ("urn:d#2", "urn:p#isDoc", "y"), ("urn:d#3", "urn:p#isDoc", "y")))
    // OPTIONAL-unbound template var → triple not generated (§16.2)
    val q2 = Sparql.parse(fp +
      "CONSTRUCT { ?s <urn:p#tagOf> ?t } " +
      "WHERE { ?s p:val ?v . OPTIONAL { ?s p:tag ?t } }")
    val got2 = BgpPlanner.evaluate(filterQuads, q2).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(got2 == Set(("urn:d#1", "alpha"), ("urn:d#3", "beta")))
    // multiple solutions per subject collapse under DISTINCT (a graph is a set)
    val q3 = Sparql.parse(fp +
      "CONSTRUCT { ?u <urn:p#active> \"y\" } WHERE { ?u p:buy ?v . }")
    assert(BgpPlanner.evaluate(aggQuads, q3).count() == 3)
  }

  test("DESCRIBE: constant form, variable form with WHERE, mixed; var form needs WHERE") {
    // constant form: all subject-position triples of d#1
    val q = Sparql.parse(fp + "DESCRIBE <urn:d#1>")
    val got = BgpPlanner.evaluate(filterQuads, q).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(got == Set(("urn:p#val", "5"), ("urn:p#tag", "alpha")))
    // variable form: describe every doc whose val > 9 (d#2, d#3)
    val q2 = Sparql.parse(fp +
      "DESCRIBE ?s WHERE { ?s p:val ?v . FILTER(?v > 9) }")
    val got2 = BgpPlanner.evaluate(filterQuads, q2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got2 == Set(
      ("urn:d#2", "urn:p#val", "10"),
      ("urn:d#3", "urn:p#val", "50"), ("urn:d#3", "urn:p#tag", "beta")))
    // mixed constants + variables union their descriptions (set semantics)
    val q3 = Sparql.parse(fp +
      "DESCRIBE <urn:d#2> ?s WHERE { ?s p:tag \"alpha\" . }")
    val got3 = BgpPlanner.evaluate(filterQuads, q3).collect()
      .map(_.getString(0)).toSet
    assert(got3 == Set("urn:d#1", "urn:d#2"))
    // a resource with no subject triples describes to nothing
    assert(BgpPlanner.evaluate(filterQuads,
      Sparql.parse(fp + "DESCRIBE <urn:d#99>")).count() == 0)
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(fp + "DESCRIBE ?s")
    }
    assert(e.getMessage.contains("WHERE"), e.getMessage)
  }

  test("CONSTRUCT template misuse rejected: paths, unbound template vars") {
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(fp + "CONSTRUCT { ?s p:a/p:b ?v } WHERE { ?s p:val ?v . }")
    }
    assert(e.getMessage.contains("plain IRIs"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      BgpPlanner.evaluate(filterQuads, Sparql.parse(fp +
        "CONSTRUCT { ?s <urn:p#x> ?nowhere } WHERE { ?s p:val ?v . }")).collect()
    }
    assert(e2.getMessage.contains("no WHERE pattern"), e2.getMessage)
  }

  test("ambiguous alternative forms are rejected with named errors") {
    val seqMix = intercept[IllegalArgumentException] {
      Sparql.parse(prefix + "SELECT ?x WHERE { ?x rdfs:subClassOf|rdf:type/rdfs:subClassOf ?y . }")
    }
    assert(seqMix.getMessage.contains("parenthesize"), seqMix.getMessage)
    val perAlt = intercept[IllegalArgumentException] {
      Sparql.parse(prefix + "SELECT ?x WHERE { ?x (rdfs:subClassOf*|rdf:type) ?y . }")
    }
    assert(perAlt.getMessage.contains("per-alternative"), perAlt.getMessage)
    val modMix = intercept[IllegalArgumentException] {
      Sparql.parse(prefix + "SELECT ?x WHERE { ?x rdfs:subClassOf*|rdf:type ?y . }")
    }
    assert(modMix.getMessage.contains("parenthesize"), modMix.getMessage)
  }

  // --- ORDER BY non-projected keys (§18.2.5, round 11) ---------------------

  test("ORDER BY may use an in-scope non-projected var; DISTINCT still requires projection") {
    val s = spark
    import s.implicits._
    val d = Seq(
      Quad("urn:g#", "urn:u#1", "urn:p#score", "1"),
      Quad("urn:g#", "urn:u#2", "urn:p#score", "2"),
      Quad("urn:g#", "urn:u#1", "urn:p#name", "A"),
      Quad("urn:g#", "urn:u#2", "urn:p#name", "B")).map(TestTerms.t).toDF()
    val got = BgpPlanner.evaluate(d, Sparql.parse(
        "PREFIX p: <urn:p#> SELECT ?n WHERE { ?u p:name ?n . ?u p:score ?sc . } " +
          "ORDER BY DESC(?sc)"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("B", "A"))
    val e = intercept[IllegalArgumentException] {
      BgpPlanner.evaluate(d, Sparql.parse(
        "PREFIX p: <urn:p#> SELECT DISTINCT ?n WHERE { ?u p:name ?n . " +
          "?u p:score ?sc . } ORDER BY DESC(?sc)")).collect()
    }
    assert(e.getMessage.contains("DISTINCT"), e.getMessage)
  }

  // --- negated property sets (§9.1, round 11) ------------------------------

  /** 4-edge micro graph: d1 -hasPoint-> p1, d1 -hasPart-> p2,
    * d1 -label-> "x", p2 -feeds-> d2. */
  lazy val npsQuads = {
    val s = spark
    import s.implicits._
    Seq(
      Quad("urn:g#", "urn:d#1", "urn:p#hasPoint", "urn:pt#1"),
      Quad("urn:g#", "urn:d#1", "urn:p#hasPart", "urn:pt#2"),
      Quad("urn:g#", "urn:d#1", "urn:p#label", "x"),
      Quad("urn:g#", "urn:pt#2", "urn:p#feeds", "urn:d#2")).map(TestTerms.t).toDF()
  }
  val npsPrefix = "PREFIX p: <urn:p#> "

  private def pairs(query: String): Set[(String, String)] =
    BgpPlanner.evaluate(npsQuads, Sparql.parse(npsPrefix + query))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("NPS forward: !p and !(p|q) exclude exactly those predicates") {
    assert(pairs("SELECT ?s ?o WHERE { ?s !p:hasPoint ?o . }") == Set(
      ("urn:d#1", "urn:pt#2"), ("urn:d#1", "x"), ("urn:pt#2", "urn:d#2")))
    assert(pairs("SELECT ?s ?o WHERE { ?s !(p:hasPoint|p:label) ?o . }") == Set(
      ("urn:d#1", "urn:pt#2"), ("urn:pt#2", "urn:d#2")))
  }

  test("NPS inverse-only: !^p is reversed edges avoiding p — no forward part") {
    assert(pairs("SELECT ?s ?o WHERE { ?s !^p:feeds ?o . }") == Set(
      ("urn:pt#1", "urn:d#1"), ("urn:pt#2", "urn:d#1"), ("x", "urn:d#1")))
    // !(^p|^q): both directions excluded from the INVERSE part only
    assert(pairs("SELECT ?s ?o WHERE { ?s !(^p:feeds|^p:label) ?o . }") == Set(
      ("urn:pt#1", "urn:d#1"), ("urn:pt#2", "urn:d#1")))
  }

  test("NPS mixed set: forward part ∪ inverse part, per the §9.1 translation") {
    // !(hasPoint|^hasPoint) = fwd{hasPart,label,feeds} ∪ inv{hasPart,label,feeds}
    assert(pairs("SELECT ?s ?o WHERE { ?s !(p:hasPoint|^p:hasPoint) ?o . }") == Set(
      ("urn:d#1", "urn:pt#2"), ("urn:d#1", "x"), ("urn:pt#2", "urn:d#2"),
      ("urn:pt#2", "urn:d#1"), ("x", "urn:d#1"), ("urn:d#2", "urn:pt#2")))
  }

  test("NPS in sequences, with constants, and under closure modifiers") {
    // sequence: d1 -hasPart-> pt2 -(anything but label: feeds)-> d2
    assert(pairs("SELECT ?s ?o WHERE { ?s p:hasPart/!p:label ?o . }") ==
      Set(("urn:d#1", "urn:d#2")))
    // constant subject, targeted closure: everything reachable from d1
    // via non-label predicates, 1+ steps
    val rows = BgpPlanner.evaluate(npsQuads, Sparql.parse(npsPrefix +
        "SELECT ?o WHERE { <urn:d#1> !p:label+ ?o . }"))
      .collect().map(_.getString(0)).toSet
    assert(rows == Set("urn:pt#1", "urn:pt#2", "urn:d#2"))
  }

  test("NPS inside GRAPH ?var: exclusion scoped per graph, plain and closed") {
    val s = spark
    import s.implicits._
    val d = Seq(
      Quad("urn:ga#", "urn:d#a", "urn:p#p", "urn:d#b"),
      Quad("urn:ga#", "urn:d#a", "urn:p#q", "urn:d#c"),
      Quad("urn:ga#", "urn:d#b", "urn:p#r", "urn:d#e"),
      Quad("urn:gb#", "urn:d#a", "urn:p#p", "urn:d#f")).map(TestTerms.t).toDF()
    // plain step: per-graph non-q edges from a
    val plain = BgpPlanner.evaluate(d, Sparql.parse(npsPrefix +
        "SELECT ?g ?o WHERE { GRAPH ?g { <urn:d#a> !p:q ?o . } }"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(plain == Set(("urn:ga#", "urn:d#b"), ("urn:gb#", "urn:d#f")))
    // closure modifier: !q+ rides the graph-encoded fixpoint; the r edge
    // extends the chain within ga only
    val closed = BgpPlanner.evaluate(d, Sparql.parse(npsPrefix +
        "SELECT ?g ?o WHERE { GRAPH ?g { <urn:d#a> !p:q+ ?o . } }"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(closed == Set(("urn:ga#", "urn:d#b"), ("urn:ga#", "urn:d#e"),
      ("urn:gb#", "urn:d#f")))
  }

  test("NPS out-of-subset alternatives are rejected loudly") {
    val a = intercept[IllegalArgumentException] {
      Sparql.parse(npsPrefix + "SELECT ?s ?o WHERE { ?s !p:a|p:b ?o . }")
    }
    assert(a.getMessage.contains("negate"), a.getMessage)
    val b = intercept[IllegalArgumentException] {
      Sparql.parse(npsPrefix + "SELECT ?s ?o WHERE { ?s p:a|!p:b ?o . }")
    }
    assert(b.getMessage.contains("negate"), b.getMessage)
  }

  // ---- §17.4.4/5/6 builtins (round 11): numerics, hashes, dateTime ------

  lazy val fnQuads = {
    val s = spark
    import s.implicits._
    Seq(
      Quad("urn:g#", "urn:x#1", "urn:p#num", "-3"),
      Quad("urn:g#", "urn:x#2", "urn:p#num", "2.5"),
      Quad("urn:g#", "urn:x#3", "urn:p#num", "-2.5"),
      Quad("urn:g#", "urn:x#4", "urn:p#num", "10.1"),
      Quad("urn:g#", "urn:x#5", "urn:p#num", "abc"),
      Quad("urn:g#", "urn:x#1", "urn:p#when", "2010-06-21T11:28:01Z"),
      Quad("urn:g#", "urn:x#2", "urn:p#when", "1999-12-31T23:59:59.5-08:00"),
      Quad("urn:g#", "urn:x#3", "urn:p#when", "2024-02-29T00:07:30"),
      Quad("urn:g#", "urn:x#4", "urn:p#when", "not-a-date"),
      Quad("urn:g#", "urn:x#1", "urn:p#s", "abc"),
      Quad("urn:g#", "urn:x#2", "urn:p#s", "Los Angeles"),
      Quad("urn:g#", "urn:x#3", "urn:p#s", "01")).map(TestTerms.t).toDF()
  }
  private def fnRows(query: String): Map[String, String] =
    BgpPlanner.evaluate(fnQuads, Sparql.parse(npsPrefix + query))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap

  test("numeric builtins: ABS exact-long and double paths; non-numeric → unbound") {
    val abs = fnRows("SELECT ?x ?a WHERE { ?x p:num ?n . BIND(ABS(?n) AS ?a) }")
    assert(abs == Map("urn:x#1" -> "3", "urn:x#2" -> "2.5",
      "urn:x#3" -> "2.5", "urn:x#4" -> "10.1", "urn:x#5" -> null))
  }

  test("CEIL/FLOOR: integer lexicals are identity, decimals go to integers") {
    val ceil = fnRows("SELECT ?x ?c WHERE { ?x p:num ?n . BIND(CEIL(?n) AS ?c) }")
    assert(ceil == Map("urn:x#1" -> "-3", "urn:x#2" -> "3",
      "urn:x#3" -> "-2", "urn:x#4" -> "11", "urn:x#5" -> null))
    val floor = fnRows("SELECT ?x ?f WHERE { ?x p:num ?n . BIND(FLOOR(?n) AS ?f) }")
    assert(floor == Map("urn:x#1" -> "-3", "urn:x#2" -> "2",
      "urn:x#3" -> "-3", "urn:x#4" -> "10", "urn:x#5" -> null))
  }

  test("ROUND is XPath half-toward-+∞: ROUND(-2.5) = -2, not -3") {
    val round = fnRows("SELECT ?x ?r WHERE { ?x p:num ?n . BIND(ROUND(?n) AS ?r) }")
    assert(round == Map("urn:x#1" -> "-3", "urn:x#2" -> "3",
      "urn:x#3" -> "-2", "urn:x#4" -> "10", "urn:x#5" -> null))
  }

  test("numeric builtin as a FILTER operand joins the comparison dispatch") {
    val got = fnRows(
      "SELECT ?x ?n WHERE { ?x p:num ?n . FILTER(ABS(?n) >= 3) }")
    assert(got == Map("urn:x#1" -> "-3", "urn:x#4" -> "10.1"))
  }

  test("hash builtins match the published test vectors for \"abc\"") {
    val md5 = fnRows(
      "SELECT ?x ?h WHERE { ?x p:s ?v . FILTER(?v = \"abc\") BIND(MD5(?v) AS ?h) }")
    assert(md5("urn:x#1") == "900150983cd24fb0d6963f7d28e17f72")
    val sha1 = fnRows(
      "SELECT ?x ?h WHERE { ?x p:s ?v . FILTER(?v = \"abc\") BIND(SHA1(?v) AS ?h) }")
    assert(sha1("urn:x#1") == "a9993e364706816aba3e25717850c26c9cd0d89d")
    val sha256 = fnRows(
      "SELECT ?x ?h WHERE { ?x p:s ?v . FILTER(?v = \"abc\") BIND(SHA256(?v) AS ?h) }")
    assert(sha256("urn:x#1") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("ENCODE_FOR_URI: unreserved kept, space %20, UTF-8 bytes uppercase hex") {
    val got = fnRows(
      "SELECT ?x ?e WHERE { ?x p:s ?v . BIND(ENCODE_FOR_URI(?v) AS ?e) }")
    assert(got("urn:x#2") == "Los%20Angeles")
    assert(got("urn:x#1") == "abc")
    // non-ASCII and reserved characters, via a constant argument
    val c = fnRows("SELECT ?x ?e WHERE { ?x p:s ?v . FILTER(?v = \"abc\") " +
      "BIND(ENCODE_FOR_URI(\"urn:a#é ~_\") AS ?e) }")
    assert(c("urn:x#1") == "urn%3Aa%23%C3%A9%20~_")
  }

  test("dateTime accessors extract the lexical's own components — no zone shift") {
    def acc(fn: String): Map[String, String] =
      fnRows(s"SELECT ?x ?v WHERE { ?x p:when ?t . BIND($fn(?t) AS ?v) }")
    assert(acc("YEAR") == Map("urn:x#1" -> "2010", "urn:x#2" -> "1999",
      "urn:x#3" -> "2024", "urn:x#4" -> null))
    assert(acc("MONTH")("urn:x#2") == "12") // NOT shifted into UTC (would be 1)
    assert(acc("DAY")("urn:x#2") == "31")
    assert(acc("HOURS") == Map("urn:x#1" -> "11", "urn:x#2" -> "23",
      "urn:x#3" -> "0", "urn:x#4" -> null))
    assert(acc("MINUTES")("urn:x#3") == "7")
    assert(acc("SECONDS") == Map("urn:x#1" -> "1", "urn:x#2" -> "59.5",
      "urn:x#3" -> "30", "urn:x#4" -> null))
    assert(acc("TZ") == Map("urn:x#1" -> "Z", "urn:x#2" -> "-08:00",
      "urn:x#3" -> "", "urn:x#4" -> null))
  }

  test("dateTime builtin as a FILTER operand: numeric comparison of MONTH") {
    val got = fnRows(
      "SELECT ?x ?t WHERE { ?x p:when ?t . FILTER(MONTH(?t) = 12) }")
    assert(got.keySet == Set("urn:x#2"))
  }

  test("sameTerm is lexical identity — no numeric promotion, unlike =") {
    // "01" = 1 numeric-dispatches true; sameTerm("01", 1) is false
    val eq = fnRows("SELECT ?x ?v WHERE { ?x p:s ?v . FILTER(?v = 1) }")
    assert(eq.keySet == Set("urn:x#3"))
    val st = fnRows("SELECT ?x ?v WHERE { ?x p:s ?v . FILTER(sameTerm(?v, 1)) }")
    assert(st.isEmpty)
    val stv = fnRows(
      "SELECT ?x ?v WHERE { ?x p:s ?v . FILTER(sameTerm(?v, \"01\")) }")
    assert(stv.keySet == Set("urn:x#3"))
  }

  test("isNumeric accepts numeric lexicals; isBlank tests the _: encoding") {
    val nums = fnRows(
      "SELECT ?x ?n WHERE { ?x p:num ?n . FILTER(isNumeric(?n)) }")
    assert(nums.keySet ==
      Set("urn:x#1", "urn:x#2", "urn:x#3", "urn:x#4"))
    // blank nodes come from the Turtle fixture's [ ... ] syntax
    val blanks = BgpPlanner.evaluate(quads, Sparql.parse(prefix +
      "SELECT ?s ?b WHERE { ?s brick:timeseries ?b . FILTER(isBlank(?b)) }"))
      .collect()
    assert(blanks.length == 2)
    val none = BgpPlanner.evaluate(quads, Sparql.parse(prefix +
      "SELECT ?s ?b WHERE { ?s brick:timeseries ?b . FILTER(!isBlank(?s)) }"))
      .collect()
    assert(none.length == 2) // subjects are IRIs, never blank-encoded
  }

  test("isIRI/isLiteral decide from the round-13 encoding; LANG/DATATYPE " +
      "type-error on IRIs") {
    val s = spark
    import s.implicits._
    val d = Seq(
      Quad("urn:g#", "urn:x#1", "urn:p#v", "urn:other#iri"),
      Quad("urn:g#", "urn:x#2", "urn:p#v", "plain string"),
      Quad("urn:g#", "urn:x#3", "urn:p#v", "5"),
      Quad("urn:g#", "urn:x#4", "urn:p#v", "\"tagged\"@en"),
      Quad("urn:g#", "urn:x#5", "urn:p#v", "\"P1Y\"^^<urn:t#dur>"),
      Quad("urn:g#", "urn:x#6", "urn:p#v", "_:b0")).map(TestTerms.t).toDF()
    def ids(q: String): Set[String] =
      BgpPlanner.evaluate(d, Sparql.parse(npsPrefix + q))
        .collect().map(_.getString(0)).toSet
    // isIRI: exactly the bare-IRI object (subjects/IRI objects only);
    // isURI is the synonym
    assert(ids("SELECT ?s WHERE { ?s p:v ?o . FILTER(isIRI(?o)) }") ==
      Set("urn:x#1"))
    assert(ids("SELECT ?s WHERE { ?s p:v ?o . FILTER(isURI(?o)) }") ==
      Set("urn:x#1"))
    // isLiteral: quoted plain/tagged/typed + the bare numeric shorthand;
    // never the IRI or the blank node
    assert(ids("SELECT ?s WHERE { ?s p:v ?o . FILTER(isLiteral(?o)) }") ==
      Set("urn:x#2", "urn:x#3", "urn:x#4", "urn:x#5"))
    // the three term-class tests partition every term
    assert(ids("SELECT ?s WHERE { ?s p:v ?o . " +
      "FILTER(!isLiteral(?o) && !isIRI(?o) && !isBlank(?o)) }").isEmpty)
    // LANG/DATATYPE on an IRI are type errors: the BIND alias stays
    // unbound where a literal (even an untagged one) binds
    val lang = BgpPlanner.evaluate(d, Sparql.parse(npsPrefix +
      "SELECT ?s ?l WHERE { ?s p:v ?o . BIND(LANG(?o) AS ?l) }"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(lang("urn:x#1").isEmpty && lang("urn:x#6").isEmpty)
    assert(lang("urn:x#2") == Some("") && lang("urn:x#4") == Some("en"))
    val dt = BgpPlanner.evaluate(d, Sparql.parse(npsPrefix +
      "SELECT ?s ?t WHERE { ?s p:v ?o . BIND(DATATYPE(?o) AS ?t) }"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(dt("urn:x#1").isEmpty && dt("urn:x#6").isEmpty)
    assert(dt("urn:x#2") == Some("http://www.w3.org/2001/XMLSchema#string"))
    assert(dt("urn:x#3") == Some("http://www.w3.org/2001/XMLSchema#integer"))
    assert(dt("urn:x#5") == Some("urn:t#dur"))
  }

  // ---- §18.2.2.6 BIND positional scope (round 11) -----------------------

  lazy val bindQuads = {
    val s = spark
    import s.implicits._
    Seq(
      Quad("urn:g#", "urn:b#1", "urn:p#p", "1"),
      Quad("urn:g#", "urn:b#2", "urn:p#p", "2"),
      Quad("urn:g#", "urn:b#3", "urn:p#p", "abc"),
      Quad("urn:g#", "urn:x#1", "urn:p#q", "2"),
      Quad("urn:g#", "urn:x#2", "urn:p#q", "3")).map(TestTerms.t).toDF()
  }

  test("BIND alias joins a LATER pattern in the group (Extend-then-Join)") {
    // s=b1: z = 1+1 = "2" joins x1; s=b2: z = "3" joins x2; s=b3: expr
    // errors (z unbound) — compatible with ANY later binding, so b3
    // pairs with BOTH x rows (SPARQL compatibility, not SQL null-drop)
    val got = BgpPlanner.evaluate(bindQuads, Sparql.parse(npsPrefix +
        "SELECT ?s ?x WHERE { ?s p:p ?o . BIND(?o + 1 AS ?z) ?x p:q ?z }"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("urn:b#1", "urn:x#1"), ("urn:b#2", "urn:x#2"),
      ("urn:b#3", "urn:x#1"), ("urn:b#3", "urn:x#2")))
  }

  test("BIND forward reference evaluates to unbound, never the later binding") {
    // ?o is bound by the pattern AFTER the BIND: at the BIND's position
    // the scope is empty, so ?z is unbound for every row (§18.2.2.6) —
    // NOT o+1
    val got = BgpPlanner.evaluate(bindQuads, Sparql.parse(npsPrefix +
        "SELECT ?s ?z WHERE { BIND(?o + 1 AS ?z) ?s p:p ?o . }"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(got == Set(("urn:b#1", None), ("urn:b#2", None),
      ("urn:b#3", None)))
  }

  test("BIND rebinding an in-scope variable is a loud syntax error") {
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(npsPrefix +
        "SELECT ?o WHERE { ?s p:p ?o . BIND(2 AS ?o) }")
    }
    assert(e.getMessage.contains("rebind"), e.getMessage)
    // … including an earlier BIND's alias
    val e2 = intercept[IllegalArgumentException] {
      Sparql.parse(npsPrefix +
        "SELECT ?z WHERE { BIND(1 AS ?z) BIND(2 AS ?z) }")
    }
    assert(e2.getMessage.contains("rebind"), e2.getMessage)
  }

  // ---- variable predicates (round 11) ------------------------------------

  lazy val vpQuads = {
    val s = spark
    import s.implicits._
    Seq(
      Quad("urn:ga#", "urn:v#1", "urn:p#knows", "urn:v#2"),
      Quad("urn:ga#", "urn:v#1", "urn:p#likes", "urn:v#3"),
      Quad("urn:ga#", "urn:v#2", "urn:p#knows", "urn:v#1"),
      Quad("urn:gb#", "urn:v#3", "urn:p#self", "urn:v#3")).map(TestTerms.t).toDF()
  }

  test("variable predicate: ?s ?p ?o scans the store; constants restrict") {
    val all = BgpPlanner.evaluate(vpQuads, Sparql.parse(
        "SELECT ?s ?p ?o WHERE { ?s ?p ?o . }"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(all == Set(
      ("urn:v#1", "urn:p#knows", "urn:v#2"),
      ("urn:v#1", "urn:p#likes", "urn:v#3"),
      ("urn:v#2", "urn:p#knows", "urn:v#1"),
      ("urn:v#3", "urn:p#self", "urn:v#3")))
    // constant subject: which predicates leave v1?
    val out = BgpPlanner.evaluate(vpQuads, Sparql.parse(
        "SELECT ?p WHERE { <urn:v#1> ?p ?o . }"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("urn:p#knows", "urn:p#likes"))
  }

  test("variable predicate: repeated vars filter (self-loop, pred=object)") {
    val loops = BgpPlanner.evaluate(vpQuads, Sparql.parse(
        "SELECT ?x ?p WHERE { ?x ?p ?x . }"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(loops == Set(("urn:v#3", "urn:p#self")))
  }

  test("variable predicate joins: same verb var across atoms") {
    // pairs connected BOTH ways by the SAME predicate
    val mutual = BgpPlanner.evaluate(vpQuads, Sparql.parse(
        "SELECT ?a ?b ?p WHERE { ?a ?p ?b . ?b ?p ?a . FILTER(?a != ?b) }"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(mutual == Set(("urn:v#1", "urn:v#2"), ("urn:v#2", "urn:v#1")))
    // FILTER over the verb var
    val filtered = BgpPlanner.evaluate(vpQuads, Sparql.parse(
        "SELECT ?s WHERE { ?s ?p ?o . FILTER(STRENDS(?p, \"likes\")) }"))
      .collect().map(_.getString(0)).toSet
    assert(filtered == Set("urn:v#1"))
  }

  test("variable predicate under GRAPH ?g, including ?g as the verb") {
    val byGraph = BgpPlanner.evaluate(vpQuads, Sparql.parse(
        "SELECT ?g ?p WHERE { GRAPH ?g { ?s ?p ?o . } }"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(byGraph == Set(
      ("urn:ga#", "urn:p#knows"), ("urn:ga#", "urn:p#likes"),
      ("urn:gb#", "urn:p#self")))
    // verb var = graph var: predicate must equal the row's graph name —
    // no such row in the fixture
    val none = BgpPlanner.evaluate(vpQuads, Sparql.parse(
        "SELECT ?g WHERE { GRAPH ?g { ?s ?g ?o . } }")).collect()
    assert(none.isEmpty)
  }

  test("variable predicate cannot take path syntax — loud rejections") {
    val e = intercept[IllegalArgumentException] {
      Sparql.parse("SELECT ?s WHERE { ?s ?p* ?o . }")
    }
    assert(e.getMessage.contains("Path"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Sparql.parse(npsPrefix + "SELECT ?s WHERE { ?s ?p/p:q ?o . }")
    }
    assert(e2.getMessage.contains("Path"), e2.getMessage)
  }

  test("BIND alias consumed by a later OPTIONAL/structure is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(npsPrefix +
        "SELECT ?s WHERE { ?s p:p ?o . BIND(?o AS ?z) OPTIONAL { ?x p:q ?z } }")
    }
    assert(e.getMessage.contains("positional"), e.getMessage)
    // the same construct BEFORE the BIND is fine (and was always legal)
    val ok = BgpPlanner.evaluate(bindQuads, Sparql.parse(npsPrefix +
      "SELECT ?s ?w WHERE { ?s p:p ?o . OPTIONAL { ?x p:q ?o } " +
        "BIND(CONCAT(?o, \"!\") AS ?w) }")).collect()
    assert(ok.nonEmpty)
  }

  // ---- typed / language-tagged literals (round 11) -----------------------

  lazy val litQuads = {
    val s = spark
    import s.implicits._
    Turtle.parse(
      """@prefix p: <urn:p#> .
        |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        |p:a p:lab "chat"@en ; p:v "1"^^xsd:integer .
        |p:b p:lab "chat"@fr ; p:v "2.0"^^xsd:float .
        |p:c p:lab "chat" ; p:v "abc"^^<urn:t#x> .
        |p:d p:lab "cat"@en-GB .
        |""".stripMargin, "lit")
      .map { case (su, pr, o) => Quad("urn:lit#", su, pr, o) }.map(TestTerms.t).toDF()
  }
  val lp = "PREFIX p: <urn:p#> PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "

  test("a tagged constant matches ONLY the same-tagged term; DISTINCT is on terms") {
    val en = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s WHERE { ?s p:lab \"chat\"@en . }")).collect()
    assert(en.map(_.getString(0)).toSeq == Seq("urn:p#a"))
    val plain = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s WHERE { ?s p:lab \"chat\" . }")).collect()
    assert(plain.map(_.getString(0)).toSeq == Seq("urn:p#c"))
    // DISTINCT counts "chat"@en / "chat"@fr / "chat" as three TERMS even
    // though all three project to the same lexical at the boundary
    val d = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT DISTINCT ?l WHERE { ?s p:lab ?l . FILTER(STR(?l) = \"chat\") }"))
      .collect()
    assert(d.length == 3 && d.forall(_.getString(0) == "chat"))
  }

  test("result boundary strips annotations — but only at the OUTERMOST select") {
    val r = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s ?l WHERE { ?s p:lab ?l . } ORDER BY ?s")).collect()
    assert(r.map(_.getString(1)).toSeq == Seq("chat", "chat", "chat", "cat"))
    // a subquery keeps the encoding alive: the outer FILTER still sees
    // the tag through LANG()
    val sub = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s WHERE { { SELECT ?s ?l WHERE { ?s p:lab ?l . } } " +
        "FILTER LANGMATCHES(LANG(?l), \"fr\") }")).collect()
    assert(sub.map(_.getString(0)).toSeq == Seq("urn:p#b"))
  }

  test("LANG / LANGMATCHES: tag extraction, RFC-4647 prefix ranges, '*'") {
    val en = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s WHERE { ?s p:lab ?l . " +
        "FILTER LANGMATCHES(LANG(?l), \"en\") } ORDER BY ?s")).collect()
    assert(en.map(_.getString(0)).toSeq == Seq("urn:p#a", "urn:p#d"))
    val any = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s WHERE { ?s p:lab ?l . " +
        "FILTER LANGMATCHES(LANG(?l), \"*\") } ORDER BY ?s")).collect()
    assert(any.map(_.getString(0)).toSeq ==
      Seq("urn:p#a", "urn:p#b", "urn:p#d"))
    val tag = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s ?t WHERE { ?s p:lab ?l . BIND(LANG(?l) AS ?t) } ORDER BY ?s"))
      .collect()
    // tags lowercase at load (round 12, RDF 1.1 case-insensitive term
    // equality) — LANG reports the normalized form
    assert(tag.map(_.getString(1)).toSeq == Seq("en", "fr", "", "en-gb"))
  }

  test("DATATYPE: annotation, shape shorthand, rdf:langString") {
    val X = "http://www.w3.org/2001/XMLSchema#"
    val dt = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s ?d WHERE { ?s p:v ?v . BIND(DATATYPE(?v) AS ?d) } " +
        "ORDER BY ?s")).collect()
    // "1"^^xsd:integer normalized bare → shape recovers xsd:integer;
    // "2.0"^^xsd:float kept annotated (shape says decimal) → the IRI;
    // custom urn:t#x kept annotated → the IRI
    assert(dt.map(_.getString(1)).toSeq ==
      Seq(s"${X}integer", s"${X}float", "urn:t#x"))
    val lab = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s ?d WHERE { ?s p:lab ?l . BIND(DATATYPE(?l) AS ?d) } " +
        "ORDER BY ?s")).collect()
    assert(lab.map(_.getString(1)).toSeq == Seq(
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
      s"${X}string",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"))
  }

  test("STRLANG / STRDT constructors round-trip their accessors; errors → unbound") {
    val r = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?t ?d ?bad WHERE { p:c p:lab ?l . " +
        "BIND(STRLANG(?l, \"de\") AS ?g) BIND(LANG(?g) AS ?t) " +
        "BIND(STRDT(?l, <urn:t#k>) AS ?k) BIND(DATATYPE(?k) AS ?d) " +
        // STRLANG over an already-TAGGED literal is a type error → NULL
        "p:a p:lab ?en . BIND(STRLANG(?en, \"de\") AS ?bad) }")).collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "de")
    assert(r(0).getString(1) == "urn:t#k")
    assert(r(0).isNullAt(2))
  }

  test("string/numeric builtins read the LEXICAL form of annotated terms") {
    val r = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?n ?u WHERE { p:a p:lab ?l . " +
        "BIND(STRLEN(?l) AS ?n) BIND(UCASE(?l) AS ?u) }")).collect()
    assert(r(0).getString(0) == "4" && r(0).getString(1) == "CHAT")
    // FILTER string predicates likewise: the tag is invisible to regex
    val f = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s WHERE { ?s p:lab ?l . FILTER regex(?l, \"^chat$\") } " +
        "ORDER BY ?s")).collect()
    assert(f.map(_.getString(0)).toSeq ==
      Seq("urn:p#a", "urn:p#b", "urn:p#c"))
    // numeric comparison sees the VALUE of an annotated numeric
    val n = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s WHERE { ?s p:v ?v . FILTER(?v > 1.5) }")).collect()
    assert(n.map(_.getString(0)).toSeq == Seq("urn:p#b"))
  }

  test("numeric-typed query constants dispatch numerically; sameTerm is term identity") {
    val eq = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s WHERE { ?s p:v ?v . FILTER(?v = \"1\"^^xsd:integer) }"))
      .collect()
    assert(eq.map(_.getString(0)).toSeq == Seq("urn:p#a"))
    val st = BgpPlanner.evaluate(litQuads, Sparql.parse(lp +
      "SELECT ?s WHERE { ?s p:lab ?l . FILTER sameTerm(?l, \"chat\"@fr) }"))
      .collect()
    assert(st.map(_.getString(0)).toSeq == Seq("urn:p#b"))
  }
}
