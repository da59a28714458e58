package graft

import graft.Model.Quad
import graft.sparql.{BgpPlanner, Sparql}
import org.scalatest.funsuite.AnyFunSuite

/** SPARQL semantics validation against the W3C test suite's evaluation
  * cases — TRANSCRIBED, not fetched: this environment has no network
  * access, so the cases below are re-stated from the PUBLIC W3C suites
  * (rdf-tests `sparql11/data-sparql11`, the DAWG `data-r2` trees)
  * and the normative examples of the SPARQL 1.1 Query REC, each tagged
  * with its provenance. Where the original test uses surface outside the
  * engine's subset (variable predicates, typed/lang literals, features
  * listed in `documentedSkips`), the case is either adapted to the subset
  * — preserving the SEMANTIC point under test — or recorded as a skip
  * with the reason.
  *
  * Unlike SparqlSpec (which grew alongside the implementation) these
  * expectations come from an independent source: the published suite.
  * They are the external check the 4 differential fuzzers can't provide
  * (planner-vs-own-naive-evaluator is self-referential; the reference
  * gets the same guarantee from oxigraph, client.py:42,52).
  */
class W3cConformanceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val G = "urn:g#"
  private def quads(triples: (String, String, String)*) = {
    val s = spark
    import s.implicits._
    // TestTerms.t: string-literal objects take the round-13 quoted term
    // encoding, exactly as a Turtle load of the suite data would store
    triples.map { case (su, p, o) => TestTerms.t(Quad(G, su, p, o)) }.toDF()
  }

  /** Collected SELECT solutions as bags of per-column Option[String], in
    * the query's projection order (null = unbound). */
  private def solutions(df: org.apache.spark.sql.DataFrame): Seq[Seq[Option[String]]] =
    df.collect().toSeq.map(r =>
      (0 until r.length).map(i => Option(r.get(i)).map(_.toString)))
  private def run(data: org.apache.spark.sql.DataFrame, q: String) =
    solutions(BgpPlanner.evaluate(data, Sparql.parse(q)))

  private val EX = "PREFIX ex: <urn:ex#> "
  private def ex(l: String) = s"urn:ex#$l"

  // ---- basic graph patterns (data-r2/basic, data-r2/triple-match) ---------

  test("w3c triple-match/dawg-tp-01..04 (adapted): ground/var positions match exactly") {
    val d = quads(
      (ex("x"), ex("p"), ex("v1")), (ex("x"), ex("p"), ex("v2")),
      (ex("y"), ex("p"), ex("v1")), (ex("y"), ex("q"), ex("v2")))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ex:v1 . }").toSet ==
      Set(Seq(Some(ex("x"))), Seq(Some(ex("y")))))
    assert(run(d, EX + "SELECT ?o WHERE { ex:y ex:q ?o . }") ==
      Seq(Seq(Some(ex("v2")))))
    // join through a shared variable (dawg-tp-04 shape)
    assert(run(d, EX + "SELECT ?s ?o WHERE { ?s ex:p ?o . ?s ex:q ex:v2 . }").toSet ==
      Set(Seq(Some(ex("y")), Some(ex("v1")))))
  }

  test("w3c basic/spoo-1: object list expands to two patterns on one subject") {
    val d = quads((ex("s"), ex("p"), "a"), (ex("s"), ex("p"), "b"))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p \"a\", \"b\" . }") ==
      Seq(Seq(Some(ex("s")))))
  }

  // ---- OPTIONAL (data-r2/optional, REC §6) --------------------------------

  test("w3c optional/q-opt-1 (adapted): unmatched OPTIONAL leaves the var unbound") {
    val d = quads(
      (ex("a1"), ex("name"), "Alice"), (ex("a1"), ex("email"), "alice@work"),
      (ex("a2"), ex("name"), "Bob"))
    assert(run(d, EX +
      "SELECT ?name ?mbox WHERE { ?x ex:name ?name . OPTIONAL { ?x ex:email ?mbox } }").toSet ==
      Set(Seq(Some("Alice"), Some("alice@work")), Seq(Some("Bob"), None)))
  }

  test("w3c REC §6.3 OPTIONAL with inner FILTER: filter scoped to the optional group") {
    // REC example: titles always bound; price only where < 30
    val d = quads(
      (ex("book1"), ex("title"), "SPARQL Tutorial"), (ex("book1"), ex("price"), "42"),
      (ex("book2"), ex("title"), "The Semantic Web"), (ex("book2"), ex("price"), "23"))
    assert(run(d, EX + "SELECT ?title ?price WHERE { ?x ex:title ?title . " +
      "OPTIONAL { ?x ex:price ?price . FILTER(?price < 30) } }").toSet ==
      Set(Seq(Some("SPARQL Tutorial"), None),
        Seq(Some("The Semantic Web"), Some("23"))))
  }

  test("w3c bound/dawg-bound-query-001 (adapted): !BOUND after OPTIONAL = negation as failure") {
    val d = quads(
      (ex("a1"), ex("name"), "Alice"), (ex("a1"), ex("email"), "alice@work"),
      (ex("a2"), ex("name"), "Bob"))
    assert(run(d, EX + "SELECT ?name WHERE { ?x ex:name ?name . " +
      "OPTIONAL { ?x ex:email ?e } FILTER(!BOUND(?e)) }") ==
      Seq(Seq(Some("Bob"))))
  }

  // ---- UNION (data-r2/algebra, REC §6.1 SPARQL 1.0) -----------------------

  test("w3c REC 1.0 §6 UNION of two vocabularies: bag union, per-branch bindings") {
    val d = quads(
      (ex("book1"), ex("title10"), "SPARQL Query Language Tutorial"),
      (ex("book2"), ex("title11"), "SPARQL Protocol Tutorial"))
    assert(run(d, EX + "SELECT ?title WHERE { " +
      "{ ?book ex:title10 ?title } UNION { ?book ex:title11 ?title } }").toSet ==
      Set(Seq(Some("SPARQL Query Language Tutorial")),
        Seq(Some("SPARQL Protocol Tutorial"))))
    // disjoint variables: each branch leaves the other's var unbound
    assert(run(d, EX + "SELECT ?x ?y WHERE { " +
      "{ ?book ex:title10 ?x } UNION { ?book ex:title11 ?y } }").toSet ==
      Set(Seq(Some("SPARQL Query Language Tutorial"), None),
        Seq(None, Some("SPARQL Protocol Tutorial"))))
  }

  // ---- FILTER (data-r2/regex, data-r2/expr-builtin, open-world) -----------

  test("w3c regex/regex-query-001 + 003 (adapted): plain and case-insensitive match") {
    val d = quads(
      (ex("x1"), ex("val"), "abcDEFghi"), (ex("x2"), ex("val"), "zzz"))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:val ?v . FILTER regex(?v, \"DEF\") }") ==
      Seq(Seq(Some(ex("x1")))))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:val ?v . FILTER regex(?v, \"def\", \"i\") }") ==
      Seq(Seq(Some(ex("x1")))))
  }

  test("w3c open-world/open-cmp-01 (adapted): type error in a comparison drops the row") {
    // "abc" < 6 is a type error → error ≠ true → row filtered out, no crash
    val d = quads(
      (ex("x1"), ex("v"), "5"), (ex("x2"), ex("v"), "abc"), (ex("x3"), ex("v"), "7"))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:v ?v . FILTER(?v < 6) }") ==
      Seq(Seq(Some(ex("x1")))))
    // and under || the OTHER operand can still rescue the row (3VL)
    assert(run(d, EX +
      "SELECT ?s WHERE { ?s ex:v ?v . FILTER(?v < 6 || ?s = <urn:ex#x2>) }").toSet ==
      Set(Seq(Some(ex("x1"))), Seq(Some(ex("x2")))))
  }

  test("w3c sparql11 functions/in01, notin01 (adapted to var operand)") {
    val d = quads(
      (ex("x1"), ex("v"), "1"), (ex("x2"), ex("v"), "2"), (ex("x3"), ex("v"), "3"))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:v ?v . FILTER(?v IN (1, 3)) }").toSet ==
      Set(Seq(Some(ex("x1"))), Seq(Some(ex("x3")))))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:v ?v . FILTER(?v NOT IN (1, 3)) }") ==
      Seq(Seq(Some(ex("x2")))))
  }

  test("w3c sparql11 functions/strstarts01, contains01, strends01 (adapted)") {
    val d = quads(
      (ex("x1"), ex("str"), "foobar"), (ex("x2"), ex("str"), "barfoo"))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:str ?v . FILTER STRSTARTS(?v, \"foo\") }") ==
      Seq(Seq(Some(ex("x1")))))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:str ?v . FILTER STRENDS(?v, \"foo\") }") ==
      Seq(Seq(Some(ex("x2")))))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:str ?v . FILTER CONTAINS(?v, \"oba\") }") ==
      Seq(Seq(Some(ex("x1")))))
  }

  // ---- negation: MINUS vs NOT EXISTS (sparql11 negation/, REC §8.3.3) -----

  test("w3c REC §8.3.3 (adapted): MINUS with disjoint variables removes NOTHING") {
    val d = quads(
      (ex("a"), ex("name"), "Alice"), (ex("b"), ex("name"), "Bob"),
      (ex("a"), ex("tag"), "t"))
    // the MINUS group shares no variable with the outer pattern → no
    // solution is compatible → subtraction removes nothing (the REC's
    // famous full-minuend example, constant-predicate form)
    assert(run(d, EX + "SELECT ?name WHERE { ?x ex:name ?name . " +
      "MINUS { ?y ex:tag \"t\" } }").toSet ==
      Set(Seq(Some("Alice")), Seq(Some("Bob"))))
    // ... while FILTER NOT EXISTS with the same body removes EVERYTHING
    // (existence is not correlation-dependent)
    assert(run(d, EX + "SELECT ?name WHERE { ?x ex:name ?name . " +
      "FILTER NOT EXISTS { ?y ex:tag \"t\" } }").isEmpty)
  }

  test("w3c negation/subtract-01 + exists-01 (adapted): shared-var negation") {
    val d = quads(
      (ex("a"), ex("name"), "Alice"), (ex("b"), ex("name"), "Bob"),
      (ex("a"), ex("out"), "1"))
    assert(run(d, EX + "SELECT ?name WHERE { ?x ex:name ?name . " +
      "MINUS { ?x ex:out \"1\" } }") == Seq(Seq(Some("Bob"))))
    assert(run(d, EX + "SELECT ?name WHERE { ?x ex:name ?name . " +
      "FILTER NOT EXISTS { ?x ex:out \"1\" } }") == Seq(Seq(Some("Bob"))))
    assert(run(d, EX + "SELECT ?name WHERE { ?x ex:name ?name . " +
      "FILTER EXISTS { ?x ex:out \"1\" } }") == Seq(Seq(Some("Alice"))))
  }

  // ---- VALUES (sparql11 bindings/, REC §7.2) ------------------------------

  test("w3c bindings/values8 (adapted): UNDEF constrains only defined cells") {
    val d = quads(
      (ex("book1"), ex("title"), "SPARQL Tutorial"), (ex("book1"), ex("price"), "42"),
      (ex("book2"), ex("title"), "The Semantic Web"), (ex("book2"), ex("price"), "23"))
    val got = run(d, EX + "SELECT ?book ?title WHERE { " +
      "?book ex:title ?title . ?book ex:price ?price . " +
      "VALUES (?book ?title) { (<urn:ex#book1> UNDEF) (UNDEF \"The Semantic Web\") } }")
    assert(got.toSet == Set(
      Seq(Some(ex("book1")), Some("SPARQL Tutorial")),
      Seq(Some(ex("book2")), Some("The Semantic Web"))))
  }

  // ---- BIND (sparql11 bind/) ----------------------------------------------

  test("w3c bind/bind01 (adapted): BIND computes from prior bindings") {
    val d = quads((ex("s1"), ex("p"), "1"), (ex("s2"), ex("p"), "2"))
    assert(run(d, EX + "SELECT ?z WHERE { ?s ex:p ?o . BIND(?o + 10 AS ?z) }").toSet ==
      Set(Seq(Some("11")), Seq(Some("12"))))
  }

  // ---- property paths (sparql11 property-path/, REC §9.2) -----------------

  test("w3c pp/path-2-2 sequence: knows/knows reaches friends-of-friends") {
    val d = quads(
      (ex("alice"), ex("knows"), ex("bob")), (ex("bob"), ex("knows"), ex("carol")),
      (ex("carol"), ex("knows"), ex("dave")))
    assert(run(d, EX + "SELECT ?y WHERE { <urn:ex#alice> ex:knows/ex:knows ?y . }") ==
      Seq(Seq(Some(ex("carol")))))
  }

  test("w3c pp/inverse: ^p swaps subject and object") {
    val d = quads((ex("a"), ex("p"), ex("b")))
    assert(run(d, EX + "SELECT ?x WHERE { <urn:ex#b> ^ex:p ?x . }") ==
      Seq(Seq(Some(ex("a")))))
  }

  test("w3c pp/pp28a zero-length path: :a :p* ?x includes :a itself") {
    val d = quads((ex("a"), ex("p"), ex("b")), (ex("b"), ex("p"), ex("c")))
    assert(run(d, EX + "SELECT ?x WHERE { <urn:ex#a> ex:p* ?x . }").toSet ==
      Set(Seq(Some(ex("a"))), Seq(Some(ex("b"))), Seq(Some(ex("c")))))
  }

  test("w3c pp/pp12 reachability with cycles: p+ terminates and closes the loop") {
    val d = quads(
      (ex("n1"), ex("p"), ex("n2")), (ex("n2"), ex("p"), ex("n3")),
      (ex("n3"), ex("p"), ex("n1")))
    assert(run(d, EX + "SELECT ?x WHERE { <urn:ex#n1> ex:p+ ?x . }").toSet ==
      Set(Seq(Some(ex("n1"))), Seq(Some(ex("n2"))), Seq(Some(ex("n3")))))
  }

  test("w3c pp/path-p2 zero-or-one: p? is direct neighbors plus self") {
    val d = quads((ex("a"), ex("p"), ex("b")), (ex("b"), ex("p"), ex("c")))
    assert(run(d, EX + "SELECT ?x WHERE { <urn:ex#a> ex:p? ?x . }").toSet ==
      Set(Seq(Some(ex("a"))), Seq(Some(ex("b")))))
  }

  test("w3c pp/path-ng (adapted): alternative (p|q) unions both edge sets") {
    val d = quads((ex("a"), ex("p"), ex("b")), (ex("a"), ex("q"), ex("c")))
    assert(run(d, EX + "SELECT ?x WHERE { <urn:ex#a> (ex:p|ex:q) ?x . }").toSet ==
      Set(Seq(Some(ex("b"))), Seq(Some(ex("c")))))
  }

  test("w3c pp/pp07 negated property set: !(q) matches every OTHER predicate") {
    val d = quads(
      (ex("a"), ex("p"), ex("b")), (ex("a"), ex("q"), ex("c")),
      (ex("a"), ex("r"), ex("d")))
    assert(run(d, EX + "SELECT ?x WHERE { <urn:ex#a> !ex:q ?x . }").toSet ==
      Set(Seq(Some(ex("b"))), Seq(Some(ex("d")))))
  }

  // ---- aggregates (sparql11 aggregates/, REC §11.1) -----------------------

  test("w3c REC §11.1 SUM + GROUP BY + HAVING over the bookshop graph") {
    val d = quads(
      (ex("org1"), ex("affiliates"), ex("auth1")),
      (ex("org1"), ex("affiliates"), ex("auth2")),
      (ex("org2"), ex("affiliates"), ex("auth3")),
      (ex("auth1"), ex("writesBook"), ex("book1")),
      (ex("book1"), ex("price"), "9"),
      (ex("auth2"), ex("writesBook"), ex("book3")),
      (ex("book3"), ex("price"), "7"),
      (ex("auth3"), ex("writesBook"), ex("book4")),
      (ex("book4"), ex("price"), "7"))
    // org1: 9 + 7 = 16 > 10 kept; org2: 7 filtered by HAVING
    val got = run(d, EX + "SELECT ?org (SUM(?lprice) AS ?totalPrice) WHERE { " +
      "?org ex:affiliates ?auth . ?auth ex:writesBook ?book . ?book ex:price ?lprice . } " +
      "GROUP BY ?org HAVING (SUM(?lprice) > 10)")
    // documented divergence from the REC: SUM surfaces as a double-typed
    // column (untyped lexical store), so the integral value renders
    // "16.0" where xsd:integer addition would give "16" — value exact
    assert(got == Seq(Seq(Some(ex("org1")), Some("16.0"))))
  }

  test("w3c aggregates/agg-01..03 (adapted): COUNT(*), COUNT(?v), COUNT(DISTINCT ?v)") {
    val d = quads(
      (ex("s1"), ex("p"), "a"), (ex("s1"), ex("q"), "b"),
      (ex("s2"), ex("p"), "a"))
    assert(run(d, EX + "SELECT (COUNT(*) AS ?n) WHERE { ?s ex:p ?v . }") ==
      Seq(Seq(Some("2"))))
    assert(run(d, EX + "SELECT (COUNT(DISTINCT ?v) AS ?n) WHERE { ?s ex:p ?v . }") ==
      Seq(Seq(Some("1"))))
    assert(run(d, EX + "SELECT (MIN(?v) AS ?lo) (MAX(?v) AS ?hi) WHERE { ?s ex:p ?v . ?s ex:q ?w . }") ==
      Seq(Seq(Some("a"), Some("a"))))
  }

  // ---- subqueries (sparql11 subquery/, REC §12) ---------------------------

  test("w3c REC §12 (adapted): inner aggregate subquery joins the outer group") {
    // each person's single cheapest purchase price via an inner MIN
    val d = quads(
      (ex("u1"), ex("paid"), "5"), (ex("u1"), ex("paid"), "9"),
      (ex("u2"), ex("paid"), "7"))
    val got = run(d, EX + "SELECT ?u ?m WHERE { ?u ex:paid ?m . " +
      "{ SELECT ?u (MIN(?p) AS ?m) WHERE { ?u ex:paid ?p . } GROUP BY ?u } }")
    assert(got.toSet == Set(
      Seq(Some(ex("u1")), Some("5")), Seq(Some(ex("u2")), Some("7"))))
  }

  // ---- ASK / CONSTRUCT (data-r2/ask, sparql11 construct/) -----------------

  test("w3c ask/ask-1 and ask-4 (adapted): true on a present triple, false on absent") {
    val d = quads((ex("x"), ex("name"), "Alice"))
    def ask(q: String): Boolean = // ASK yields one row, string "true"/"false"
      BgpPlanner.evaluate(d, Sparql.parse(q)).collect()(0).getString(0) == "true"
    assert(ask(EX + "ASK { <urn:ex#x> ex:name \"Alice\" }"))
    assert(!ask(EX + "ASK { <urn:ex#x> ex:name \"Bob\" }"))
  }

  test("w3c construct/constructwhere01 (adapted): template instantiated per solution") {
    val d = quads(
      (ex("a"), ex("name"), "Alice"), (ex("b"), ex("name"), "Bob"))
    val got = BgpPlanner.evaluate(d, Sparql.parse(EX +
        "CONSTRUCT { ?x ex:label ?n } WHERE { ?x ex:name ?n . }"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (ex("a"), ex("label"), "Alice"), (ex("b"), ex("label"), "Bob")))
  }

  // ---- GRAPH (data-r2/graph, REC §13.3) -----------------------------------

  test("w3c graph/dawg-graph-05 (adapted): GRAPH ?g binds the containing graph") {
    val s = spark
    import s.implicits._
    val d = Seq(
      Quad("urn:g1#", ex("a"), ex("p"), "1"),
      Quad("urn:g2#", ex("b"), ex("p"), "2")).toDF()
    val got = run(d, EX + "SELECT ?g ?s WHERE { GRAPH ?g { ?s ex:p ?o . } }")
    assert(got.toSet == Set(
      Seq(Some("urn:g1#"), Some(ex("a"))), Seq(Some("urn:g2#"), Some(ex("b")))))
  }

  // ---- solution modifiers (data-r2/sort, data-r2/distinct) ----------------

  test("w3c distinct/distinct-1 + sort/dawg-sort-1 (adapted): DISTINCT, ORDER, LIMIT") {
    val d = quads(
      (ex("s1"), ex("p"), "b"), (ex("s2"), ex("p"), "b"), (ex("s3"), ex("p"), "a"))
    assert(run(d, EX + "SELECT DISTINCT ?v WHERE { ?s ex:p ?v . }").toSet ==
      Set(Seq(Some("a")), Seq(Some("b"))))
    assert(run(d, EX + "SELECT ?v WHERE { ?s ex:p ?v . } ORDER BY ?v LIMIT 1") ==
      Seq(Seq(Some("a"))))
  }

  // ---- nested OPTIONAL (data-r2/optional q-opt-complex, REC §6.3) ---------

  test("w3c optional/q-opt-complex-1 (adapted): OPTIONAL nests, inner needs outer match") {
    val d = quads(
      (ex("a1"), ex("name"), "Alice"), (ex("a1"), ex("email"), "a@x"),
      (ex("a1"), ex("phone"), "111"),
      (ex("a2"), ex("name"), "Bob"), (ex("a2"), ex("phone"), "222"),
      (ex("a3"), ex("name"), "Carol"))
    // a2 has a phone but NO email: the inner OPTIONAL lives inside the
    // email group, so Bob's phone must NOT surface
    assert(run(d, EX + "SELECT ?name ?e ?p WHERE { ?x ex:name ?name . " +
      "OPTIONAL { ?x ex:email ?e . OPTIONAL { ?x ex:phone ?p } } }").toSet ==
      Set(Seq(Some("Alice"), Some("a@x"), Some("111")),
        Seq(Some("Bob"), None, None),
        Seq(Some("Carol"), None, None)))
  }

  test("w3c pp/path-in-group (adapted): closure path inside OPTIONAL") {
    val d = quads(
      (ex("a"), ex("name"), "A"), (ex("b"), ex("name"), "B"),
      (ex("a"), ex("p"), ex("m")), (ex("m"), ex("p"), ex("z")))
    assert(run(d, EX + "SELECT ?name ?r WHERE { ?x ex:name ?name . " +
      "OPTIONAL { ?x ex:p+ ?r . FILTER(?r = <urn:ex#z>) } }").toSet ==
      Set(Seq(Some("A"), Some(ex("z"))), Seq(Some("B"), None)))
  }

  test("w3c pp/pp36 (adapted): constant-object targeted star includes the constant") {
    val d = quads((ex("a"), ex("p"), ex("b")), (ex("b"), ex("p"), ex("c")))
    assert(run(d, EX + "SELECT ?x WHERE { ?x ex:p* <urn:ex#c> . }").toSet ==
      Set(Seq(Some(ex("a"))), Seq(Some(ex("b"))), Seq(Some(ex("c")))))
  }

  // ---- solution modifiers (data-r2/sort, REC §15) -------------------------

  test("w3c sort/dawg-sort-4 + limit-offset (adapted): DESC order, OFFSET paging") {
    val d = quads(
      (ex("s1"), ex("p"), "a"), (ex("s2"), ex("p"), "b"), (ex("s3"), ex("p"), "c"))
    assert(run(d, EX + "SELECT ?v WHERE { ?s ex:p ?v . } ORDER BY DESC(?v)") ==
      Seq(Seq(Some("c")), Seq(Some("b")), Seq(Some("a"))))
    assert(run(d, EX +
      "SELECT ?v WHERE { ?s ex:p ?v . } ORDER BY ?v LIMIT 1 OFFSET 1") ==
      Seq(Seq(Some("b"))))
  }

  // ---- aggregates, continued (sparql11 aggregates/) -----------------------

  test("w3c aggregates/agg-avg-01 (adapted): AVG over a numeric-lexical group") {
    val d = quads(
      (ex("s"), ex("v"), "1"), (ex("s"), ex("v"), "3"), (ex("s"), ex("v"), "5"))
    assert(run(d, EX + "SELECT (AVG(?x) AS ?avg) WHERE { ?s ex:v ?x . }") ==
      Seq(Seq(Some("3.0")))) // double-typed column; value exact
  }

  test("w3c aggregates/agg-groupconcat-02 (adapted): SEPARATOR honored, order deterministic") {
    val d = quads(
      (ex("s"), ex("v"), "b"), (ex("s"), ex("v"), "a"), (ex("s"), ex("v"), "c"))
    // documented divergence: the REC leaves concatenation order
    // implementation-defined (§18.5.1.7); this engine SORTS for
    // determinism, so the expectation below is the sorted rendering
    assert(run(d, EX +
      "SELECT (GROUP_CONCAT(?v; SEPARATOR=\"|\") AS ?c) WHERE { ?s ex:v ?v . }") ==
      Seq(Seq(Some("a|b|c"))))
  }

  // ---- string builtins in BIND (sparql11 functions/) ----------------------

  test("w3c functions/strbefore01a, strafter01a, concat01, strlen01 (adapted)") {
    val d = quads((ex("s"), ex("str"), "foobar"))
    assert(run(d, EX + "SELECT ?out WHERE { ?s ex:str ?v . " +
      "BIND(STRBEFORE(?v, \"bar\") AS ?out) }") == Seq(Seq(Some("foo"))))
    assert(run(d, EX + "SELECT ?out WHERE { ?s ex:str ?v . " +
      "BIND(STRAFTER(?v, \"foo\") AS ?out) }") == Seq(Seq(Some("bar"))))
    assert(run(d, EX + "SELECT ?out WHERE { ?s ex:str ?v . " +
      "BIND(CONCAT(?v, \"!\", UCASE(?v)) AS ?out) }") ==
      Seq(Seq(Some("foobar!FOOBAR"))))
    assert(run(d, EX + "SELECT ?out WHERE { ?s ex:str ?v . " +
      "BIND(STRLEN(?v) AS ?out) }") == Seq(Seq(Some("6"))))
  }

  test("w3c functions/coalesce01 (adapted): first bound, error-free value wins") {
    val d = quads(
      (ex("a1"), ex("name"), "Alice"), (ex("a1"), ex("nick"), "Ali"),
      (ex("a2"), ex("name"), "Bob"))
    // nick where present, else name, else the constant
    assert(run(d, EX + "SELECT ?label WHERE { ?x ex:name ?name . " +
      "OPTIONAL { ?x ex:nick ?nick } " +
      "BIND(COALESCE(?nick, ?name, \"anon\") AS ?label) }").toSet ==
      Set(Seq(Some("Ali")), Seq(Some("Bob"))))
  }

  test("w3c functions/if01 + if02 (adapted): value dispatch, and an erroring condition errors the IF") {
    val d = quads(
      (ex("x1"), ex("v"), "1"), (ex("x2"), ex("v"), "9"), (ex("x3"), ex("w"), "5"))
    assert(run(d, EX + "SELECT ?s ?label WHERE { ?s ex:v ?v . " +
      "BIND(IF(?v < 5, \"low\", \"high\") AS ?label) }").toSet ==
      Set(Seq(Some(ex("x1")), Some("low")), Seq(Some(ex("x2")), Some("high"))))
    // if02's point: error in the condition → the IF errors (unbound),
    // NOT the else branch — ?u is unbound, so ?label must be unbound
    assert(run(d, EX + "SELECT ?s ?label WHERE { ?s ex:w ?w . " +
      "OPTIONAL { ?s ex:v ?u } " +
      "BIND(IF(?u < 5, \"low\", \"high\") AS ?label) }") ==
      Seq(Seq(Some(ex("x3")), None)))
  }

  test("w3c reduced/reduced-1 (adapted): REDUCED parses; returning the bag conforms") {
    val d = quads(
      (ex("s1"), ex("p"), ex("o")), (ex("s2"), ex("p"), ex("o")))
    // §15.3.1 allows any duplication between bag and set — this engine
    // returns the bag, which the suite's reduced tests accept
    assert(run(d, EX + "SELECT REDUCED ?o WHERE { ?s ex:p ?o . }") ==
      Seq(Seq(Some(ex("o"))), Seq(Some(ex("o")))))
  }

  // ---- bag semantics (data-r2/reduced, bindings) --------------------------

  test("w3c REC §9.2/values5 (adapted): projection and VALUES keep duplicate solutions") {
    val d = quads(
      (ex("s1"), ex("p"), ex("o")), (ex("s2"), ex("p"), ex("o")))
    // two solutions project to the same ?o binding — bag keeps both
    assert(run(d, EX + "SELECT ?o WHERE { ?s ex:p ?o . }") ==
      Seq(Seq(Some(ex("o"))), Seq(Some(ex("o")))))
    // ... and DISTINCT collapses them
    assert(run(d, EX + "SELECT DISTINCT ?o WHERE { ?s ex:p ?o . }") ==
      Seq(Seq(Some(ex("o")))))
  }

  // ---- subquery modifiers (sparql11 subquery/sq11 adapted) ----------------

  test("w3c subquery/sq11 (adapted): inner ORDER/LIMIT bounds the joined relation") {
    val d = quads(
      (ex("u1"), ex("score"), "1"), (ex("u2"), ex("score"), "2"),
      (ex("u3"), ex("score"), "3"),
      (ex("u1"), ex("name"), "A"), (ex("u2"), ex("name"), "B"),
      (ex("u3"), ex("name"), "C"))
    val got = run(d, EX + "SELECT ?name WHERE { ?u ex:name ?name . " +
      "{ SELECT ?u WHERE { ?u ex:score ?sc . } ORDER BY DESC(?sc) LIMIT 2 } }")
    assert(got.toSet == Set(Seq(Some("B")), Seq(Some("C"))))
  }

  test("w3c algebra/opt-filter-1 (adapted): FILTER inside OPTIONAL sees minuend vars (LeftJoin F)") {
    val d = quads(
      (ex("b1"), ex("title"), "T1"), (ex("b1"), ex("price"), "30"),
      (ex("b2"), ex("title"), "T2"), (ex("b2"), ex("price"), "10"))
    // the filter is part of the LeftJoin expression: b1's price fails it,
    // so b1 keeps its title with ?p UNBOUND (not dropped)
    val got = run(d, EX + "SELECT ?t ?p WHERE { ?x ex:title ?t . " +
      "OPTIONAL { ?x ex:price ?p . FILTER (?p < 20) } }").toSet
    assert(got == Set(Seq(Some("T1"), None), Seq(Some("T2"), Some("10"))))
  }

  test("w3c aggregates/agg-sum-01 (adapted): SUM over groups, numeric cast") {
    val d = quads(
      (ex("g1"), ex("v"), "1"), (ex("g1"), ex("v"), "2"),
      (ex("g2"), ex("v"), "40"))
    // documented divergence (same ledger entry as MIN/MAX lexical order):
    // the untyped-string store dispatches SUM through a double cast, so
    // integral sums render with the double lexical form ("3.0"), not the
    // REC's xsd:integer "3" — values are exact, the datatype is not
    // tracked (cf. the agg-avg-01 expectation above)
    assert(run(d, EX + "SELECT ?s (SUM(?v) AS ?sum) WHERE { ?s ex:v ?v . } " +
      "GROUP BY ?s").toSet ==
      Set(Seq(Some(ex("g1")), Some("3.0")), Seq(Some(ex("g2")), Some("40.0"))))
  }

  // ---- negation: EXISTS / NOT EXISTS (sparql11 negation/) -----------------

  test("w3c negation/exists-01 + exists-02 (adapted): FILTER (NOT) EXISTS probe the pattern") {
    val d = quads(
      (ex("a"), ex("p"), ex("o")), (ex("a"), ex("q"), ex("w")),
      (ex("b"), ex("p"), ex("o")))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ex:o . " +
      "FILTER EXISTS { ?s ex:q ?w } }") == Seq(Seq(Some(ex("a")))))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ex:o . " +
      "FILTER NOT EXISTS { ?s ex:q ?w } }") == Seq(Seq(Some(ex("b")))))
  }

  test("w3c negation/full-minuend (REC §8.3.3): MINUS with disjoint vars removes nothing") {
    val d = quads(
      (ex("a"), ex("name"), "Alice"), (ex("b"), ex("name"), "Bob"),
      (ex("b"), ex("knows"), ex("a")))
    // the MINUS body shares NO variable with the minuend → per the REC the
    // per-solution compatibility test is vacuous and every solution stays
    // (the counter-intuitive case the REC calls out explicitly)
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:name ?n . " +
      "MINUS { ?x ex:knows ?y } }").toSet ==
      Set(Seq(Some(ex("a"))), Seq(Some(ex("b")))))
    // ... while the shared-variable form does subtract (subtract-01 shape)
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:name ?n . " +
      "MINUS { ?s ex:knows ?y } }") == Seq(Seq(Some(ex("a")))))
  }

  // ---- solution modifiers: ORDER BY + OFFSET/LIMIT (data-r2/sort, slice) --

  test("w3c sort/dawg-sort-1 + limit-offset (adapted): stable slice of an ordered bag") {
    val d = quads(
      (ex("s1"), ex("v"), "1"), (ex("s2"), ex("v"), "3"),
      (ex("s3"), ex("v"), "2"), (ex("s4"), ex("v"), "4"))
    assert(run(d, EX +
      "SELECT ?s WHERE { ?s ex:v ?v . } ORDER BY ?v OFFSET 1 LIMIT 2") ==
      Seq(Seq(Some(ex("s3"))), Seq(Some(ex("s2")))))
    // OFFSET past the end yields the empty bag, not an error
    assert(run(d, EX +
      "SELECT ?s WHERE { ?s ex:v ?v . } ORDER BY ?v OFFSET 9 LIMIT 2").isEmpty)
  }

  // ---- aggregates: HAVING, COUNT(DISTINCT) (sparql11 aggregates/) ---------

  test("w3c aggregates/agg-having (adapted): HAVING filters groups post-aggregation") {
    val d = quads(
      (ex("g1"), ex("v"), "a"), (ex("g1"), ex("v"), "b"),
      (ex("g2"), ex("v"), "c"))
    assert(run(d, EX + "SELECT ?s (COUNT(?v) AS ?n) WHERE { ?s ex:v ?v . } " +
      "GROUP BY ?s HAVING (COUNT(?v) > 1)") ==
      Seq(Seq(Some(ex("g1")), Some("2"))))
  }

  test("w3c aggregates/agg-distinct (agg04-ish, adapted): COUNT(DISTINCT ?x) collapses duplicates") {
    val d = quads(
      (ex("s1"), ex("v"), "a"), (ex("s2"), ex("v"), "a"),
      (ex("s3"), ex("v"), "b"))
    assert(run(d, EX +
      "SELECT (COUNT(?v) AS ?n) (COUNT(DISTINCT ?v) AS ?nd) WHERE { ?s ex:v ?v . }") ==
      Seq(Seq(Some("3"), Some("2"))))
  }

  // ---- string predicates in FILTER (sparql11 functions/) ------------------

  test("w3c functions/strstarts01, strends01, contains01 (adapted): FILTER string predicates") {
    val d = quads(
      (ex("s1"), ex("str"), "foobar"), (ex("s2"), ex("str"), "food"),
      (ex("s3"), ex("str"), "barfoo"))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:str ?v . " +
      "FILTER STRSTARTS(?v, \"foo\") }").toSet ==
      Set(Seq(Some(ex("s1"))), Seq(Some(ex("s2")))))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:str ?v . " +
      "FILTER STRENDS(?v, \"foo\") }") == Seq(Seq(Some(ex("s3")))))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:str ?v . " +
      "FILTER CONTAINS(?v, \"oba\") }") == Seq(Seq(Some(ex("s1")))))
  }

  test("w3c functions/in01 + notin01 (adapted): IN / NOT IN over an expression list") {
    val d = quads(
      (ex("s1"), ex("v"), "1"), (ex("s2"), ex("v"), "2"), (ex("s3"), ex("v"), "3"))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:v ?v . " +
      "FILTER (?v IN (\"1\", \"3\")) }").toSet ==
      Set(Seq(Some(ex("s1"))), Seq(Some(ex("s3")))))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:v ?v . " +
      "FILTER (?v NOT IN (\"1\", \"3\")) }") == Seq(Seq(Some(ex("s2")))))
  }

  // ---- union bag semantics (data-r2/algebra, REC §7) -----------------------

  test("w3c algebra/union (adapted): UNION is a bag union — shared solutions duplicate") {
    val d = quads(
      (ex("s"), ex("p"), ex("o")), (ex("s"), ex("q"), ex("o")))
    // both branches bind ?s to the same term: the bag has BOTH solutions
    assert(run(d, EX + "SELECT ?s WHERE { { ?s ex:p ex:o } UNION { ?s ex:q ex:o } }") ==
      Seq(Seq(Some(ex("s"))), Seq(Some(ex("s")))))
  }

  test("w3c functions/substring01-02 + replace01 (adapted): SUBSTR 1-based, REPLACE regex") {
    val d = quads((ex("s"), ex("str"), "foobar"))
    assert(run(d, EX + "SELECT ?out WHERE { ?s ex:str ?v . " +
      "BIND(SUBSTR(?v, 4) AS ?out) }") == Seq(Seq(Some("bar"))))
    assert(run(d, EX + "SELECT ?out WHERE { ?s ex:str ?v . " +
      "BIND(SUBSTR(?v, 2, 3) AS ?out) }") == Seq(Seq(Some("oob"))))
    assert(run(d, EX + "SELECT ?out WHERE { ?s ex:str ?v . " +
      "BIND(REPLACE(?v, \"o+\", \"0\") AS ?out) }") == Seq(Seq(Some("f0bar"))))
    // group reference in the replacement ($1 agrees between XPath and Java)
    assert(run(d, EX + "SELECT ?out WHERE { ?s ex:str ?v . " +
      "BIND(REPLACE(?v, \"(f)(o+)\", \"$2$1\") AS ?out) }") ==
      Seq(Seq(Some("oofbar"))))
    // flags argument is outside the subset — loud rejection, not mis-eval
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(EX + "SELECT ?out WHERE { ?s ex:str ?v . " +
        "BIND(REPLACE(?v, \"o\", \"0\", \"i\") AS ?out) }")
    }
    assert(e.getMessage.contains("flags"))
  }

  // ---- more transcriptions (late round 11) --------------------------------

  test("w3c bindings/values2 (adapted): multi-variable VALUES rows join as units") {
    val d = quads(
      (ex("s1"), ex("p"), ex("o1")), (ex("s2"), ex("p"), ex("o2")),
      (ex("s1"), ex("p"), ex("o2")))
    // row (s1, o1) admits only that combination; (s2, o2) the other — the
    // cross combination (s1, o2), though present in the data, is excluded
    assert(run(d, EX + "SELECT ?s ?o WHERE { ?s ex:p ?o . " +
      "VALUES (?s ?o) { (ex:s1 ex:o1) (ex:s2 ex:o2) } }").toSet ==
      Set(Seq(Some(ex("s1")), Some(ex("o1"))),
        Seq(Some(ex("s2")), Some(ex("o2")))))
  }

  test("w3c optional/complex (adapted): UNION inside OPTIONAL keeps the minuend row per branch") {
    val d = quads(
      (ex("a"), ex("name"), "A"),
      (ex("a"), ex("mbox"), "m1"), (ex("a"), ex("home"), "h1"),
      (ex("b"), ex("name"), "B"))
    // a matches BOTH branches (two solutions); b matches neither (one
    // solution, ?contact unbound)
    val got = run(d, EX + "SELECT ?n ?contact WHERE { ?x ex:name ?n . " +
      "OPTIONAL { { ?x ex:mbox ?contact } UNION { ?x ex:home ?contact } } }")
    assert(got.toSet == Set(
      Seq(Some("A"), Some("m1")), Seq(Some("A"), Some("h1")),
      Seq(Some("B"), None)))
    assert(got.size == 3)
  }

  test("w3c construct/constructwhere03 (adapted): ground template triple emitted once per solution set") {
    val d = quads(
      (ex("s1"), ex("p"), ex("o")), (ex("s2"), ex("p"), ex("o")))
    val q = Sparql.parse(EX +
      "CONSTRUCT { ?s ex:q ex:tagged . ex:corpus ex:size \"known\" . } " +
        "WHERE { ?s ex:p ex:o . }")
    val triples = BgpPlanner.evaluate(d, q).collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSet
    // CONSTRUCT output is a GRAPH (set semantics): the ground triple
    // appears once, the templated one per distinct binding
    assert(triples == Set(
      (ex("s1"), ex("q"), ex("tagged")), (ex("s2"), ex("q"), ex("tagged")),
      (ex("corpus"), ex("size"), "known")))
  }

  // ---- SELECT expressions (sparql11 project-expression/) ------------------

  test("w3c project-expression/projexp01-02 (adapted): (expr AS ?x) in SELECT") {
    val d = quads(
      (ex("s1"), ex("v"), "6"), (ex("s2"), ex("v"), "10"))
    assert(run(d, EX +
      "SELECT ?s (?v * 2 AS ?dbl) WHERE { ?s ex:v ?v . }").toSet ==
      Set(Seq(Some(ex("s1")), Some("12")), Seq(Some(ex("s2")), Some("20"))))
    assert(run(d, EX +
      "SELECT (CONCAT(\"v=\", ?v) AS ?lbl) WHERE { ?s ex:v ?v . FILTER (?v = \"6\") }") ==
      Seq(Seq(Some("v=6"))))
    // grouped + SELECT expression is outside the subset — rejected loudly,
    // never silently mis-scoped (the Extend would run post-aggregation)
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(EX +
        "SELECT (?v * 2 AS ?dbl) (COUNT(?s) AS ?n) WHERE { ?s ex:v ?v . } GROUP BY ?v")
    }
    assert(e.getMessage.contains("SELECT expressions over a grouped query"))
  }

  // ---- builtin functions (sparql11/data-sparql11/functions) ---------------
  // The suite's shared data.ttl numeric/date rows, adapted: typed
  // literals ("2.5"^^xsd:decimal, "…"^^xsd:dateTime) become their
  // lexical forms — the value under test (the function result) is
  // unchanged by the encoding.

  private lazy val fnNums = quads(
    (ex("n1"), ex("num"), "-1"), (ex("n2"), ex("num"), "-1.6"),
    (ex("n3"), ex("num"), "1.1"), (ex("n4"), ex("num"), "-2"),
    (ex("n5"), ex("num"), "2.5"))

  test("w3c functions/abs01: FILTER(ABS(?num) >= 2) keeps n4 and n5") {
    assert(run(fnNums, EX +
      "SELECT ?s WHERE { ?s ex:num ?num . FILTER(ABS(?num) >= 2) }").toSet ==
      Set(Seq(Some(ex("n4"))), Seq(Some(ex("n5")))))
  }

  test("w3c functions/ceil01, floor01, round01: full result tables") {
    def table(fn: String): Map[Option[String], Option[String]] =
      run(fnNums, EX +
        s"SELECT ?s ?r WHERE { ?s ex:num ?num . BIND($fn(?num) AS ?r) }")
        .map(row => row(0) -> row(1)).toMap
    assert(table("CEIL") == Map(
      Some(ex("n1")) -> Some("-1"), Some(ex("n2")) -> Some("-1"),
      Some(ex("n3")) -> Some("2"), Some(ex("n4")) -> Some("-2"),
      Some(ex("n5")) -> Some("3")))
    assert(table("FLOOR") == Map(
      Some(ex("n1")) -> Some("-1"), Some(ex("n2")) -> Some("-2"),
      Some(ex("n3")) -> Some("1"), Some(ex("n4")) -> Some("-2"),
      Some(ex("n5")) -> Some("2")))
    // fn:round: -1.6 → -2 but 2.5 → 3 (half toward +∞)
    assert(table("ROUND") == Map(
      Some(ex("n1")) -> Some("-1"), Some(ex("n2")) -> Some("-2"),
      Some(ex("n3")) -> Some("1"), Some(ex("n4")) -> Some("-2"),
      Some(ex("n5")) -> Some("3")))
  }

  test("w3c functions/isnumeric01 (adapted): numeric lexicals pass, strings don't") {
    val d = quads(
      (ex("n1"), ex("num"), "1"), (ex("n2"), ex("num"), "12.5"),
      (ex("s1"), ex("num"), "abc"), (ex("s2"), ex("num"), "1x"))
    assert(run(d, EX +
      "SELECT ?s WHERE { ?s ex:num ?n . FILTER(isNumeric(?n)) }").toSet ==
      Set(Seq(Some(ex("n1"))), Seq(Some(ex("n2")))))
  }

  test("w3c functions/md5-01, sha1-01, sha256-01: \"abc\" test vectors") {
    val d = quads((ex("s1"), ex("str"), "abc"))
    def hash(fn: String) = run(d, EX +
      s"SELECT ($fn(?l) AS ?hash) WHERE { ex:s1 ex:str ?l }")
    assert(hash("MD5") ==
      Seq(Seq(Some("900150983cd24fb0d6963f7d28e17f72"))))
    assert(hash("SHA1") ==
      Seq(Seq(Some("a9993e364706816aba3e25717850c26c9cd0d89d"))))
    assert(hash("SHA256") == Seq(Seq(Some(
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"))))
  }

  test("w3c functions/encode01: multilingual ENCODE_FOR_URI table") {
    val d = quads(
      (ex("s1"), ex("str"), "123"), (ex("s2"), ex("str"), "日本語"),
      (ex("s3"), ex("str"), "English"), (ex("s4"), ex("str"), "Français"))
    val got = run(d, EX +
      "SELECT ?s (ENCODE_FOR_URI(?str) AS ?encoded) WHERE { ?s ex:str ?str }")
      .map(row => row(0) -> row(1)).toMap
    assert(got == Map(
      Some(ex("s1")) -> Some("123"),
      Some(ex("s2")) -> Some("%E6%97%A5%E6%9C%AC%E8%AA%9E"),
      Some(ex("s3")) -> Some("English"),
      Some(ex("s4")) -> Some("Fran%C3%A7ais")))
  }

  private lazy val fnDates = quads(
    (ex("d1"), ex("date"), "2010-06-21T11:28:01Z"),
    (ex("d2"), ex("date"), "2010-12-21T15:38:02-08:00"),
    (ex("d3"), ex("date"), "2008-06-20T23:59:00Z"),
    (ex("d4"), ex("date"), "2011-02-01T01:02:03"))

  test("w3c functions/hours, minutes, seconds, year, month, day: component tables") {
    def table(fn: String): Map[Option[String], Option[String]] =
      run(fnDates, EX +
        s"SELECT ?s ($fn(?date) AS ?v) WHERE { ?s ex:date ?date }")
        .map(row => row(0) -> row(1)).toMap
    def expect(vals: (String, String)*): Map[Option[String], Option[String]] =
      vals.map { case (k, v) => Some(ex(k)) -> Some(v) }.toMap
    assert(table("YEAR") ==
      expect("d1" -> "2010", "d2" -> "2010", "d3" -> "2008", "d4" -> "2011"))
    assert(table("MONTH") ==
      expect("d1" -> "6", "d2" -> "12", "d3" -> "6", "d4" -> "2"))
    assert(table("DAY") ==
      expect("d1" -> "21", "d2" -> "21", "d3" -> "20", "d4" -> "1"))
    // HOURS of d2 is 15 — the literal's OWN -08:00 clock, never shifted
    assert(table("HOURS") ==
      expect("d1" -> "11", "d2" -> "15", "d3" -> "23", "d4" -> "1"))
    assert(table("MINUTES") ==
      expect("d1" -> "28", "d2" -> "38", "d3" -> "59", "d4" -> "2"))
    assert(table("SECONDS") ==
      expect("d1" -> "1", "d2" -> "2", "d3" -> "0", "d4" -> "3"))
  }

  test("w3c functions/tz-01: timezone designator, empty string when absent") {
    val got = run(fnDates, EX +
      "SELECT ?s (TZ(?date) AS ?v) WHERE { ?s ex:date ?date }")
      .map(row => row(0) -> row(1)).toMap
    assert(got == Map(
      Some(ex("d1")) -> Some("Z"), Some(ex("d2")) -> Some("-08:00"),
      Some(ex("d3")) -> Some("Z"), Some(ex("d4")) -> Some("")))
  }

  test("w3c functions/timezone-01: TIMEZONE as xsd:dayTimeDuration, error when absent") {
    // the suite's expected solutions: Z → "PT0S", -08:00 → "-PT8H", a
    // designator-less dateTime ERRORS (?v unbound) — the row survives,
    // the binding doesn't (§17.4.5.7 vs TZ's "" in tz-01 above)
    val got = run(fnDates, EX +
      "SELECT ?s (TIMEZONE(?date) AS ?v) WHERE { ?s ex:date ?date }")
      .map(row => row(0) -> row(1)).toMap
    assert(got == Map(
      Some(ex("d1")) -> Some("PT0S"), Some(ex("d2")) -> Some("-PT8H"),
      Some(ex("d3")) -> Some("PT0S"), Some(ex("d4")) -> None))
    // the result is a TERM, not a bare lexical: mid-query (before the
    // str() boundary) it carries the duration datatype
    val dt = run(fnDates, EX + "SELECT ?s ?dt WHERE { ?s ex:date ?date . " +
      "BIND(DATATYPE(TIMEZONE(?date)) AS ?dt) }")
      .map(row => row(0) -> row(1)).toMap
    assert(dt(Some(ex("d2"))) ==
      Some("http://www.w3.org/2001/XMLSchema#dayTimeDuration"))
    assert(dt(Some(ex("d4"))).isEmpty)
    // canonical minute-bearing and sub-hour forms
    val d = quads(
      (ex("m1"), ex("date"), "2011-01-10T14:45:13+05:30"),
      (ex("m2"), ex("date"), "2011-01-10T14:45:13-00:30"),
      (ex("m3"), ex("date"), "2011-01-10T14:45:13+00:00"))
    val mids = run(d, EX +
      "SELECT ?s (TIMEZONE(?date) AS ?v) WHERE { ?s ex:date ?date }")
      .map(row => row(0) -> row(1)).toMap
    assert(mids == Map(
      Some(ex("m1")) -> Some("PT5H30M"), Some(ex("m2")) -> Some("-PT30M"),
      Some(ex("m3")) -> Some("PT0S")))
  }

  test("w3c data-r2/expr-builtin isIRI/isLiteral (isiri-01, isliteral-01): " +
      "term classes decide; LANG/DATATYPE type-error on IRIs (round 13)") {
    // the suite's data mixes IRIs, plain and tagged literals on one
    // predicate — exactly the shape the old encoding could not answer
    val d = quads(
      (ex("s1"), ex("p"), "foo"),
      (ex("s2"), ex("p"), "\"bar\"@en"),
      (ex("s3"), ex("p"), ex("obj")),
      (ex("s4"), ex("p"), "_:b7"))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ?o . FILTER(isIRI(?o)) }")
      .toSet == Set(Seq(Some(ex("s3")))))
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ?o . FILTER(isLiteral(?o)) }")
      .toSet == Set(Seq(Some(ex("s1"))), Seq(Some(ex("s2")))))
    // lang-3 / datatype type-error family: LANG/DATATYPE of an IRI or
    // blank node leaves the alias unbound; the plain literal answers
    val lang = run(d, EX +
      "SELECT ?s ?l WHERE { ?s ex:p ?o . BIND(LANG(?o) AS ?l) }")
      .map(r => r(0) -> r(1)).toMap
    assert(lang(Some(ex("s1"))) == Some("") &&
      lang(Some(ex("s2"))) == Some("en"))
    assert(lang(Some(ex("s3"))).isEmpty && lang(Some(ex("s4"))).isEmpty)
    val dt = run(d, EX +
      "SELECT ?s ?t WHERE { ?s ex:p ?o . BIND(DATATYPE(?o) AS ?t) }")
      .map(r => r(0) -> r(1)).toMap
    assert(dt(Some(ex("s1"))) ==
      Some("http://www.w3.org/2001/XMLSchema#string"))
    assert(dt(Some(ex("s3"))).isEmpty && dt(Some(ex("s4"))).isEmpty)
  }

  test("w3c data-r2/open-eq (adapted): sameTerm vs = on distinct numeric lexicals") {
    // open-eq-07..11's point in the lexical store: "01" and "1" are
    // DIFFERENT terms (sameTerm is false across them) that `=`
    // numeric-dispatches EQUAL — both are xsd:integer terms, and the
    // round-14 per-row promotion dispatch compares them by VALUE even
    // with no numeric literal operand forcing it (pre-round-14 the
    // var-var form compared terms and missed the cross pairs).
    val d = quads(
      (ex("x1"), ex("p"), "1"), (ex("x2"), ex("p"), "01"))
    assert(run(d, EX + "SELECT ?a ?b WHERE { ?a ex:p ?v1 . ?b ex:p ?v2 . " +
      "FILTER(sameTerm(?v1, ?v2)) }").toSet ==
      Set(Seq(Some(ex("x1")), Some(ex("x1"))),
        Seq(Some(ex("x2")), Some(ex("x2")))))
    assert(run(d, EX + "SELECT ?a ?b WHERE { ?a ex:p ?v1 . ?b ex:p ?v2 . " +
      "FILTER(?v1 = ?v2) }").toSet.size == 4) // numeric = : cross pairs too
  }

  // ---- BIND positional scope (sparql11/data-sparql11/bind) ----------------

  private lazy val bindData = quads(
    (ex("s1"), ex("p"), "1"), (ex("s2"), ex("p"), "2"))

  test("w3c bind/bind01+bind02 (adapted): alias from the preceding pattern") {
    assert(run(bindData, EX +
      "SELECT ?z WHERE { ?s ex:p ?o . BIND(?o + 10 AS ?z) }").toSet ==
      Set(Seq(Some("11")), Seq(Some("12"))))
  }

  test("w3c bind/bind03+bind05 (adapted): alias visible to later FILTER") {
    assert(run(bindData, EX +
      "SELECT ?s ?z WHERE { ?s ex:p ?o . BIND(?o + 1 AS ?z) FILTER(?z = 3) }") ==
      Seq(Seq(Some(ex("s2")), Some("3"))))
  }

  test("w3c bind/bind07 (adapted): BIND before the pattern — scope is empty") {
    // at the BIND's position nothing is bound: ?o is a FORWARD reference
    // → expression error → ?z unbound in every solution (the suite's
    // expected result; an engine that sees the later ?o returns 11/12)
    assert(run(bindData, EX +
      "SELECT ?o ?z WHERE { BIND(?o + 10 AS ?z) ?s ex:p ?o . }").toSet ==
      Set(Seq(Some("1"), None), Seq(Some("2"), None)))
  }

  test("w3c bind/bind08 (adapted): rebinding is a syntax error, caught loudly") {
    val e = intercept[IllegalArgumentException] {
      Sparql.parse(EX + "SELECT ?o WHERE { ?s ex:p ?o . BIND(99 AS ?o) }")
    }
    assert(e.getMessage.contains("rebind"))
  }

  test("w3c bind/bind10-style join (adapted): Extend feeds a later pattern") {
    val d = quads(
      (ex("s1"), ex("p"), "1"), (ex("s2"), ex("p"), "2"),
      (ex("t1"), ex("q"), "2"))
    // Join(Extend(BGP(?s ex:p ?o), ?z ← ?o+1), BGP(?t ex:q ?z)):
    // only s1 extends to z=2, which t1's object matches
    assert(run(d, EX +
      "SELECT ?s ?t WHERE { ?s ex:p ?o . BIND(?o + 1 AS ?z) ?t ex:q ?z }") ==
      Seq(Seq(Some(ex("s1")), Some(ex("t1")))))
  }

  // ---- CONSTRUCT WHERE shortcut (sparql11/construct) ----------------------

  test("w3c construct/constructwhere01+02 (adapted): the WHERE BGP is the template") {
    val d = quads(
      (ex("s1"), ex("p"), ex("o1")), (ex("s2"), ex("p"), ex("o2")),
      (ex("s1"), ex("q"), "lit"))
    // single-pattern shortcut: every match instantiates itself
    assert(run(d, EX + "CONSTRUCT WHERE { ?s ex:p ?o . }").toSet == Set(
      Seq(Some(ex("s1")), Some(ex("p")), Some(ex("o1"))),
      Seq(Some(ex("s2")), Some(ex("p")), Some(ex("o2")))))
    // two-pattern BGP: the JOIN restricts, then both triples instantiate
    assert(run(d, EX +
      "CONSTRUCT WHERE { ?s ex:p ?o . ?s ex:q ?l }").toSet == Set(
      Seq(Some(ex("s1")), Some(ex("p")), Some(ex("o1"))),
      Seq(Some(ex("s1")), Some(ex("q")), Some("lit"))))
  }

  test("w3c construct/constructwhere05+06 (adapted): non-BGP shortcut bodies are invalid") {
    // §16.2.4 restricts the shortcut to a basic graph pattern — FILTER
    // and property paths are syntax errors there, loudly rejected
    val e1 = intercept[IllegalArgumentException] {
      Sparql.parse(EX +
        "CONSTRUCT WHERE { ?s ex:p ?o . FILTER(?o != \"x\") }")
    }
    assert(e1.getMessage.contains("basic graph pattern"))
    val e2 = intercept[IllegalArgumentException] {
      Sparql.parse(EX + "CONSTRUCT WHERE { ?s ex:p* ?o . }")
    }
    assert(e2.getMessage.contains("template"))
  }

  // ---- trailing VALUES clause (sparql11/bindings: values07/values08) ------

  // ---- variable predicates (data-r2/triple-match) --------------------------

  test("w3c triple-match/dawg-tp-03: variable predicate with ground subject") {
    val d = quads(
      (ex("x"), ex("p"), "1"), (ex("x"), ex("q"), "2"),
      (ex("y"), ex("p"), "3"))
    assert(run(d, EX + "SELECT ?a ?b WHERE { ex:x ?a ?b . }").toSet == Set(
      Seq(Some(ex("p")), Some("1")), Seq(Some(ex("q")), Some("2"))))
  }

  test("w3c basic/full-scan (adapted): ?s ?p ?o enumerates the graph") {
    val d = quads((ex("x"), ex("p"), "1"), (ex("y"), ex("q"), ex("x")))
    assert(run(d, "SELECT ?s ?p ?o WHERE { ?s ?p ?o . }").toSet == Set(
      Seq(Some(ex("x")), Some(ex("p")), Some("1")),
      Seq(Some(ex("y")), Some(ex("q")), Some(ex("x")))))
    // join through the verb variable: predicates used by ≥2 subjects
    val d2 = quads(
      (ex("a"), ex("p"), "1"), (ex("b"), ex("p"), "2"),
      (ex("c"), ex("q"), "3"))
    assert(run(d2, EX + "SELECT DISTINCT ?p WHERE { ?s1 ?p ?o1 . " +
      "?s2 ?p ?o2 . FILTER(?s1 != ?s2) }") == Seq(Seq(Some(ex("p")))))
  }

  test("w3c bindings/values07 (adapted): post-query VALUES restricts solutions") {
    val d = quads(
      (ex("s1"), ex("p"), "1"), (ex("s2"), ex("p"), "2"),
      (ex("s3"), ex("p"), "3"))
    assert(run(d, EX +
      "SELECT ?s ?o WHERE { ?s ex:p ?o . } VALUES ?o { \"1\" \"3\" }").toSet ==
      Set(Seq(Some(ex("s1")), Some("1")), Seq(Some(ex("s3")), Some("3"))))
  }

  test("w3c bindings/values08 (adapted): trailing multi-var block with UNDEF") {
    val d = quads(
      (ex("s1"), ex("p"), "1"), (ex("s2"), ex("p"), "2"))
    // UNDEF ?o row pairs s2's solution with tag "any"; the bound row
    // pins (o=1, tag="one") to s1 only
    val got = run(d, EX +
      "SELECT ?s ?o ?t WHERE { ?s ex:p ?o . } " +
        "VALUES (?o ?t) { (\"1\" \"one\") (UNDEF \"any\") }").toSet
    assert(got == Set(
      Seq(Some(ex("s1")), Some("1"), Some("one")),
      Seq(Some(ex("s1")), Some("1"), Some("any")),
      Seq(Some(ex("s2")), Some("2"), Some("any"))))
  }

  test("w3c §18.2.4.7: trailing VALUES joins AFTER aggregation, not before") {
    // grouped counts first, THEN the block keeps one group key — a
    // pre-aggregation join would also change the counts of kept groups
    // if values rows duplicated (they don't here, but the position is
    // observable through which keys survive with which counts)
    val d = quads(
      (ex("a"), ex("p"), "x"), (ex("a"), ex("p"), "y"),
      (ex("b"), ex("p"), "z"))
    assert(run(d, EX +
      "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ex:p ?o . } GROUP BY ?s " +
        "VALUES ?s { <urn:ex#a> }") ==
      Seq(Seq(Some(ex("a")), Some("2"))))
  }

  test("w3c §18.2.4: SELECT-expression Extend runs AFTER the trailing-VALUES join") {
    // ?x is bound ONLY by the trailing VALUES; a WHERE-group BIND desugar
    // would compute ?y from an unbound ?x (round-12 fix: the Extend is
    // carried separately and evaluated post-join)
    val d = quads((ex("s1"), ex("p"), "1"))
    assert(run(d, EX +
      "SELECT ?s (CONCAT(?x, \"!\") AS ?y) WHERE { ?s ex:p ?o . } " +
        "VALUES ?x { \"a\" \"b\" }").toSet == Set(
      Seq(Some(ex("s1")), Some("a!")), Seq(Some(ex("s1")), Some("b!"))))
    // a WHERE-bound var still computes identically through the join
    assert(run(d, EX +
      "SELECT ?s (CONCAT(?o, \"!\") AS ?y) WHERE { ?s ex:p ?o . } " +
        "VALUES ?o { \"1\" \"9\" }") ==
      Seq(Seq(Some(ex("s1")), Some("1!"))))
  }

  // ---- lang()/langMatches()/datatype() (data-r2/expr-builtin) ------------
  // Runnable since round 11's RdfTerms encoding (tags and datatype IRIs
  // are recoverable from the stored term); transcribed in round 12. The
  // projected values below are the BOUNDARY-STRIPPED lexicals (the
  // rdflib-parity result boundary) — the semantic point under test is
  // WHICH solutions survive, which the original suite pins identically.

  private def tagged(lex: String, tag: String) = RdfTerms.encodeLang(lex, tag)

  test("w3c expr-builtin q-langMatches-1..4 (adapted): exact, prefix, '*', negated ranges") {
    // data-r2/expr-builtin data-langMatches: abc plain / @en / @en-gb / @fr
    val d = quads(
      (ex("x1"), ex("p"), "abc"),
      (ex("x2"), ex("p"), tagged("abc", "en")),
      (ex("x3"), ex("p"), tagged("abc", "en-gb")),
      (ex("x4"), ex("p"), tagged("abc", "fr")))
    def m(range: String) = run(d, EX +
      s"""SELECT ?s WHERE { ?s ex:p ?v . FILTER LANGMATCHES(LANG(?v), "$range") }""")
      .map(_.head.get).toSet
    // q-langMatches-1: the basic range "en-GB" matches only en-gb
    // (case-insensitive per RFC 4647), NOT the shorter "en"
    assert(m("en-GB") == Set(ex("x3")))
    // q-langMatches-2: "en" is a prefix range -> en and en-gb
    assert(m("en") == Set(ex("x2"), ex("x3")))
    // q-langMatches-3: "*" matches every tagged literal, never plain
    assert(m("*") == Set(ex("x2"), ex("x3"), ex("x4")))
    // q-langMatches-4: negation keeps only the untagged literal
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ?v . " +
      "FILTER(!LANGMATCHES(LANG(?v), \"*\")) }").map(_.head.get).toSet ==
      Set(ex("x1")))
  }

  test("w3c expr-builtin q-lang-1/2 (adapted): lang() is the tag, \"\" for plain literals") {
    val d = quads(
      (ex("x1"), ex("p"), "abc"),
      (ex("x2"), ex("p"), tagged("abc", "en")),
      (ex("x3"), ex("p"), tagged("abc", "fr")))
    // lang(?v) = "" selects exactly the plain literal
    assert(run(d, EX +
      "SELECT ?s WHERE { ?s ex:p ?v . FILTER(LANG(?v) = \"\") }") ==
      Seq(Seq(Some(ex("x1")))))
    // lang(?v) = "en" — tag equality (lowercased store form)
    assert(run(d, EX +
      "SELECT ?s WHERE { ?s ex:p ?v . FILTER(LANG(?v) = \"en\") }") ==
      Seq(Seq(Some(ex("x2")))))
  }

  test("w3c expr-builtin q-datatype-1..3 (adapted): typed, simple, and tagged literals") {
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    val d = quads(
      (ex("x1"), ex("p"), RdfTerms.encodeTyped("P1Y", xsd + "duration")),
      (ex("x2"), ex("p"), "plain"),
      (ex("x3"), ex("p"), tagged("chat", "fr")))
    // q-datatype-1 shape: select by the ^^-annotation
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ?v . " +
      s"FILTER(DATATYPE(?v) = <${xsd}duration>) }") ==
      Seq(Seq(Some(ex("x1")))))
    // q-datatype-2 (SPARQL 1.1 semantics): a simple literal reads xsd:string
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ?v . " +
      s"FILTER(DATATYPE(?v) = <${xsd}string>) }") ==
      Seq(Seq(Some(ex("x2")))))
    // RDF 1.1: a lang-tagged literal reads rdf:langString
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ?v . " +
      "FILTER(DATATYPE(?v) = <http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>) }") ==
      Seq(Seq(Some(ex("x3")))))
  }

  test("w3c data-r2/open-eq-07/08 (adapted): language tags compare case-insensitively") {
    // RDF 1.1 §3.3: "xyz"@EN and "xyz"@en are the SAME term (BCP 47 tags
    // are case-insensitive) — equality, BGP constant matching, and
    // DISTINCT must all agree. The store normalizes tags to lowercase at
    // every entry point (round 12), making codepoint equality correct.
    val d = quads(
      (ex("x1"), ex("p"), tagged("xyz", "EN")),
      (ex("x2"), ex("p"), tagged("xyz", "en")),
      (ex("x3"), ex("p"), tagged("xyz", "fr")))
    // a lowercase query constant matches the uppercase-loaded term
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p \"xyz\"@en . }")
      .map(_.head.get).toSet == Set(ex("x1"), ex("x2")))
    // and term-level DISTINCT sees one @en term, not two
    assert(run(d, EX + "SELECT DISTINCT ?v WHERE { ?s ex:p ?v . }").size == 2)
    // sameTerm across differently-cased source tags
    assert(run(d, EX + "SELECT ?a ?b WHERE { ?a ex:p ?x . ?b ex:p ?y . " +
      "FILTER(SAMETERM(?x, ?y) && STR(?a) < STR(?b)) }") ==
      Seq(Seq(Some(ex("x1")), Some(ex("x2")))))
  }

  test("w3c functions/strlang01 + strdt01 (adapted): constructed terms join stored ones") {
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    val d = quads(
      (ex("x1"), ex("p"), "chat"),
      (ex("x2"), ex("q"), tagged("chat", "en-us")),
      (ex("x3"), ex("r"), RdfTerms.encodeTyped("P1Y", xsd + "duration")))
    // strlang01: STRLANG("chat", "en-US") — tag lowercases like the
    // loader, so the constructed term is term-equal to the stored @en-us
    assert(run(d, EX + "SELECT ?s WHERE { ?x ex:p ?v . ?s ex:q ?w . " +
      "BIND(STRLANG(?v, \"en-US\") AS ?c) FILTER SAMETERM(?c, ?w) }") ==
      Seq(Seq(Some(ex("x2")))))
    // strdt01 shape: STRDT re-annotates to the same encoding the loader
    // produced for a non-shape datatype
    assert(run(d, EX + "SELECT ?s WHERE { ?x ex:p ?v . ?s ex:r ?w . " +
      s"BIND(STRDT(\"P1Y\", <${xsd}duration>) AS ?c) FILTER SAMETERM(?c, ?w) }") ==
      Seq(Seq(Some(ex("x3")))))
  }

  test("w3c functions/strlang03 + strdt03 (adapted): non-simple-literal " +
      "inputs are type errors (round 13)") {
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    val d = quads(
      (ex("x1"), ex("p"), ex("iri-object")),   // IRI
      (ex("x2"), ex("p"), tagged("chat", "en")), // already tagged
      (ex("x3"), ex("p"), "5"),                  // shorthand integer term
      (ex("x4"), ex("p"), "plain"))              // simple literal
    // STRLANG: only the simple literal binds; IRI / tagged / typed
    // inputs leave ?c unbound (the suite's strlang03 error family —
    // previously unanswerable because an IRI looked like a plain literal)
    val sl = run(d, EX + "SELECT ?s ?c WHERE { ?s ex:p ?v . " +
      "BIND(STRLANG(?v, \"en\") AS ?c) }")
      .map(r => r(0) -> r(1)).toMap
    assert(sl(Some(ex("x4"))) == Some("plain"))
    assert(sl(Some(ex("x1"))).isEmpty && sl(Some(ex("x2"))).isEmpty &&
      sl(Some(ex("x3"))).isEmpty)
    // STRDT: same domain rule
    val sd = run(d, EX + "SELECT ?s ?c WHERE { ?s ex:p ?v . " +
      s"BIND(STRDT(?v, <${xsd}duration>) AS ?c) }")
      .map(r => r(0) -> r(1)).toMap
    assert(sd(Some(ex("x4"))) == Some("plain"))
    assert(sd(Some(ex("x1"))).isEmpty && sd(Some(ex("x2"))).isEmpty &&
      sd(Some(ex("x3"))).isEmpty)
  }

  test("w3c data-r2/expr-builtin str-1/str-2 (adapted): STR of IRIs and " +
      "literals is the simple lexical") {
    val d = quads(
      (ex("x1"), ex("p"), ex("v1")),
      (ex("x2"), ex("p"), tagged("chat", "fr")),
      (ex("x3"), ex("p"), "1"))
    // STR(<iri>) = the IRI string as a SIMPLE literal: it joins string
    // constants (str-1), and its DATATYPE is xsd:string, never an error
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ?v . " +
      s"""FILTER(STR(?v) = "${ex("v1")}") }""") == Seq(Seq(Some(ex("x1")))))
    val dt = run(d, EX + "SELECT ?s ?t WHERE { ?s ex:p ?v . " +
      "BIND(DATATYPE(STR(?v)) AS ?t) }").map(r => r(0) -> r(1)).toMap
    assert(dt(Some(ex("x1"))) ==
      Some("http://www.w3.org/2001/XMLSchema#string"))
    // str-2: STR of a tagged literal drops the tag
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ?v . " +
      "FILTER(STR(?v) = \"chat\") }") == Seq(Seq(Some(ex("x2")))))
    // shape note: STR("1") normalizes like every simple-literal entry
    // point — it numeric-joins the shorthand term
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ?v . " +
      "FILTER(sameTerm(STR(?v), 1)) }") == Seq(Seq(Some(ex("x3")))))
  }

  test("w3c functions/ucase01 + lcase01 (adapted): case mapping over the lexical form") {
    val d = quads(
      (ex("x1"), ex("p"), "foo"),
      (ex("x2"), ex("p"), tagged("BAR", "en")))
    // UCASE/LCASE operate on the LEXICAL form — the tagged literal's
    // lexical is stripped first (the documented result boundary)
    assert(run(d, EX + "SELECT ?s ?u ?l WHERE { ?s ex:p ?v . " +
      "BIND(UCASE(?v) AS ?u) BIND(LCASE(?v) AS ?l) } ORDER BY ?s").toSet ==
      Set(
        Seq(Some(ex("x1")), Some("FOO"), Some("foo")),
        Seq(Some(ex("x2")), Some("BAR"), Some("bar"))))
  }

  test("w3c data-r2/dataset dataset-01/dataset-05/dataset-09b (adapted): FROM / FROM NAMED scoping") {
    // RDF dataset clause (§13.2): FROM graphs MERGE into the default
    // graph; FROM NAMED lists the graphs GRAPH may range over; each set
    // is invisible to the other.
    val s = spark
    import s.implicits._
    val d = Seq(
      Quad("urn:g1#", ex("a"), ex("p"), "1"),
      Quad("urn:g2#", ex("b"), ex("p"), "2"),
      Quad("urn:g3#", ex("c"), ex("p"), "3")).toDF()
    // dataset-01 shape: FROM <g1> — only g1's triples are visible
    assert(run(d, EX + "SELECT ?s FROM <urn:g1#> WHERE { ?s ex:p ?o . }")
      .map(_.head.get) == Seq(ex("a")))
    // dataset-05 shape: two FROM graphs merge
    assert(run(d, EX +
      "SELECT ?s FROM <urn:g1#> FROM <urn:g2#> WHERE { ?s ex:p ?o . }")
      .map(_.head.get).toSet == Set(ex("a"), ex("b")))
    // dataset-09b shape: FROM NAMED only — the default graph is EMPTY,
    // and GRAPH ?g ranges over exactly the named set
    assert(run(d, EX +
      "SELECT ?s FROM NAMED <urn:g3#> WHERE { ?s ex:p ?o . }").isEmpty)
    assert(run(d, EX + "SELECT ?g ?s FROM NAMED <urn:g3#> " +
      "WHERE { GRAPH ?g { ?s ex:p ?o . } }") ==
      Seq(Seq(Some("urn:g3#"), Some(ex("c")))))
    // and a FROM graph is NOT GRAPH-visible (disjoint sets)
    assert(run(d, EX + "SELECT ?g FROM <urn:g1#> " +
      "WHERE { GRAPH ?g { ?s ex:p ?o . } }").isEmpty)
  }

  test("w3c aggregates agg-min-01 / agg-max-01 (adapted): numeric extremes per group") {
    // sparql11 aggregates data-01 shape: int/decimal/double mixed rows
    // per subject; MIN/MAX must compare by VALUE ({10, 9}: min is 9,
    // which lexical codepoint order gets wrong)
    val d = quads(
      (ex("ints"), ex("p"), "10"), (ex("ints"), ex("p"), "9"),
      (ex("decimals"), ex("p"), "2.2"), (ex("decimals"), ex("p"), "10.1"),
      (ex("mixed"), ex("p"), "1"), (ex("mixed"), ex("p"), "0.2"))
    assert(run(d, EX + "SELECT ?s (MIN(?v) AS ?lo) (MAX(?v) AS ?hi) " +
      "WHERE { ?s ex:p ?v . } GROUP BY ?s ORDER BY ?s").toSet == Set(
      Seq(Some(ex("ints")), Some("9"), Some("10")),
      Seq(Some(ex("decimals")), Some("2.2"), Some("10.1")),
      Seq(Some(ex("mixed")), Some("0.2"), Some("1"))))
  }

  test("w3c data-r2/type-promotion tP-* (adapted): xsd numeric subtypes compare by promoted value") {
    // §17.3 + XPath promotion lattice: operands of ANY two xsd numeric
    // datatypes (byte, short, int, long, integer, decimal, float,
    // double, the unsigned/negative families) promote to a common
    // numeric type and compare by VALUE — "5"^^xsd:byte = "5"^^xsd:short
    // is true, "05"^^xsd:int = "5"^^xsd:long is true despite distinct
    // lexicals/terms. Pre-round-14 the dispatch was syntactic (a numeric
    // LITERAL operand forced it) so all of these compared as terms.
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    def typed(l: String, dt: String) = RdfTerms.encodeTyped(l, xsd + dt)
    val d = quads(
      (ex("b5"), ex("p"), typed("5", "byte")),
      (ex("s5"), ex("p"), typed("5", "short")),
      (ex("i05"), ex("p"), typed("05", "int")),
      (ex("l5"), ex("p"), typed("5", "long")),
      (ex("f51"), ex("p"), typed("5.1", "float")),
      (ex("d51"), ex("p"), typed("5.1", "decimal")),
      (ex("i10"), ex("p"), typed("10", "int")),
      (ex("u9"), ex("p"), typed("9", "unsignedByte")),
      (ex("en5"), ex("p"), tagged("5", "en")),
      (ex("str"), ex("p"), "notanumber"))
    // tP-byte-short shape: cross-subtype value equality via a typed
    // FILTER constant (neither side is a bare numeric literal)
    assert(run(d, EX + "ASK { ?s ex:p ?v . " +
      s"""FILTER(?s = <${ex("b5")}> && ?v = "5"^^<${xsd}short>) }""") ==
      Seq(Seq(Some("true"))))
    // lexically distinct, value-equal across subtypes ("05"^^int = "5"^^long)
    assert(run(d, EX + "ASK { <" + ex("i05") + "> ex:p ?a . <" +
      ex("l5") + "> ex:p ?b . FILTER(?a = ?b) }") ==
      Seq(Seq(Some("true"))))
    // tP-float-decimal shape
    assert(run(d, EX + "ASK { <" + ex("f51") + "> ex:p ?a . <" +
      ex("d51") + "> ex:p ?b . FILTER(?a = ?b) }") ==
      Seq(Seq(Some("true"))))
    // ordering promotes too: "9"^^unsignedByte < "10"^^int (codepoint
    // order of the lexicals says the opposite)
    assert(run(d, EX + "ASK { <" + ex("u9") + "> ex:p ?a . <" +
      ex("i10") + "> ex:p ?b . FILTER(?a < ?b) }") ==
      Seq(Seq(Some("true"))))
    // value-UNEQUAL subtypes stay unequal
    assert(run(d, EX + "ASK { <" + ex("b5") + "> ex:p ?a . <" +
      ex("i10") + "> ex:p ?b . FILTER(?a = ?b) }") ==
      Seq(Seq(Some("false"))))
    // a lang-tagged "5"@en is rdf:langString, NOT numeric — term
    // comparison applies and the typed twin stays distinct
    assert(run(d, EX + "ASK { <" + ex("en5") + "> ex:p ?a . <" +
      ex("b5") + "> ex:p ?b . FILTER(?a = ?b) }") ==
      Seq(Seq(Some("false"))))
    // a numeric-typed term with a non-castable partner falls back to
    // term comparison (no spurious numeric coercion of plain strings)
    assert(run(d, EX + "ASK { <" + ex("str") + "> ex:p ?a . <" +
      ex("b5") + "> ex:p ?b . FILTER(?a = ?b) }") ==
      Seq(Seq(Some("false"))))
  }

  test("integer/integer comparison is EXACT past 2^53 (round 15): distinct " +
      "big integers stay distinct and order correctly; only genuine " +
      "float/decimal mixes promote through double") {
    // §17.3: integer/decimal comparison is exact. 2^53 and 2^53+1 are
    // DISTINCT integers whose double images coincide — the round-14
    // double-promoted dispatch called them equal and inverted orderings.
    // The round-15 path compares integer-derived pairs through
    // decimal(38,0).
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    def typed(l: String, dt: String) = RdfTerms.encodeTyped(l, xsd + dt)
    val d = quads(
      (ex("a"), ex("p"), typed("9007199254740992", "integer")),  // 2^53
      (ex("b"), ex("p"), typed("9007199254740993", "long")),     // 2^53+1
      (ex("c"), ex("p"), typed("9007199254740993", "integer")),
      // 38-digit integers still compare exactly through decimal(38,0)
      (ex("big1"), ex("p"),
        typed("99999999999999999999999999999999999998", "integer")),
      (ex("big2"), ex("p"),
        typed("99999999999999999999999999999999999999", "integer")),
      (ex("f"), ex("p"), typed("9007199254740992.0", "double")))
    def ask(a: String, b: String, op: String) =
      run(d, EX + s"ASK { <${ex(a)}> ex:p ?a . <${ex(b)}> ex:p ?b . " +
        s"FILTER(?a $op ?b) }") == Seq(Seq(Some("true")))
    assert(ask("a", "b", "!="))  // 2^53 != 2^53+1 (double says equal)
    assert(ask("a", "b", "<"))   // and the ordering is right
    assert(!ask("a", "b", "=") && !ask("a", "b", ">"))
    assert(ask("b", "c", "="))   // cross-subtype (long/integer) exact too
    assert(ask("big1", "big2", "<") && ask("big1", "big2", "!="))
    // a genuine integer/double MIX promotes through double (its own
    // lattice): 2^53+1 == 2^53.0e0 there — the documented 2^53 bound
    // now applies ONLY to pairs with a floating operand
    assert(ask("b", "f", "="))
  }

  test("w3c data-r2/expr-equals eq-1/eq-2 (adapted): = across lexical forms of one numeric value") {
    // eq-1: xsd:integer "1" vs "01" — value-equal, term-distinct; eq-2:
    // the double/decimal spellings of 1 — all numeric-equal under the
    // §17.3 promotion. The graph-level BGP match (same constant) stays
    // TERM-level: only the exact term matches the pattern.
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    val d = quads(
      (ex("i1"), ex("p"), "1"),
      (ex("i01"), ex("p"), RdfTerms.encodeTyped("01", xsd + "integer")),
      (ex("d1"), ex("p"), RdfTerms.encodeTyped("1.0e0", xsd + "double")),
      (ex("c1"), ex("p"), "1.0"))
    // all four values are numerically 1 → every ordered pair is =
    assert(run(d, EX + "SELECT (COUNT(*) AS ?n) WHERE { ?a ex:p ?v1 . " +
      "?b ex:p ?v2 . FILTER(?v1 = ?v2) }") == Seq(Seq(Some("16"))))
    // sameTerm keeps them apart (4 reflexive pairs only)
    assert(run(d, EX + "SELECT (COUNT(*) AS ?n) WHERE { ?a ex:p ?v1 . " +
      "?b ex:p ?v2 . FILTER(sameTerm(?v1, ?v2)) }") == Seq(Seq(Some("4"))))
    // BGP constant matching is term-level: the bare shorthand constant 1
    // matches only the bare term
    assert(run(d, EX + "SELECT ?a WHERE { ?a ex:p 1 . }") ==
      Seq(Seq(Some(ex("i1")))))
  }

  test("w3c pp/path sequence with inverse step (adapted): ^p/q composes") {
    // friends-graph shape: x --p--> y --q--> z; from y, ^p reaches x's
    // subject position... from z's perspective: ?s (^q/^p) finds x.
    val d = quads(
      (ex("x"), ex("p"), ex("y")),
      (ex("y"), ex("q"), ex("z")),
      (ex("x2"), ex("p"), ex("y2")))
    // forward sequence p/q
    assert(run(d, EX + "SELECT ?s ?o WHERE { ?s ex:p/ex:q ?o . }") ==
      Seq(Seq(Some(ex("x")), Some(ex("z")))))
    // inverse composed with forward: start at y, ^p back to x, then p
    // forward again to y (round trip)
    assert(run(d, EX + "SELECT ?o WHERE { <" + ex("y") + "> ^ex:p/ex:p ?o . }") ==
      Seq(Seq(Some(ex("y")))))
    // pure inverse sequence from the far end: z (^q/^p) x
    assert(run(d, EX + "SELECT ?o WHERE { <" + ex("z") + "> ^ex:q/^ex:p ?o . }") ==
      Seq(Seq(Some(ex("x")))))
  }

  test("w3c sparql11 aggregates/agg-empty-group (adapted): empty group pattern {} is {mu0}") {
    // §18.2.2.2: the empty GroupGraphPattern evaluates to the
    // one-empty-solution relation {μ0}, so a global aggregate sees ONE
    // solution — COUNT(*) is 1, COUNT(?x) of the unbound ?x is 0, and a
    // projected variable nothing binds comes back unbound, not an error.
    val d = quads((ex("a"), ex("p"), "1"))
    assert(run(d, "SELECT (COUNT(*) AS ?c) WHERE {}") ==
      Seq(Seq(Some("1"))))
    assert(run(d, "SELECT (COUNT(?x) AS ?c) WHERE {}") ==
      Seq(Seq(Some("0"))))
    assert(run(d, "SELECT ?x WHERE {}") == Seq(Seq(None)))
    // a nested {} joins its enclosing group as the identity
    assert(run(d, EX + "SELECT ?s WHERE { ?s ex:p ?o . {} }") ==
      Seq(Seq(Some(ex("a")))))
    // an all-ground group that MATCHED is the same one-empty-solution
    // relation (§18.3.1), not the empty relation
    assert(run(d, EX +
      "SELECT (COUNT(*) AS ?c) WHERE { <urn:ex#a> ex:p \"1\" }") ==
      Seq(Seq(Some("1"))))
    assert(run(d, EX +
      "SELECT (COUNT(*) AS ?c) WHERE { <urn:ex#a> ex:p \"2\" }") ==
      Seq(Seq(Some("0"))))
    // {μ0} flows through FILTER with normal three-valued semantics
    assert(run(d, "ASK { FILTER(1 = 1) }") == Seq(Seq(Some("true"))))
    assert(run(d, "ASK { FILTER(1 = 2) }") == Seq(Seq(Some("false"))))
  }

  /** Suite regions NOT runnable here, each with the blocking reason —
    * the honest skip ledger the pass counts above must be read against.
    * (Features marked "rejected loudly" raise a named error at parse
    * time rather than mis-evaluating — RobustnessSpec's house rule.) */
  val documentedSkips: Seq[(String, String)] = Seq(
    "property paths over variable predicates (?p*, ?p/iri)" ->
      "the SPARQL Path grammar itself has no variables (§9.1) — rejected loudly; plain variable verbs (dawg-tp-03, ?s ?p ?o) are SUPPORTED since round 11",
    "sparql11 service/*" ->
      "SERVICE rejected by design (no federation endpoint in a batch engine)",
    "sparql11 property-path/pp09 (p{n,m} bounds)" ->
      "counted path quantifiers were dropped from the final REC grammar; not implemented",
    "sparql11 entailment/*" ->
      "RDFS/OWL entailment regimes out of scope (the reference merges the ontology offline instead)",
    "sparql11 functions/now01, rand01, uuid01, struuid01, bnode01" ->
      "non-deterministic builtins have no oracle-checkable value; out of subset",
    "STRLANG/STRDT over shorthand-shaped simple literals (\"5\")" ->
      "the numeric-shape conflation (RdfTerms.encodePlain) stores the simple literal \"5\" as the bare integer term, so the simple-literal domain test cannot recognize it and STRLANG(\"5\",\"en\")/STRDT(\"5\",xsd:byte) type-error where the spec binds; non-shorthand lexicals are exact")

  test("skip ledger is explicit and reasoned") {
    assert(documentedSkips.nonEmpty)
    assert(documentedSkips.forall(_._2.nonEmpty))
    info(s"${documentedSkips.size} suite regions skipped with reasons; " +
      "all runnable transcriptions pass (see cases above)")
  }
}
