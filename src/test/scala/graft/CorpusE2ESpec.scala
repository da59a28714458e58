package graft

import graft.sources.{Ingest, Turtle}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end over the REAL 45-graph corpus: the reference's flagship
  * sensor/setpoint/VAV query (client.py:129-140) with a micro Brick
  * ontology injected (offline stand-in for the nightly Brick.ttl the
  * reference merges into every graph, setup-graphs.py:22), driving a
  * pruned scan over an ingested fact table for the discovered uuids. */
class CorpusE2ESpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  val graphsDir = "/root/reference/mortar-parquet-client/graphs"

  val query1: String =
    """PREFIX brick: <https://brickschema.org/schema/Brick#>
      |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
      |PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
      |SELECT ?vav ?sen ?sp WHERE {
      |  ?sen_point rdf:type/rdfs:subClassOf* brick:Temperature_Sensor ;
      |      brick:timeseries [ brick:hasTimeseriesId ?sen ] .
      |  ?sp_point rdf:type/rdfs:subClassOf* brick:Temperature_Setpoint ;
      |      brick:timeseries [ brick:hasTimeseriesId ?sp ] .
      |  ?vav a brick:VAV .
      |  ?vav brick:hasPoint ?sen_point, ?sp_point .
      |}""".stripMargin

  test("flagship query over real graphs + micro ontology → uuids → pruned scan") {
    assume(new java.io.File(graphsDir).isDirectory)
    val s = spark
    import s.implicits._

    // micro ontology: just the subclass edges the flagship query traverses,
    // written as a real `.ttl` file and merged into EVERY named graph by the
    // LOADER itself — the same path the reference takes with the full Brick
    // ontology (setup-graphs.py:22 — site-scoped queries must see the
    // hierarchy inside their own graph)
    val ontTtl =
      """@prefix brick: <https://brickschema.org/schema/Brick#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |brick:Zone_Air_Temperature_Sensor rdfs:subClassOf brick:Air_Temperature_Sensor .
        |brick:Air_Temperature_Sensor rdfs:subClassOf brick:Temperature_Sensor .
        |brick:Zone_Air_Temperature_Setpoint rdfs:subClassOf brick:Air_Temperature_Setpoint .
        |brick:Air_Temperature_Setpoint rdfs:subClassOf brick:Temperature_Setpoint .
        |""".stripMargin
    val ontPath = Files.createTempDirectory("corpus-ont").resolve("brick.ttl")
    Files.write(ontPath, ontTtl.getBytes("UTF-8"))
    val quads = Turtle.loadGraphs(spark, graphsDir, Some(ontPath.toString))
    val engine = new Engine(spark, quads, spark.range(0).toDF())

    val bindings = engine.sparql(query1, sites = Seq("bldg1", "bldg2"))
    val rows = bindings.collect()
    assert(rows.nonEmpty, "flagship query should bind on real graphs with the hierarchy present")
    // bldg1 types its zone sensors directly; verify a known VAV shows up
    assert(rows.exists(_.getString(0).contains("bldg1")))
    val sensorIds = rows.map(_.getString(1)).distinct
    assert(sensorIds.forall(_.matches("[0-9a-f-]{36}")))

    // ingest a fact table for two of the discovered streams and run the
    // full two-level flow (uuid IN (...) AND time range)
    val csv = Files.createTempDirectory("corpus-csv")
    val base = java.time.Instant.parse("2016-01-01T00:00:00Z")
    sensorIds.take(2).foreach { id =>
      val lines = (0 until 500).map(i =>
        s"${base.plusSeconds(600L * i).toString.replace("T", " ").replace("Z", "+00:00")},${20 + (i % 7) * 0.5}")
      Files.write(csv.resolve(s"$id.csv"), (s"datetime,sensor" +: lines).mkString("\n").getBytes)
    }
    val factDir = Files.createTempDirectory("corpus-fact").resolve("d").toString
    Ingest.transform(spark, "bldg1", csv.toString, factDir)
    val engine2 = new Engine(spark, quads, spark.read.parquet(factDir))
    val data = engine2.dataSparql(query1, sites = Seq("bldg1", "bldg2"),
      start = "2016-01-01T00:00:00Z", end = "2016-01-02T00:00:00Z")
    // 500 readings/stream at 10-min cadence → 145 rows in the first day
    assert(data.count() == 2 * 145)
    assert(data.select("uuid").distinct().count() == 2)
  }

  test("round-8 SPARQL surface over the real corpus: FILTER/EXISTS/ASK/DESCRIBE/GROUP_CONCAT") {
    assume(new java.io.File(graphsDir).isDirectory)
    import graft.sparql.{BgpPlanner, Sparql}
    val quads = Turtle.loadGraphs(spark, graphsDir, None)
    val scoped = quads.filter(col("graph") === "urn:bldg1#")
      .select("s", "p", "o").distinct().cache()
    val prefix =
      """PREFIX brick: <https://brickschema.org/schema/Brick#>
        |PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        |""".stripMargin
    try {
      // FILTER regex narrows real timeseries ids; EXISTS demands the point
      // belong to some equipment via hasPoint (inverse direction)
      val filtered = BgpPlanner.evaluateTriples(scoped, Sparql.parse(prefix +
        """SELECT ?pt ?id WHERE {
          |  ?pt brick:timeseries [ brick:hasTimeseriesId ?id ] .
          |  FILTER regex(?id, "^[0-9a-f]{8}-")
          |  FILTER EXISTS { ?eq brick:hasPoint ?pt }
          |}""".stripMargin)).collect()
      assert(filtered.nonEmpty)
      assert(filtered.forall(_.getString(1).matches("[0-9a-f-]{36}")))
      // ASK: VAVs exist in bldg1; a made-up class does not
      def ask(cls: String): String = BgpPlanner.evaluateTriples(scoped,
        Sparql.parse(prefix + s"ASK { ?x a brick:$cls }"))
        .collect().head.getString(0)
      assert(ask("VAV") == "true" && ask("Nonexistent_Class") == "false")
      // DESCRIBE a real VAV: returns its type + hasPoint triples
      val vav = scoped.filter(col("p") === Model.RdfType &&
        col("o") === "https://brickschema.org/schema/Brick#VAV")
        .select("s").orderBy("s").limit(1).collect().head.getString(0)
      val desc = BgpPlanner.evaluateTriples(scoped,
        Sparql.parse(s"DESCRIBE <$vav>")).collect()
      assert(desc.nonEmpty && desc.forall(_.getString(0) == vav))
      assert(desc.exists(_.getString(1) == Model.RdfType))
      // GROUP_CONCAT: per-class point rosters, deterministic (sorted)
      val roster = BgpPlanner.evaluateTriples(scoped, Sparql.parse(prefix +
        """SELECT ?cls (COUNT(?x) AS ?n) (GROUP_CONCAT(?x; SEPARATOR="|") AS ?members)
          |WHERE { ?x a ?cls } GROUP BY ?cls ORDER BY DESC(?n) LIMIT 3""".stripMargin))
        .collect()
      assert(roster.length == 3)
      val members = roster.head.getString(2).split("\\|")
      assert(members.length == roster.head.getLong(1))
      assert(members.toSeq == members.toSeq.sorted)
    } finally { scoped.unpersist(); () }
  }

  test("round-9 SPARQL surface over the real corpus: GRAPH keyword + nested OPTIONAL") {
    assume(new java.io.File(graphsDir).isDirectory)
    import graft.sparql.{BgpPlanner, Sparql}
    val quads = Turtle.loadGraphs(spark, graphsDir, None).cache()
    val prefix = "PREFIX brick: <https://brickschema.org/schema/Brick#> "
    try {
      // GRAPH ?g binds one row per (building, timeseries id) — the per-
      // building stream inventory the reference keeps as 45 named graphs
      // (setup-graphs.py:13-19). Totals must reconcile with the raw quads.
      val perBldg = BgpPlanner.evaluate(quads, Sparql.parse(prefix +
        "SELECT ?g (COUNT(?id) AS ?n) WHERE { " +
          "GRAPH ?g { ?b brick:hasTimeseriesId ?id } } GROUP BY ?g ORDER BY ?g"))
        .collect()
      val raw = quads
        .filter(col("p") === "https://brickschema.org/schema/Brick#hasTimeseriesId")
      assert(perBldg.length ==
        raw.select("graph").distinct().count().toInt)
      assert(perBldg.map(_.getLong(1)).sum == raw.count())
      // GRAPH <iri> + nested OPTIONAL inside: bldg1 points, optionally
      // extended by their timeseries blank node then its id — counts must
      // match the flat per-graph query
      val g1 = BgpPlanner.evaluate(quads, Sparql.parse(prefix +
        "SELECT ?pt ?id WHERE { GRAPH <urn:bldg1#> { " +
          "?eq brick:hasPoint ?pt . " +
          "OPTIONAL { ?pt brick:timeseries ?ts . " +
          "OPTIONAL { ?ts brick:hasTimeseriesId ?id } } } }"))
      val rows = g1.collect()
      assert(rows.nonEmpty)
      val withId = rows.count(_.getString(1) != null)
      val direct = BgpPlanner.evaluate(quads, Sparql.parse(prefix +
        "SELECT ?pt ?id WHERE { ?eq brick:hasPoint ?pt . " +
          "?pt brick:timeseries ?ts . ?ts brick:hasTimeseriesId ?id }"),
        graph = Some("urn:bldg1#")).count()
      assert(withId == direct.toInt, s"nested-optional id count $withId != flat $direct")
    } finally { quads.unpersist(); () }
  }

  test("round-10 structural GRAPH ?var over the real 45-graph corpus") {
    assume(new java.io.File(graphsDir).isDirectory)
    import graft.sparql.{BgpPlanner, Sparql}
    // OPTIONAL inside GRAPH ?g forces the round-10 per-graph structural
    // path at the reference's REAL graph count (45 branches) — proving
    // the plan compiles and evaluates at the metadata scale the design
    // argues for. Expected relation computed independently in plain
    // Scala over the collected quad set.
    val quads = Turtle.loadGraphs(spark, graphsDir, None).cache()
    val prefix = "PREFIX brick: <https://brickschema.org/schema/Brick#> "
    try {
      val q = Sparql.parse(prefix +
        "SELECT ?g ?vav ?sen WHERE { GRAPH ?g { ?vav a brick:VAV . " +
          "OPTIONAL { ?vav brick:hasPoint ?p . ?p brick:timeseries ?ts . " +
          "?ts brick:hasTimeseriesId ?sen } } }")
      val got = BgpPlanner.evaluate(quads, q).collect()
        .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
      val B = "https://brickschema.org/schema/Brick#"
      val all = quads.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      val expected = all.groupBy(_._1).flatMap { case (g, qs) =>
        val t = qs.map(x => (x._2, x._3, x._4)).toSet
        val vavs = t.collect { case (s, p, o)
          if p == Model.RdfType && o == s"${B}VAV" => s }
        vavs.flatMap { v =>
          val sens = for {
            (s1, p1, o1) <- t if s1 == v && p1 == s"${B}hasPoint"
            (s2, p2, o2) <- t if s2 == o1 && p2 == s"${B}timeseries"
            (s3, p3, o3) <- t if s3 == o2 && p3 == s"${B}hasTimeseriesId"
          } yield o3
          // the planner output is boundary-stripped (round 13: stored
          // uuid literals are quoted) — strip the reference the same way
          def lexOf(t: String): String = graft.functions.RdfLex.lex(
            org.apache.spark.unsafe.types.UTF8String.fromString(t)).toString
          if (sens.isEmpty) Set((g, v, Option.empty[String]))
          else sens.map(x => (g, v, Option(lexOf(x))))
        }
      }.toSet
      assert(got == expected,
        s"structural GRAPH mismatch: planner=${got.size} expected=${expected.size}")
      // sanity: the result genuinely spans many buildings
      assert(got.map(_._1).size > 10, s"only ${got.map(_._1).size} graphs bound")
    } finally { quads.unpersist(); () }
  }
}
