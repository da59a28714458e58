package graft.examples

import graft.Engine
import graft.sources.{Ingest, StatsIndex, Turtle}
import org.apache.spark.sql.SparkSession

import java.nio.file.Files

/** Runnable end-to-end demo of the full mortar pipeline (the library's
  * "hello world"): ingest single-stream CSVs → partitioned fact table →
  * stats index → load site graphs → SPARQL → pruned data scan → sinks.
  *
  * Mirrors the reference's demo flow (reference: run-example.sh +
  * mortar-parquet-client/client.py:111-149) on generated data. Pass a
  * directory of `.ttl` graphs as args(0) to use real site graphs.
  */
object MortarDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. Generate two single-stream CSVs (filename = stream uuid).
    val csvDir = Files.createTempDirectory("demo-csv")
    val uuid1 = "a0dd74ce-05ee-5fee-8335-2d9856bd52be"
    val uuid2 = "f3b61918-afa9-596d-bef5-40fe1e96454f"
    def gen(uuid: String, label: String, n: Int): Unit = {
      val base = java.time.Instant.parse("2016-11-30T00:00:00Z")
      val rows = (0 until n).map(i =>
        s"${base.plusSeconds(60L * i).toString.replace("T", " ").replace("Z", "+00:00")},${20.0 + (i % 10) * 0.1}")
      Files.write(csvDir.resolve(s"$uuid.csv"), (s"datetime,$label" +: rows).mkString("\n").getBytes)
    }
    gen(uuid1, "zone temp sensor", 2880)
    gen(uuid2, "zone temp setpoint", 2880)

    // 2. Ingest → hive-partitioned fact table (reference: transform.py).
    val factDir = Files.createTempDirectory("demo-fact").resolve("data").toString
    Ingest.transform(spark, "bldg1", csvDir.toString, factDir)
    println(s"[demo] ingested fact table at $factDir")
    spark.read.parquet(factDir).show(3, truncate = false)

    // 3. Stats index (reference: make-metadata.py).
    val statsDir = Files.createTempDirectory("demo-stats").resolve("stats").toString
    val stats = StatsIndex.build(spark, factDir, statsDir)
    println(s"[demo] stats index (validated=${StatsIndex.validate(spark, statsDir)}):")
    stats.show(truncate = false)

    // 4. Site graph: either a real .ttl directory (args(0)) or a fixture.
    val ttlDir = if (args.nonEmpty) args(0) else {
      val d = Files.createTempDirectory("demo-graphs")
      Files.write(d.resolve("bldg1.ttl"),
        s"""@prefix brick: <https://brickschema.org/schema/Brick#> .
           |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
           |@prefix ns: <urn:fix#> .
           |brick:Zone_Air_Temperature_Sensor rdfs:subClassOf brick:Temperature_Sensor .
           |brick:Temperature_Sensor rdfs:subClassOf brick:Sensor .
           |brick:Sensor rdfs:subClassOf brick:Point .
           |ns:vav1 a brick:VAV ; brick:hasPoint ns:sen1, ns:sp1 .
           |ns:sen1 a brick:Zone_Air_Temperature_Sensor ;
           |  brick:timeseries [ brick:hasTimeseriesId "$uuid1" ] .
           |ns:sp1 a brick:Zone_Air_Temperature_Setpoint ;
           |  brick:timeseries [ brick:hasTimeseriesId "$uuid2" ] .
           |""".stripMargin.getBytes)
      d.toString
    }
    val quads = Turtle.loadGraphs(spark, ttlDir)
    println(s"[demo] loaded ${quads.count()} quads from $ttlDir")

    // 5. SPARQL over the graphs (reference: client.py:116-127).
    val engine = new Engine(spark, quads, spark.read.parquet(factDir))
    val allPoints =
      """PREFIX brick: <https://brickschema.org/schema/Brick#>
        |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        |PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        |SELECT * WHERE {
        |  ?point rdf:type/rdfs:subClassOf* brick:Point .
        |  ?point rdf:type ?type .
        |  ?point brick:timeseries [ brick:hasTimeseriesId ?id ] .
        |}""".stripMargin
    println("[demo] all_points SPARQL:")
    engine.sparql(allPoints, sites = Seq("bldg1")).show(5, truncate = false)

    // 6. Flagship two-level query: SPARQL → uuid set → pruned scan
    //    (reference: client.py:95-109).
    val df = engine.dataSparql(allPoints, sites = Seq("bldg1"),
      start = "2016-12-01T00:00:00Z", end = "2016-12-02T00:00:00Z")
    println(s"[demo] dataSparql rows=${df.count()}")
    df.show(3, truncate = false)
    println("[demo] physical plan (note PushedFilters + partition pruning):")
    df.explain("formatted")

    // 7. CSV sink (reference: client.py:74-80).
    val out = Files.createTempDirectory("demo-out").resolve("csv").toString
    val n = engine.dataSparqlToCsv(allPoints, out, sites = Seq("bldg1"),
      start = "2016-12-01T00:00:00Z", end = "2016-12-02T00:00:00Z")
    println(s"[demo] wrote $n rows to $out")
    spark.stop()
  }
}
