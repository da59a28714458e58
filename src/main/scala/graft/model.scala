package graft

import org.apache.spark.sql.types._

/** Core data model of the engine.
  *
  * Mirrors the reference fact-table schema produced by the ingest pipeline
  * (reference: transform.py:24-39, README.md:14-24) and the RDF quad store
  * used for building metadata (reference: mortar-parquet-client/setup-graphs.py:13-19).
  */
object Model {

  /** One sensor reading of the time-series fact table.
    *
    * Columns and types match the reference parquet output exactly
    * (reference: transform.py:36,39 — µs timestamps, double values,
    * hive partition keys `collection`, `uuid`).
    */
  final case class Reading(
      time: java.sql.Timestamp,
      value: Double,
      label: String,
      uri: String,
      collection: String,
      uuid: String)

  /** Schema of the fact table as seen by a query (post hive-partition
    * discovery; reference: verified dataset schema in SURVEY.md §1.1). */
  val readingSchema: StructType = StructType(Seq(
    StructField("time", TimestampType),
    StructField("value", DoubleType),
    StructField("label", StringType),
    StructField("uri", StringType),
    StructField("collection", StringType),
    StructField("uuid", StringType)))

  /** One RDF statement in a named graph.
    *
    * The reference stores quads in oxigraph with one named graph per
    * building, `urn:{site}#` (reference: setup-graphs.py:18). We represent
    * the store as a plain distributed table of quads; "default union"
    * semantics (setup-graphs.py:14) = simply not filtering on `graph`.
    *
    * Term encoding (all strings, matching the reference's stringification of
    * every SPARQL term, client.py:43,53):
    *   - IRIs: the full IRI without angle brackets.
    *   - Literals: the lexical value (datatype/lang dropped — faithful, see
    *     SURVEY.md §7.4 note on literal-with-embedded-`^^`).
    *   - Blank nodes: `_:{graph-scoped generated id}`.
    */
  final case class Quad(graph: String, s: String, p: String, o: String)

  val quadSchema: StructType = StructType(Seq(
    StructField("graph", StringType),
    StructField("s", StringType),
    StructField("p", StringType),
    StructField("o", StringType)))

  /** Well-known IRIs used by the SPARQL planner. */
  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val RdfsSubClassOf = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
}
