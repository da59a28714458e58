package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      // the status store retains per-execution plan graphs/metrics even
      // with the UI off (defaults: 1000 executions); the fuzz suites run
      // ~1000 queries per JVM, so stock retention holds ~the whole run's
      // plans on heap — keep only a handful
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Test-fixture term encoding (round 13): specs build quads from raw
  * strings; literal OBJECTS must carry the store's term encoding exactly
  * as a Turtle load of the same data would produce — the shape-normalized
  * rule: non-shorthand strings QUOTE (`"alpha"`), shorthand-shaped text
  * ("5", "2.5", "true") keeps the historic bare numeric/boolean
  * normalization. IRIs (the fixtures' urn:/http(s): namespaces), blank
  * nodes, and pre-encoded values pass through. */
object TestTerms {
  def enc(o: String): String =
    if (o.startsWith("urn:") || o.startsWith("http://") ||
        o.startsWith("https://") || o.startsWith("_:") ||
        o.startsWith("\"")) o
    else RdfTerms.encodeTyped(o, RdfTerms.shapeDatatype(o))

  def t(q: Model.Quad): Model.Quad = q.copy(o = enc(q.o))
}
