package graft.examples

import graft.Model.Quad
import graft.sparql.{BgpPlanner, Sparql}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-heap growth probe for repeated small-query execution (round 12).
  *
  * The differential fuzz suites execute hundreds of tiny SPARQL queries in
  * one JVM and died on the stock 8g heap. This probe ATTRIBUTED it: the
  * `strbuiltin` mode (one fixed depth-5 nested expression) alone OOM'd
  * 8 GiB before 50 iterations — per-query EXPONENTIAL tree size, not
  * cumulative retention. compileBind inlined each input k times per
  * builtin body (RdfTerms.lex = 5 copies, dateTime accessors ~8), so a
  * depth-d nesting built ~5^d Catalyst nodes, and analyzer
  * canonicalization + codegen text finished the heap off. After the
  * bindOnce/bareLexical fix (BgpPlanner round 12) the same mode runs 200
  * iterations in ~1 min with live heap flat at ~0.7 GiB — keep this probe
  * as the regression check for compiler tree growth. Modes:
  *
  *   sparql  — BgpPlanner.evaluate of a BIND-arithmetic query (the fuzz
  *             suites' shape)
  *   frame   — the equivalent raw DataFrame pipeline (joins + withColumn),
  *             no graft code in the loop
  *   lit     — just toDF().collect() (LocalRelation floor)
  *
  * Usage: runMain graft.examples.MemoryProbe [mode] [iters]
  * A flat curve = no retention; a line = per-query leak (compare modes to
  * attribute it to graft vs Spark itself).
  */
object MemoryProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("sparql")
    val iters = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rt = Runtime.getRuntime

    def quads() = Seq(
      Quad("urn:g#", "urn:s#1", "urn:p#a", "3"),
      Quad("urn:g#", "urn:s#1", "urn:p#b", "7"),
      Quad("urn:g#", "urn:s#1", "urn:p#c", "12")).toDF()

    for (i <- 1 to iters) {
      mode match {
        case "sparql" =>
          val q = Sparql.parse(
            "PREFIX p: <urn:p#> SELECT ?r WHERE { ?s p:a ?a . ?s p:b ?b . " +
              s"?s p:c ?c . BIND(((?a + ?b) * ?c) / (?b - ?a) AS ?r) }")
          BgpPlanner.evaluate(quads(), q).collect()
        case "frame" =>
          val d = quads()
          val a = d.filter(col("p") === "urn:p#a").select(col("s"), col("o").as("a"))
          val b = d.filter(col("p") === "urn:p#b").select(col("s"), col("o").as("b"))
          val c = d.filter(col("p") === "urn:p#c").select(col("s"), col("o").as("c"))
          a.join(b, "s").join(c, "s")
            .withColumn("r", (col("a").cast("long") + col("b").cast("long"))
              * col("c").cast("long"))
            .collect()
        case "lit" =>
          quads().collect()
        case "strbuiltin" =>
          // the string-builtin fuzzer's worst shape: builtins nested 3
          // deep (each wraps the lexed() CaseWhen), plus the FILTER twin
          val ex = "REPLACE(SUBSTR(CONCAT(UCASE(STRAFTER(?a, \"#\")), " +
            "REPLACE(CONCAT(?b, ?c), \"b+\", \"X\")), 1, 3), \"[cx]\", \"\")"
          val q = Sparql.parse(
            "PREFIX p: <urn:p#> SELECT ?r WHERE { ?s p:a ?a . ?s p:b ?b . " +
              s"?s p:c ?c . BIND($ex AS ?r) }")
          BgpPlanner.evaluate(quads(), q).collect()
          val qf = Sparql.parse(
            "PREFIX p: <urn:p#> SELECT ?s WHERE { ?s p:a ?a . ?s p:b ?b . " +
              s"?s p:c ?c . FILTER(STRLEN($ex) > 2) }")
          BgpPlanner.evaluate(quads(), qf).collect()
        case other => sys.error(s"unknown mode $other")
      }
      if (i % 50 == 0) {
        System.gc(); System.gc()
        val used = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
        println(s"[memprobe] mode=$mode iter=$i live_mb=$used")
      }
    }
  }
}
