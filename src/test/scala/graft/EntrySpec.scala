package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows on sf0.001 and every
  * declared query has matching column sets between Spark and oracle keys. */
class EntrySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("entry flagship returns rows (driver smoke gate)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys == queries keys (every query is DuckDB-oracled)") {
    // EVERY query carries a DuckDB oracle as of round 9 — queries whose
    // computation has no SQL form pin their deterministic result as a
    // literal VALUES oracle instead (q126: merge table from an
    // independent non-Spark Sennrich implementation). A new query without
    // an oracle is a regression: it must not silently downgrade to
    // rows-only.
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      s"unoracled: ${(SparkEntry.queries.keySet --
        SparkEntry.oracleSql.keySet).toSeq.sorted}" +
        s"; orphaned: ${(SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).toSeq.sorted}")
  }

  test("every query runs at sf0.001 and is deterministic across two runs") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, "/root/testdata/sf0.001")
      val b = fn(spark, "/root/testdata/sf0.001")
      val ca = a.count(); val cb = b.count()
      assert(ca == cb, s"$name row count unstable: $ca vs $cb")
    }
  }
}
