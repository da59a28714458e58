package graft.examples

import graft.operators.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew probe for duplicateSpans' hot-gram cap (round 13): the 100×
  * ScaleProbe corpus is boilerplate-FREE, so it can only measure the
  * cap's overhead (the extra count pass), never its point. This probe
  * plants the actual failure shape — one boilerplate header in a
  * majority of documents, the "all rights reserved" crawl reality — and
  * times the exact window path against the capped path on the same
  * corpus. The exact path must funnel majority-of-corpus gram rows into
  * single per-gram window partitions (the straggler); the capped path
  * bounds every window partition at the cap.
  *
  *   sbt "runMain graft.examples.BoilerplateProbe [srcDir] [mult] [sharePct]"
  *
  * Results land in PLANS.md by hand, next to the round-13 probe table.
  */
object BoilerplateProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = if (args.length > 1) args(1).toInt else 10
    val sharePct = if (args.length > 2) args(2).toInt else 60
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // mult re-keyed copies with per-copy token suffixes (the ScaleProbe
    // construction: same duplication rate, not clone clusters), then the
    // boilerplate header prepended to sharePct% of docs — IDENTICAL
    // bytes everywhere, the hot-gram shape
    val boiler = "ALL RIGHTS RESERVED UNAUTHORIZED REPRODUCTION PROHIBITED COPYRIGHT HOLDER 2026 TERMS " // > minLen chars
    val base = spark.read.parquet(s"$src/documents.parquet")
    val docs = (0 until mult).map { c =>
      base.select(
        (col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit(s"c$c")))).as("text"))
    }.reduce(_ union _)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(100)) < sharePct,
          concat(lit(boiler), col("text"))).otherwise(col("text")))
      .localCheckpoint() // materialize once; both paths read the same data

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[boilerprobe] $label%-22s rows=$n%9d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val total = docs.count()
    println(s"[boilerprobe] corpus: $total docs, boilerplate share=$sharePct%, mult=$mult")
    // warm-up: touch the corpus once
    docs.agg(sum(length(col("text")))).collect()
    time("exact (no cap)") {
      TextOps.duplicateSpans(docs, "text", "doc_id", minLen = 40).count()
    }
    time("capped (hotGramCap=1000)") {
      TextOps.duplicateSpans(docs, "text", "doc_id", minLen = 40,
        hotGramCap = 1000L).count()
    }
    spark.stop()
  }
}
