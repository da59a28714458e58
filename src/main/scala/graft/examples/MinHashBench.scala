package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench isolating MinHash SIGNATURE construction cost: the
  * explode→min-agg shape vs the fused per-row kernel, and the full
  * candidate pipelines on top of each. Prints per-pass wall seconds. */
object MinHashBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def time(name: String)(f: => Long): Unit = (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val out = f
      println(f"[mhbench] $name round=$r out=$out time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("sig_explode") {
      graft.operators.Dedup.minhashSignatures(docs, "text", "doc_id", 64, 3)
        .agg(expr("bit_xor(element_at(sig, 1))")).collect().head.getLong(0)
    }
    time("sig_fused") {
      graft.operators.Dedup.minhashSignaturesFused(docs, "text", "doc_id", 64, 3)
        .agg(expr("bit_xor(element_at(sig, 1))")).collect().head.getLong(0)
    }
    time("bands_fused") {
      import org.apache.spark.sql.graftbridge.Bridge
      docs.select(col("doc_id").as("id"),
          Bridge.column(graft.functions.MinHashBandKeys(
            Bridge.expression(graft.operators.TextOps.tokens(col("text"))),
            64, 3, 16)).as("bk"))
        .select(col("id"), posexplode(col("bk")).as(Seq("band", "key")))
        .agg(expr("bit_xor(key)")).collect().head.getLong(0)
    }
    time("cand_explode") {
      graft.operators.Dedup.minhashCandidates(docs, "text", "doc_id", 64, 16).count()
    }
    time("cand_fused") {
      graft.operators.Dedup.minhashCandidates(docs, "text", "doc_id", 64, 16,
        fused = true).count()
    }
    spark.stop()
  }
}
