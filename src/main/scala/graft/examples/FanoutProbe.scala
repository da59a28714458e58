package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the round-18 scan-fan-out hypothesis: tiny single-file
  * scans make kernel/explode-dense map stages run in ONE task. Times
  * duplicateSpans and pqEncode-shaped work with and without an explicit
  * post-scan repartition to the core count. */
object FanoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{TextOps, Similarity}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    docs.count(); emb.count()
    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[fanout] $name pass=$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    println(s"[fanout] docs partitions=${docs.rdd.getNumPartitions} emb partitions=${emb.rdd.getNumPartitions}")
    time("spans base") {
      noop(TextOps.duplicateSpans(docs, "text", "doc_id", minLen = 40))
    }
    time("spans fanout") {
      noop(TextOps.duplicateSpans(docs.repartition(cpus.toInt), "text", "doc_id", minLen = 40))
    }
    time("spans capped base") {
      noop(TextOps.duplicateSpans(docs, "text", "doc_id", minLen = 40, hotGramCap = 50L))
    }
    time("spans capped fanout") {
      noop(TextOps.duplicateSpans(docs.repartition(cpus.toInt), "text", "doc_id", minLen = 40, hotGramCap = 50L))
    }
    val cb = Similarity.pqCodebook(emb, m = 8)
    time("pq base") {
      noop(Similarity.pqTopKWith(emb, emb.limit(8), cb, m = 8, dim = 64, k = 5))
    }
    time("pq fanout") {
      noop(Similarity.pqTopKWith(emb.repartition(cpus.toInt), emb.limit(8), cb, m = 8, dim = 64, k = 5))
    }
    spark.stop()
  }
}
