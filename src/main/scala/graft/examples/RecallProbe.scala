package graft.examples

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off IVF quality report: recall@5 of the IVF path (k-means
  * quantizer, nProbe lists) against the exact brute-force top-5, at the
  * bench scale factor. Justifies the centroidMod/nProbe defaults with a
  * number (logged in PLANS.md). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nQueries = if (args.nonEmpty) args(0).toInt else 100
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < nQueries)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select(col("qid"), col("nid"))
    for (nProbe <- Seq(1, 2, 4, 8, 16)) {
      val cents = Similarity.kmeansCentroids(emb, dim = 64, centroidMod = 37, iters = 2)
      val ivf = Similarity.ivfTopKWith(emb, queries, cents, k = 5, nProbe = nProbe)
        .select(col("qid"), col("nid"))
      val hit = ivf.join(exact, Seq("qid", "nid"), "left_semi").count()
      val total = exact.count()
      println(f"RECALL nProbe=$nProbe recall@5 = $hit/$total = ${hit.toDouble / total}%.3f")
    }
    spark.stop()
  }
}
