package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Stage-level timing probe for q52_semdedup (round-7 perf diagnosis).
  * Times the deterministic k-means, the centroid assignment, and the
  * within-cluster self-join separately so the 7.4 s bench entry can be
  * attributed before optimizing. */
object Q52Probe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count() // warm
    (1 to 2).foreach { pass =>
      println(s"pass $pass")
      val base = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val planted = base.filter(col("vec_id") % 17 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + (i % 7 - 3).cast("double") * lit(0.02))).as("embedding"))
      val full = t("total") {
        val cents = t("kmeansCentroids") {
          val c = Similarity.kmeansCentroids(base, dim = 64, centroidMod = 37, iters = 2)
          c.count(); c
        }
        t("semanticDedup+count") {
          Dedup.semanticDedup(base.unionByName(planted), cents, "embedding",
            "vec_id", threshold = 0.95).count()
        }
      }
      println(s"  rows=$full")
    }
    spark.stop()
  }
}
