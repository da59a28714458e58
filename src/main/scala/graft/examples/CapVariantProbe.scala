package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe (optimization round 18): can the capped duplicate-span
  * detector's dup-key decision get cheaper by counting 8-byte xxhash64
  * keys first (narrower shuffle, guide §2.3) and verifying exactly over
  * the candidate subset, now that the explode passes are fanned out?
  * Compares hit-set derivation time; results must be identical sets. */
object CapVariantProbe {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val L = 40
    def grams = docs.repartition(cpus.toInt)
      .filter(length(col("text")) >= L)
      .select(col("doc_id").as("id"),
        explode(sequence(lit(1L),
          (length(col("text")) - L + 1).cast("long"))).as("pos"),
        col("text").as("t"))
      .select(col("id"), col("pos"), col("t").substr(col("pos"), lit(L)).as("g"))
    def t(name: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[cap] $name pass=$i n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("current: agg(g) + join(g)") {
      val dupKeys = grams.groupBy(col("g")).agg(count(lit(1)).as("_c"))
        .filter(col("_c") >= 2).select(col("g"))
      grams.join(dupKeys, Seq("g")).select(col("id"), col("pos")).count()
    }
    t("hash-first: agg(h) + semijoin(h) + checkpoint + exact over cands") {
      val hot = grams.select(xxhash64(col("g")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("_c"))
        .filter(col("_c") >= 2).select(col("h"))
      val cand = grams.withColumn("h", xxhash64(col("g")))
        .join(hot, Seq("h"), "leftsemi")
        .localCheckpoint()
      val dupKeys = cand.groupBy(col("g")).agg(count(lit(1)).as("_c"))
        .filter(col("_c") >= 2).select(col("g"))
      cand.join(dupKeys, Seq("g")).select(col("id"), col("pos")).count()
    }
    spark.stop()
  }
}
