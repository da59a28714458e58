package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for flagship_ingest's commit cost: 1500 uuid dirs at sf0.1
  * make the v1 FileOutputCommitter's driver-side sequential job-commit
  * merge the suspected wall. Times count, the current write, and the
  * same write under committer algorithm v2 (task-side parallel commit). */
object IngestCommitProbe {
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
    val e = graft.Tables.events(spark, sfDir)
    val fact = e.select(col("ts").as("time"), col("value"),
      col("event_type").as("label"),
      concat(lit("urn:bench/"), col("event_type")).as("uri"),
      lit("bench").as("collection"),
      format_string("00000000-0000-0000-0000-%012d", col("user_id")).as("uuid"))
    def t(name: String)(f: => Unit): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[ingest] $name pass=$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("count") { fact.count() }
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_ingestprobe"
    t("write v1") {
      fact.repartition(col("collection"), col("uuid"))
        .sortWithinPartitions("uuid", "time")
        .write.mode("overwrite").partitionBy("collection", "uuid")
        .parquet(s"$root/v1")
    }
    t("write v2") {
      fact.repartition(col("collection"), col("uuid"))
        .sortWithinPartitions("uuid", "time")
        .write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .partitionBy("collection", "uuid")
        .parquet(s"$root/v2")
    }
    t("write nosort v1") {
      fact.repartition(col("collection"), col("uuid"))
        .write.mode("overwrite").partitionBy("collection", "uuid")
        .parquet(s"$root/v3")
    }
    // where does v1 time go? shuffle+sort only, no files:
    t("write 256tasks v1") {
      fact.repartition(256, col("collection"), col("uuid"))
        .sortWithinPartitions("uuid", "time")
        .write.mode("overwrite").partitionBy("collection", "uuid")
        .parquet(s"$root/v6")
    }
    t("write 128tasks v1") {
      fact.repartition(128, col("collection"), col("uuid"))
        .sortWithinPartitions("uuid", "time")
        .write.mode("overwrite").partitionBy("collection", "uuid")
        .parquet(s"$root/v4")
    }
    t("write nocompress") {
      fact.repartition(col("collection"), col("uuid"))
        .sortWithinPartitions("uuid", "time")
        .write.mode("overwrite").option("compression", "none")
        .partitionBy("collection", "uuid")
        .parquet(s"$root/v5")
    }
    t("shuffle+sort noop") {
      fact.repartition(col("collection"), col("uuid"))
        .sortWithinPartitions("uuid", "time")
        .write.format("noop").mode("overwrite").save()
    }
    // round 19: where do the ~143 ms/file go? candidate levers:
    // small row-group/page buffers (writer init allocation), dictionary
    // off, and the Hadoop LocalFS checksum layer (.crc sidecar per file)
    t("write 128tasks blocksize1m") {
      fact.repartition(128, col("collection"), col("uuid"))
        .sortWithinPartitions("uuid", "time")
        .write.mode("overwrite")
        .option("parquet.block.size", (1L << 20).toString)
        .option("parquet.page.size", (64 << 10).toString)
        .partitionBy("collection", "uuid")
        .parquet(s"$root/v7")
    }
    t("write 128tasks nodict") {
      fact.repartition(128, col("collection"), col("uuid"))
        .sortWithinPartitions("uuid", "time")
        .write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")
        .partitionBy("collection", "uuid")
        .parquet(s"$root/v8")
    }
    t("write 512tasks v1") {
      fact.repartition(512, col("collection"), col("uuid"))
        .sortWithinPartitions("uuid", "time")
        .write.mode("overwrite").partitionBy("collection", "uuid")
        .parquet(s"$root/v9")
    }
    locally {
      val hc = spark.sparkContext.hadoopConfiguration
      val prev = hc.get("fs.file.impl")
      hc.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      hc.setBoolean("fs.file.impl.disable.cache", true)
      try t("write 128tasks rawfs") {
        fact.repartition(128, col("collection"), col("uuid"))
          .sortWithinPartitions("uuid", "time")
          .write.mode("overwrite").partitionBy("collection", "uuid")
          .parquet(s"$root/v10")
      } finally {
        if (prev == null) hc.unset("fs.file.impl") else hc.set("fs.file.impl", prev)
        hc.setBoolean("fs.file.impl.disable.cache", false)
      }
    }
    spark.stop()
  }
}
