package graft.examples

import org.apache.spark.sql.SparkSession

/** Phase timing for the flagship_ingest bench entry: source read, the
  * repartition+sort+write, and the read-back count. */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROBE_MASTER", "local[32]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROBE_SHUF", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    time("source count")(println("rows=" + raw.count()))
    time("distinct uuids")(println("uuids=" +
      raw.select("user_id").distinct().count()))
    val root = s"${System.getProperty("java.io.tmpdir")}/ingest_probe_${java.util.UUID.randomUUID()}"
    time("ingest (shuffle+sort+write)") {
      graft.Flagship.ingest(spark, sfDir, s"$root/a") // source count + pruned spot-check
    }
    time("ingest 2nd (warm)") {
      graft.Flagship.ingest(spark, sfDir, s"$root/b")
    }
    spark.conf.set("spark.sql.parquet.compression.codec", "none")
    time("ingest uncompressed") {
      graft.Flagship.ingest(spark, sfDir, s"$root/c")
    }
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    time("ingest 128 shuffle parts") {
      graft.Flagship.ingest(spark, sfDir, s"$root/d")
    }
    val readBack = time("read-back count only")(
      spark.read.parquet(s"$root/a").count())
    println(s"readback=$readBack")
    val files = new java.io.File(s"$root/a").listFiles()
    println("top-level dirs=" + files.length)
    spark.stop()
  }
}
