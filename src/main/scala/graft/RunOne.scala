package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: run one named SparkEntry query against a sf dir and print
  * its rows (and optionally the formatted plan). Not part of the driver
  * contract — exists so a single query can be exercised without paying
  * Verify's full 120+-query sweep.
  *
  *   sbt "runMain graft.RunOne q126_bpe_merges /root/testdata/sf0.01 [explain]"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val explain = args.contains("explain")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"no such query: $name; have ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    if (explain) df.explain("formatted")
    df.show(50, truncate = false)
    println(f"rows=${df.count()} elapsed=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
