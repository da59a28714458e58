package graft.examples

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Subset of [[graft.Verify]] for fast local iteration: dump only the
  * named queries (comma-separated in args(2)) plus the full
  * oracle_sql.json, then run tools/local_verify.py on the outDir.
  * Usage: runMain graft.examples.VerifyOne <sfDir> <outDir> q111,q112
  * (names may be prefixes — q111 matches q111_stats_pruned_scan).
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries
      .filter { case (name, _) => wanted.exists(name.startsWith) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        println(f"[verify-one] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
