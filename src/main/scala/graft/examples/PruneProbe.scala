package graft.examples

import graft.sources.StatsIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}

/** The 10× pruning proof (SURVEY.md §2 S5 stretch): demonstrates that the
  * stats-table planning path keeps query cost O(matching fragments) while
  * the naive path's LISTING cost grows with the store.
  *
  * The reference consolidates footers into `_metadata` precisely so clients
  * never list the store to plan a scan (reference: make-metadata.py:8-22,
  * README.md:56). Spark's default hive-discovery read
  * (`spark.read.parquet(root)`) lists EVERY partition directory at
  * DataFrame-creation time — fine locally, O(store) round-trips on an
  * object store. `StatsIndex.prunedScan` answers the same query from the
  * stats table alone and opens exactly the matching fragment files.
  *
  * Method: build a base store from the events table (one dir per stream,
  * ~3 time-disjoint files each), then replicate every stream directory 9×
  * under fresh uuids via hard links — parquet part files do not embed the
  * hive partition column, so a re-linked `uuid=<new>` dir IS a distinct
  * valid stream — and compare, at 1× and 10×:
  *   - files on disk (what naive discovery must list),
  *   - naive `read.parquet(root)` creation time (the listing+infer cost),
  *   - naive filtered-agg wall time vs `prunedScan` agg wall time,
  *   - files each path actually opened, and row-count parity.
  */
object PruneProbe {

  private def uuidOf(uid: Long): String = f"00000000-0000-0000-0000-$uid%012d"

  private def countFiles(root: String): Long = {
    val s = Files.walk(Paths.get(root))
    try s.filter(p => p.toString.endsWith(".parquet")).count()
    finally s.close()
  }

  /** Hard-link every `uuid=` dir `copies` times under shifted uuids. */
  private def replicate(root: String, nStreams: Long, copies: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val coll = Paths.get(root, "collection=bench")
    // materialize BEFORE linking — a live stream would re-visit the dirs
    // this loop creates
    val srcDirs = { val s = Files.list(coll)
      try s.iterator().asScala.toList finally s.close() }
      .filter(_.getFileName.toString.startsWith("uuid="))
    srcDirs.foreach { d =>
      val uid = d.getFileName.toString.stripPrefix("uuid=")
        .takeRight(12).toLong
      (1 to copies).foreach { k =>
        val dst = coll.resolve(s"uuid=${uuidOf(uid + k * nStreams)}")
        Files.createDirectories(dst)
        val parts = { val s = Files.list(d)
          try s.iterator().asScala.toList finally s.close() }
        parts.filter(_.toString.endsWith(".parquet")).foreach { f =>
          Files.createLink(dst.resolve(f.getFileName), f)
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val root = s"${System.getProperty("java.io.tmpdir")}/graft_pruneprobe_${java.util.UUID.randomUUID()}"
    val e = graft.Tables.events(spark, sfDir)
    val fact = e.select(col("ts").as("time"), col("value"),
      col("event_type").as("label"), lit("bench").as("collection"),
      format_string("00000000-0000-0000-0000-%012d", col("user_id")).as("uuid"))
    fact.repartition(col("uuid")).sortWithinPartitions("uuid", "time")
      .write.mode("overwrite").partitionBy("collection", "uuid")
      .option("maxRecordsPerFile", 30).parquet(root)

    val nStreams = e.select("user_id").distinct().count()
    // the query: ~2% of ORIGINAL streams + a 1/3 time window — the same
    // matching set at both scales, as when a store grows around a query
    val uuids = e.select("user_id").distinct()
      .filter(pmod(col("user_id"), lit(50)) === 0)
      .collect().map(r => uuidOf(r.getLong(0))).toSeq
    val start = "2024-01-10T00:00:00Z"; val end = "2024-01-20T00:00:00Z"

    def measure(tag: String): Unit = {
      val statsPath = s"$root-stats-$tag"
      val t0 = System.nanoTime()
      val stats = StatsIndex.build(spark, root, statsPath).cache()
      stats.count()
      val tStats = (System.nanoTime() - t0) / 1e9

      // naive path: discovery (listing + schema infer) then pruned agg
      val t1 = System.nanoTime()
      val naiveDf = spark.read.parquet(root)
      val tList = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val naive = naiveDf.filter(col("uuid").isin(uuids: _*) &&
          col("time") >= lit(start).cast("timestamp") &&
          col("time") <= lit(end).cast("timestamp"))
        .agg(count(lit(1)), sum("value")).collect()(0)
      val tNaive = (System.nanoTime() - t2) / 1e9
      val naiveFiles = naiveDf.filter(col("uuid").isin(uuids: _*) &&
          col("time") >= lit(start).cast("timestamp") &&
          col("time") <= lit(end).cast("timestamp"))
        .select(input_file_name()).distinct().count()

      // stats path: file list from the stats table, no store listing
      val t3 = System.nanoTime()
      val files = StatsIndex.prunedFiles(stats, uuids, start, end)
      val pruned = StatsIndex.prunedScan(spark, stats, root, uuids, start, end)
        .agg(count(lit(1)), sum("value")).collect()(0)
      val tPruned = (System.nanoTime() - t3) / 1e9

      require(pruned.getLong(0) == naive.getLong(0),
        s"parity: pruned=${pruned.getLong(0)} naive=${naive.getLong(0)}")
      println(f"[pruneprobe] $tag files_on_disk=${countFiles(root)} " +
        f"stats_build_s=$tStats%.2f naive_listing_s=$tList%.2f " +
        f"naive_query_s=$tNaive%.2f naive_files_read=$naiveFiles " +
        f"pruned_query_s=$tPruned%.2f pruned_files_read=${files.size} " +
        f"rows=${naive.getLong(0)}")
      stats.unpersist()
    }

    measure("base")
    replicate(root, nStreams, 9)
    measure("x10")
    spark.stop()
  }
}
