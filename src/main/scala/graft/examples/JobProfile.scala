package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Per-job wall profile of one SparkEntry query: runs the query
  * (construction + count), recording every Spark job's duration and
  * the gaps between jobs (driver-side work: planning, metadata,
  * non-Spark I/O). Separates "many tiny sequential jobs" overhead from
  * real cluster compute — the measure-first step of the optimization
  * guide applied to an overhead-bound local bench.
  *
  * Usage: runMain graft.examples.JobProfile <query> [passes]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object JobProfile {
  final case class JobRow(id: Int, desc: String, start: Long, end: Long,
    tasks: Int, stages: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = args.headOption.getOrElse("q193_takedown_pipeline")
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm tables like Bench does
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { n =>
      try spark.read.parquet(s"$sfDir/$n.parquet").count()
      catch { case _: Throwable => () }
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int, Int)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?") + " | " +
          js.stageInfos.map(_.name.takeWhile(_ != '(')).distinct.mkString(",")
        starts.put(js.jobId, (js.time, desc,
          js.stageInfos.map(_.numTasks).sum, js.stageIds.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc, tasks, stages) =
          starts.getOrDefault(je.jobId, (je.time, "?", 0, 0))
        jobs.put(je.jobId, JobRow(je.jobId, desc, t0, je.time, tasks, stages))
      }
    }
    val fn = graft.SparkEntry.queries(name)
    (1 to passes).foreach { p =>
      jobs.clear(); starts.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tCons = System.nanoTime()
      val n = df.count()
      val t1 = System.nanoTime()
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val rows = jobs.values.asScala.toSeq.sortBy(_.start)
      val total = (t1 - t0) / 1e9
      val cons = (tCons - t0) / 1e9
      val jobWall = rows.map(r => (r.end - r.start) / 1e3).sum
      println(f"[profile] $name pass=$p rows=$n total=$total%.2f s " +
        f"(construction=$cons%.2f s, action=${total - cons}%.2f s) " +
        f"jobs=${rows.size} jobWallSum=$jobWall%.2f s")
      if (p == passes) {
        var prevEnd = 0L
        rows.foreach { r =>
          val gap = if (prevEnd == 0) 0.0 else (r.start - prevEnd) / 1e3
          prevEnd = math.max(prevEnd, r.end)
          println(f"  job ${r.id}%3d ${(r.end - r.start) / 1e3}%7.3f s gapBefore=$gap%7.3f s stages=${r.stages}%2d tasks=${r.tasks}%4d  ${r.desc.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
