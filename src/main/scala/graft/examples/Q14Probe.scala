package graft.examples

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness for the q14_closure bench regression:
  * times q14 in isolation (pass 1 + pass 2), then times it again after
  * running the queries that precede it in the bench's sorted order, to
  * separate query-intrinsic cost from session-state accumulation. */
object Q14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mode = if (args.nonEmpty) args(0) else "isolated"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROBE_MASTER", "local[4]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROBE_SHUF", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    if (mode == "steps") {
      import org.apache.spark.sql.functions._
      val edges = {
        val m = graft.SparkEntry.getClass.getDeclaredMethods
          .find(_.getName == "t").get
        m.setAccessible(true)
        val orders = m.invoke(graft.SparkEntry, spark, sfDir, "orders")
          .asInstanceOf[org.apache.spark.sql.DataFrame]
        val qm = graft.SparkEntry.getClass.getDeclaredMethods
          .find(_.getName == "tpchQuads").get
        qm.setAccessible(true)
        val quads = qm.invoke(graft.SparkEntry, spark, sfDir, "x", "x")
          .asInstanceOf[org.apache.spark.sql.DataFrame]
        orders.select(concat(lit("urn:o#"), col("o_orderkey")).as("src"),
            concat(lit("urn:c#"), col("o_custkey")).as("dst"))
          .union(quads.select(col("s").as("src"), col("o").as("dst")))
      }
      time("edges.count") { edges.count() }
      var e: org.apache.spark.sql.DataFrame = null
      time("distinct+ckpt") {
        e = edges.select(col("src").cast("string"), col("dst").cast("string"))
          .distinct().localCheckpoint()
        e.count()
      }
      var ej: org.apache.spark.sql.DataFrame = null
      var seen: org.apache.spark.sql.DataFrame = null
      time("repart ckpts") {
        ej = e.repartition(col("src")).localCheckpoint()
        seen = e.repartition(col("src"), col("dst")).localCheckpoint()
      }
      var frontier = seen
      var iter = 0
      var growing = true
      while (growing && iter < 8) {
        iter += 1
        time(s"round $iter") {
          val step = frontier.as("f")
            .join(ej.as("e"), col("f.dst") === col("e.src"))
            .select(col("f.src").as("src"), col("e.dst").as("dst"))
            .distinct()
          val fresh = step.join(seen, Seq("src", "dst"), "left_anti").localCheckpoint()
          if (fresh.isEmpty) growing = false
          else {
            seen = seen.union(fresh).repartition(col("src"), col("dst")).localCheckpoint()
            frontier = fresh
          }
        }
      }
      time("final count") { seen.count() }
      spark.stop(); return
    }
    if (mode == "after") {
      // run everything before q14 in sorted order, one pass, like the bench
      val before = graft.SparkEntry.queries.toSeq.sortBy(_._1)
        .takeWhile(_._1 != "q14_closure")
      time("preamble") {
        before.foreach { case (_, fn) =>
          fn(spark, sfDir).count(); fn(spark, sfDir).count()
        }
      }
    }
    time("q14 pass1") { graft.SparkEntry.queries("q14_closure")(spark, sfDir).count() }
    time("q14 pass2") { graft.SparkEntry.queries("q14_closure")(spark, sfDir).count() }
    val sc = spark.sparkContext
    val rddCount = sc.getPersistentRDDs.size
    val mem = sc.getExecutorMemoryStatus.values.map(v => v._1 - v._2).sum / 1e6
    println(s"PROBE persistentRDDs=$rddCount memUsedMB=$mem")
    spark.stop()
  }
}
