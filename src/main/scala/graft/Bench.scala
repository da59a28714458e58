package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 3 passes, median-of-3 (round 10): with 2 passes a single contended
    // pass IS the reported number for every query it touches — the
    // round-9 driver run diverged 47% from a same-HEAD sibling run that
    // way. Median-of-3 tolerates one bad pass per query outright.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session once (JVM/codegen/parquet-footer costs are not
    // engine steady-state): touch every table + one tiny query.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { n =>
      try spark.read.parquet(s"$sfDir/$n.parquet").count()
      catch { case _: Throwable => () }
    }
    // Deterministic execution order (a Map reshuffles iteration order
    // whenever an entry is added, silently moving residual warm-up cost
    // onto different queries round-over-round) + median over `passes`
    // timed runs per query so one JIT/GC hiccup can't masquerade as a
    // regression. Flagship flow appended after the driver-table queries.
    val allEntries: Seq[(String, SparkSession => Long)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> ((s: SparkSession) => fn(s, sfDir).count())
      } ++ Flagship.benchEntries(spark, sfDir)
    // Optional local-iteration filter: `runMain graft.Bench q42,q94` times
    // only queries whose name starts with a listed prefix. The driver
    // invokes with no args → full suite, unchanged.
    val all =
      if (args.isEmpty) allEntries
      else {
        val wanted = args.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
        allEntries.filter { case (n, _) => wanted.exists(n.startsWith) }
      }
    // A query that throws must NOT be recorded as a fast success (that would
    // flatter the headline total): record the error message per query and a
    // nonzero `errors` count in the summary line instead.
    val errs = scala.collection.mutable.LinkedHashMap[String, String]()
    // GC wall time across all collectors, in seconds. The per-pass GC delta
    // distinguishes "this query allocates/collects heavily" from "the host
    // was contended during this pass" — the recurring cross-round bench
    // ghost (rounds 3/6/7: 3-11x on untouched code, never reproducible)
    // needs the artifact itself to carry that evidence.
    def gcSec(): Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum / 1e3
    }
    // Host-contention evidence (round 10): system load average and this
    // JVM's own CPU seconds, recorded per pass. cpu_frac = JVM CPU s /
    // wall s is the discriminator — a real regression keeps the JVM busy
    // (cpu_frac near its usual level for that query), while external
    // contention starves it (wall inflates, cpu_frac collapses, system
    // load exceeds the core count). `load` is -1 where the platform
    // doesn't report it.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def sysLoad(): Double = osBean.getSystemLoadAverage
    def procCpuSec(): Double = osBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        math.max(0L, b.getProcessCpuTime) / 1e9
      case _ => -1.0
    }
    final case class PassStats(wall: Seq[Double], gc: Seq[Double],
      cpuFrac: Seq[Double], load: Seq[Double])
    val results: Seq[(String, PassStats)] = all.map { case (name, fn) =>
      val timed = (1 to math.max(1, passes)).map { _ =>
        val g0 = gcSec()
        val c0 = procCpuSec()
        val t0 = System.nanoTime()
        try { fn(spark) } catch {
          case e: Throwable =>
            errs(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = if (c0 < 0) -1.0 else (procCpuSec() - c0) / math.max(wall, 1e-9)
        (wall, gcSec() - g0, cpu, sysLoad())
      }
      name -> PassStats(timed.map(_._1), timed.map(_._2),
        timed.map(_._3), timed.map(_._4))
    }
    // The summary consumer keeps only the last ~2000 chars of output; a
    // 70-entry map at full double precision overflows that and truncates the
    // line mid-JSON. Compact: qNN-prefix keys (unique by construction) and
    // millisecond precision keep the whole line comfortably under the cap.
    def shortKey(name: String): String =
      if (name.matches("q\\d+_.*")) name.takeWhile(_ != '_') else name
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and a
    // comma-decimal locale would render 93.5 as "93,500" — invalid JSON
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def arr(vs: Seq[Double]): String = vs.map(fmt).mkString("[", ",", "]")
    // lower median: for the default 3 passes this is the true median, so
    // one contended/JIT-warm-up pass per query never reaches the headline;
    // for 2 passes it reports the steady-state (second) run
    def med(vs: Seq[Double]): Double = {
      val s = vs.sorted; s((s.length - 1) / 2)
    }
    // centisecond precision in the medians map: 10 ms resolution is noise-
    // level for these 0.1-16 s queries and buys ~100 chars of line-cap
    // margin; full-precision per-pass numbers live in the sidecar.
    def fmt2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, st) => "\"" + shortKey(k) + "\":" + fmt2(med(st.wall)) }
      .mkString("{", ",", "}")
    // Full per-pass evidence (every pass's wall time + GC delta + JVM CPU
    // fraction + system load per query) goes to a sidecar file — it does
    // not fit the consumer's line cap.
    // The summary line carries (a) the sidecar path, (b) per-pass TOTALS,
    // (c) total GC delta, and (d) the per-pass times of the worst
    // spread-outlier queries, so a contended run is self-evident from the
    // line alone: contention inflates one pass of many queries at once
    // (large spreads, asymmetric pass totals), a real regression inflates
    // every pass of the touched queries.
    val detailPath = new java.io.File("bench_detail.json").getAbsolutePath
    val detail = results.map { case (k, st) =>
      "\"" + k + "\":{\"passes\":" + arr(st.wall) + ",\"gc\":" + arr(st.gc) +
        ",\"cpu_frac\":" + arr(st.cpuFrac) + ",\"load\":" + arr(st.load) + "}"
    }.mkString("{\"sf\":\"" + sfDir + "\",\"cpus\":" + cpus +
      ",\"queries\":{", ",", "}}")
    try {
      val w = new java.io.PrintWriter(detailPath, "UTF-8")
      try w.println(detail) finally w.close()
    } catch { case _: Throwable => () } // bench output must not die on I/O
    val passTotals = (0 until math.max(1, passes)).map { i =>
      results.map(_._2.wall.lift(i).getOrElse(0.0)).sum
    }
    // wall-weighted mean CPU fraction + mean system load per pass: the
    // one-line contention verdict (cpu_frac well below its norm + load
    // above `cpus` = the host was busy, not the code)
    val cpuFracByPass = (0 until math.max(1, passes)).map { i =>
      val ws = results.map { case (_, st) =>
        (st.wall.lift(i).getOrElse(0.0), st.cpuFrac.lift(i).getOrElse(-1.0))
      }.filter(_._2 >= 0)
      val tw = ws.map(_._1).sum
      if (tw <= 0) -1.0 else ws.map { case (w, c) => w * c }.sum / tw
    }
    val loadByPass = (0 until math.max(1, passes)).map { i =>
      val ls = results.map(_._2.load.lift(i).getOrElse(-1.0)).filter(_ >= 0)
      if (ls.isEmpty) -1.0 else ls.sum / ls.size
    }
    val gcTotal = results.map(_._2.gc.sum).sum
    val spread = results
      .map { case (k, st) => (k, st.wall) }
      .filter { case (_, ts) => ts.max - ts.min > 0.25 && ts.max / math.max(ts.min, 1e-9) > 1.5 }
      .sortBy { case (_, ts) => -(ts.max - ts.min) }
      .take(8)
      .map { case (k, ts) => "\"" + shortKey(k) + "\":" + arr(ts) }
      .mkString("{", ",", "}")
    val errJson = errs.take(5).map { case (k, v) =>
      "\"" + shortKey(k) + "\":\"" + v.take(60) + "\""
    }.mkString("{", ",", "}")
    val total = results.map { case (_, st) => med(st.wall) }.sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"pass_totals":${arr(passTotals)},"cpu_frac":${arr(cpuFracByPass)},"sys_load":${arr(loadByPass)},"gc_sec":${fmt(gcTotal)},"spread":$spread,"detail":"bench_detail.json","errors":${errs.size},"errs":$errJson,"sf":"$sfDir"}"""
    spark.stop()
    println(line)
  }
}
