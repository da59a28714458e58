package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive input fan-out for compute-dense derivations
  * (optimization round 18, guide §2.5 "input skew: one huge unsplittable
  * file … repartition immediately after the read", applied to the
  * bytes-vs-compute mismatch).
  *
  * Spark sizes scan partitions by BYTES (`maxPartitionBytes`, floored by
  * `openCostInBytes`), but gram explodes, vector-distance kernels, media
  * decoders and hash signatures multiply WORK per input row by 10²–10⁴.
  * A small input file — anything under `openCostInBytes`, like a daily
  * embedding batch or a bench-scale corpus — scans as ONE partition, and
  * the whole dense derivation runs on one core while the rest of the
  * cluster idles (measured on the round-18 baseline: duplicateSpans
  * 2.7 s → 1.6 s, the capped variant 8.5 s → 3.0 s, pqTopK 2.8 s → 1.0 s
  * at local[32] from this change alone).
  *
  * [[fanOutSmall]] spreads the input round-robin over the session's
  * default parallelism when its optimizer-estimated size is small enough
  * that the scan cannot have split it meaningfully; big inputs pass
  * through untouched, so at production scale this is the identity and no
  * plan changes. The estimate is the same plan-stats signal
  * [[DedupIndex.probeHint]] already keys broadcasts on (no Spark job).
  * Round-robin repartition is deterministic under retries
  * (`spark.sql.execution.sortBeforeRepartition`, on by default) and every
  * consumer below it is order-insensitive (aggregates/joins), so results
  * are byte-identical.
  */
private[graft] object FanOut {
  /** Bytes below which an input is considered "scan could not have
    * spread this": `cores × openCostInBytes(4 MB)`, capped at 1 GiB so a
    * large cluster never reshuffles a big relation just to round up its
    * partition count. */
  private def thresholdBytes(cores: Int): Long =
    math.min(cores.toLong * (4L << 20), 1L << 30)

  /** Run independent Spark ACTIONS (writes, materializations) from
    * parallel driver threads (guide §2.6 "overlap independent jobs"):
    * Spark's scheduler happily runs several jobs at once; sequential
    * driver code is the only reason small independent writes serialize.
    * Rethrows the first failure after all threads finish. */
  private[graft] def inParallel(units: (() => Unit)*): Unit = {
    if (units.sizeIs <= 1) { units.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(units.size)
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.DurationInt
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val fs = units.map(u => Future(u()))
      fs.foreach(f => Await.result(f, 600.seconds))
    } finally pool.shutdown()
  }

  private[graft] def fanOutSmall(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    if (target <= 1) return df
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(thresholdBytes(target))) df.repartition(target) else df
  }
}
