package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as dataframe fixpoint loops — the companion
  * of `plans.Closure` (reachability) for WEIGHTED propagation. The loop
  * lives on the driver; every iteration is pure declarative Spark (two
  * hash joins + one agg), so Catalyst/AQE re-plan each round and the
  * shuffle key (`src`/`node`) is stable across iterations.
  */
object Graph {

  /** Fixed-iteration PageRank in EXACT integer milli-units.
    *
    * All real arithmetic is replaced by integer fixed-point: scores start
    * at 1000 m (milli-points), each round a node emits
    * `score_m DIV outdeg` along every out-edge, and absorbs
    * `(10000−dampBp)·1000/10000 + dampBp·Σin DIV 10000`. Floor division
    * loses mass deterministically — identical on any engine with integer
    * division, which is what makes the result oracle-able (float PageRank
    * never hash-matches across engines). Convergence behavior is the
    * standard one; `iters` is fixed so the plan is finite and the oracle
    * can mirror it CTE-for-CTE.
    *
    * Scale shape: `edges+outdeg` is computed ONCE and checkpointed; each
    * iteration is one join keyed on `src` (scores are |nodes|-sized, edges
    * dominate) + one map-side-combinable agg keyed on `dst` + one
    * |nodes|-sized left join. Dangling nodes (no out-edges) simply leak
    * their mass — documented standard variant, exact and deterministic.
    *
    * `edges` must be (src, dst) DIRECTED and duplicate-free; pass both
    * directions for an undirected graph. */
  def pageRank(edges: DataFrame, iters: Int, dampBp: Long = 8500L): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters=$iters outside [1, 20]")
    // materialize the edge list ONCE: deg, ew and nodes all fan out from
    // it, and an unmaterialized upstream (e.g. a distinct over a fact
    // scan) would otherwise re-execute per consumer
    // LAZY checkpoints (round 19): same compute-once reuse — the RDD
    // caches at first computation — without three BLOCKING driver jobs
    // before the loop; the materializations overlap inside the first
    // action instead (guide §2.6)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ew = e.join(deg, "src").localCheckpoint(false) // reused every iteration
    val nodes = e.select(col("src").as("node")).distinct().localCheckpoint(false)
    val baseM = (10000L - dampBp) * 1000L / 10000L
    var scores = nodes.withColumn("score_m", lit(1000L))
    for (i <- 0 until iters) {
      val contrib = ew
        .join(scores.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("score_m DIV outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_m"))
      scores = nodes.join(contrib, Seq("node"), "left")
        .na.fill(0L, Seq("in_m"))
        .select(col("node"),
          (lit(baseM) + expr(s"$dampBp * in_m DIV 10000")).as("score_m"))
      // Truncate the iteration lineage every few rounds: without this the
      // final plan nests 2 joins per iteration, and re-analyzing/AQE-
      // re-planning a 40-join tree is its own cost at high `iters`. Every
      // 5th round keeps the plan O(1) deep for the price of one |nodes|-
      // sized materialization.
      if ((i + 1) % 5 == 0 && i + 1 < iters) scores = scores.localCheckpoint()
    }
    scores
  }
}
