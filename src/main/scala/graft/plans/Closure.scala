package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transitive closure of an edge relation — the engine for SPARQL
  * zero-or-more property paths (`rdfs:subClassOf*`), which the reference
  * delegates to oxigraph (reference: mortar-parquet-client/client.py:121,
  * 134,136).
  *
  * Two execution strategies, chosen by edge count:
  *
  *   - Small relation (ontology hierarchies — Brick is ≤ a few 10⁴ edges):
  *     collect to the driver, run an exact BFS closure in Scala, return a
  *     (broadcastable) DataFrame. One job, no iterative shuffles.
  *   - Large relation: distributed semi-naive fixpoint — each iteration
  *     joins the frontier with the edge set, unions, distincts, and
  *     `localCheckpoint`s to sever the growing lineage. AQE handles the
  *     shrinking frontier. Iterations = graph diameter (Brick ≤ ~10).
  *
  * Both return the REFLEXIVE-transitive closure when `includeIdentity` nodes
  * are supplied: SPARQL `p*` includes the zero-length path, so every term in
  * the queried position matches itself (SURVEY.md §7.4 pitfall #2).
  */
object Closure {

  val DriverSideLimit = 200000L

  /** Hard cap on CLOSURE rows the driver-side strategy may materialize.
    * Edge count alone is the wrong cutover variable: a 200k-edge chain
    * graph has an O(V²) closure that would OOM the driver even though the
    * edge relation is tiny. The BFS below counts its output as it goes and
    * abandons the driver path the moment it exceeds this, falling back to
    * the distributed fixpoint (which never materializes the closure in one
    * JVM). */
  val ClosureRowLimit = 2000000L

  /** Closure of `edges` (columns `src`, `dst`). Output columns `src`,`dst`,
    * distinct. Does NOT include zero-length pairs — see `withIdentity`.
    * `driverSideLimit` tunes the strategy cutover (0 forces the
    * distributed fixpoint); `closureRowLimit` bounds the driver-side
    * RESULT size, the variable that actually OOMs the driver. */
  def transitive(edges: DataFrame, maxIter: Int = 50,
      driverSideLimit: Long = DriverSideLimit,
      closureRowLimit: Long = ClosureRowLimit): DataFrame = {
    val spark = edges.sparkSession
    // materialize ONCE: the strategy-choice count, the BFS collect or every
    // fixpoint round all reuse `e` — without the checkpoint each reuse
    // would re-derive the whole upstream plan (scans included)
    val e = edges.select(col("src").cast("string"), col("dst").cast("string"))
      .distinct().localCheckpoint()
    val edgeCount = e.count()
    if (edgeCount == 0) e
    else if (edgeCount <= driverSideLimit)
      driverSide(spark, e, closureRowLimit).getOrElse(distributed(e, maxIter))
    else distributed(e, maxIter)
  }

  /** Exact BFS closure on the driver; None if the closure grows past
    * `rowLimit` (caller falls back to the distributed fixpoint). */
  private def driverSide(
      spark: SparkSession, e: DataFrame, rowLimit: Long): Option[DataFrame] = {
    import spark.implicits._
    val adj = e.as[(String, String)].collect()
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).toSet) }
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (start <- adj.keys) {
      val seen = scala.collection.mutable.Set[String]()
      var frontier = adj(start)
      while (frontier.nonEmpty) {
        val next = frontier.diff(seen)
        seen ++= next
        frontier = next.flatMap(adj.getOrElse(_, Set.empty[String]))
      }
      if (out.length + seen.size > rowLimit) return None
      seen.foreach(d => out += ((start, d)))
    }
    Some(spark.createDataFrame(out.toSeq).toDF("src", "dst"))
  }

  private def distributed(e: DataFrame, maxIter: Int): DataFrame = {
    // Semi-naive: each round extends only the FRESH frontier. `seen` is
    // maintained as ONE checkpointed DataFrame (not a re-unioned list of
    // frontiers) so every round's plan has the IDENTICAL shape —
    // LogicalRDD ⋈ LogicalRDD → distinct → anti-join LogicalRDD — and
    // whole-stage codegen compiles each shape once for the whole fixpoint
    // instead of once per round (the growing union defeated the codegen
    // cache and made round N's planning cost O(N)).
    //
    // Partitioning is pre-aligned with the joins so the per-round shuffles
    // touch only the (shrinking) frontier side:
    //   - `ej` is hash-partitioned by `src`, the probe key of the extend
    //     join — localCheckpoint preserves outputPartitioning, so only the
    //     frontier side exchanges each round;
    //   - `seen` is re-checkpointed per round partitioned by (src,dst),
    //     matching both the anti-join keys and distinct()'s output
    //     partitioning, so the anti-join runs exchange-free.
    // Re-materializing `seen` each round costs one narrow write of the
    // closure-so-far; lineage stays one LogicalRDD deep regardless of
    // iteration count.
    // Rounds DOUBLE the covered path length (new paths = seen ∘ seen, the
    // "smart" TC recursion) rather than extending by one edge: a
    // single-edge extension silently TRUNCATES any graph with diameter >
    // maxIter (an 80-node chain at maxIter=50 returned exactly the
    // pairs of path length ≤ 51 — caught by RobustnessSpec), while
    // doubling covers diameter 2^maxIter and still converges in 2-3
    // rounds for the shallow hierarchies this engine actually queries.
    // Completeness without joining the WHOLE closure with itself each
    // round: compose only the FRESH pairs with seen. A shortest path of
    // length n ∈ (2^k, 2^(k+1)] splits at its 2^k-th node into a prefix
    // that is itself shortest of length exactly 2^k (else the whole path
    // would be shorter) — i.e. a member of round k's fresh set — and a
    // suffix of length ≤ 2^k already in seen. So fresh ∘ seen finds every
    // next-round pair while the left join side keeps shrinking.
    // seen is kept hash-partitioned by `src`: that is the build key of the
    // compose join (reused as-is every round, no exchange on the big side)
    // and a PREFIX of the anti-join keys (src,dst), so it satisfies that
    // join's clustering requirement too — rows with equal (src,dst) are
    // co-located by src alone.
    var seen = e.repartition(col("src")).localCheckpoint()
    var fresh = seen
    var iter = 0
    var growing = true
    while (growing && iter < maxIter) {
      iter += 1
      val step = fresh.as("f")
        .join(seen.as("s"), col("f.dst") === col("s.src"))
        .select(col("f.src").as("src"), col("s.dst").as("dst"))
        .distinct()
      val next = step.join(seen, Seq("src", "dst"), "left_anti").localCheckpoint()
      if (next.isEmpty) growing = false
      else {
        seen = seen.union(next).repartition(col("src")).localCheckpoint()
        fresh = next
      }
    }
    // Unconverged exit would mean a silently partial closure — impossible
    // in practice (2^maxIter path length), so fail loudly if it happens.
    if (growing) throw new IllegalStateException(
      s"transitive closure not converged after $maxIter doubling rounds")
    seen
  }

  /** Nodes reachable from `start` via 1+ edges (forward), or that reach
    * `start` (reverse). Frontier BFS — driver-side under the limit,
    * distributed loop otherwise. Used by the SPARQL planner to evaluate
    * `p*` atoms with a constant endpoint without materializing the full
    * pairwise closure. */
  def reachableFrom(
      edges: DataFrame, start: String, reverse: Boolean = false,
      maxIter: Int = 50, driverSideLimit: Long = DriverSideLimit): DataFrame = {
    val spark = edges.sparkSession
    import org.apache.spark.sql.functions.{col => c}
    val e0 = edges.select(c("src").cast("string"), c("dst").cast("string")).distinct()
    val e = (if (reverse) e0.select(c("dst").as("src"), c("src").as("dst")) else e0)
      .localCheckpoint()
    if (e.count() <= driverSideLimit) {
      import spark.implicits._
      val adj = e.as[(String, String)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val seen = scala.collection.mutable.Set[String]()
      var frontier = adj.getOrElse(start, Set.empty[String])
      while (frontier.nonEmpty) {
        val fresh = frontier.diff(seen)
        seen ++= fresh
        frontier = fresh.flatMap(adj.getOrElse(_, Set.empty[String]))
      }
      seen.toSeq.toDF("node")
    } else {
      // seed with start's direct successors (NOT start itself — start only
      // belongs in the result if a cycle brings it back)
      var seen = e.filter(c("src") === start).select(c("dst").as("node"))
        .distinct().localCheckpoint()
      var frontier = seen
      var iter = 0
      var growing = !frontier.isEmpty
      while (growing && iter < maxIter) {
        iter += 1
        val next = frontier.join(e, frontier("node") === e("src"))
          .select(e("dst").as("node")).distinct()
          .join(seen, Seq("node"), "left_anti").localCheckpoint()
        if (next.isEmpty) growing = false
        else { seen = seen.union(next).localCheckpoint(); frontier = next }
      }
      // one edge per round here (vertex-level BFS): a diameter > maxIter
      // graph would silently return a partial reachable set — fail loudly
      // instead (raise maxIter deliberately for pathological chains)
      if (growing) throw new IllegalStateException(
        s"reachableFrom not converged after $maxIter rounds — " +
          "graph diameter exceeds maxIter")
      seen
    }
  }

  /** Reflexive closure: union zero-length pairs for every node in `nodes`
    * (single column). */
  def withIdentity(closure: DataFrame, nodes: DataFrame): DataFrame = {
    val id = nodes.select(col(nodes.columns.head).cast("string").as("src"))
      .distinct()
      .withColumn("dst", col("src"))
    closure.select("src", "dst").union(id).distinct()
  }
}
