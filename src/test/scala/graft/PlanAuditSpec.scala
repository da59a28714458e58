package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural audit of EVERY driver query's physical plan — the
  * regression net for the scale properties the per-operator specs assert
  * individually: no accidental cartesian products, and nested-loop joins
  * only where a tiny side is DELIBERATELY broadcast (the ANN scoring
  * cross-joins, where corpus × broadcast-queries is the intended shape).
  * A new query that trips this either needs a better join shape or an
  * explicit entry in the allow-list below with a reason. */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  val sfDir = "/root/testdata/sf0.001"

  /** Queries whose BroadcastNestedLoopJoin is the intended plan: a
    * broadcast-small-side cross-score (ANN brute force / k-means assign /
    * planted-pair construction), never data×data. */
  val bnljAllowed: Set[String] = Set(
    "q22_embed_topk", // corpus × broadcast(8 query vectors)
    "q23_embed_ivf", // k-means assign: corpus × broadcast(centroids)
    "q29_embed_neardup", // planted-pair corpus construction
    "q30_embed_lsh_neardup", // same construction feeding the LSH path
    "q52_semdedup", // k-means assign: corpus × broadcast(centroids)
    "q57_mix_weights", // per-source shares × broadcast(1-row Σweight/leftover)
    "q73_heavy_hitters", // per-key counts × broadcast(1-row Σtotal)
    "q74_embed_pq", // ADC scoring: code relation × broadcast(query vectors)
    "q75_bm25", // per-(doc,term) tf × broadcast(1-row corpus totals)
    "q82_bloom_decontaminate", // corpus grams × broadcast(1-row bloom mask)
    "q182_bloom_index_probe", // batch grams × broadcast(1-row PERSISTED bloom mask) — q82's probe shape
    "q96_gap_fill", // grid build: |types| × broadcast(|days|), both dimension-sized
    "q102_ivf_pq", // IVF assign + PQ encode: corpus × broadcast(centroids/codebook)
    "q104_hybrid_rrf", // dense list: corpus × broadcast(1 query vector), q22's shape
    "q175_pq_rerank", // ADC shortlist stage: corpus/queries × broadcast(codebook), q74's shape; the rerank itself is an equi-join
    "q176_ann_index_serve", // query probe + ADC table: queries × broadcast(supers/codebook), q102's shape; the codes scan itself joins by equi-keys
    "q179_ann_index_append", // q176's serve plan verbatim over the append-grown index (the append itself is a fixture, not the timed body)
    "q183_ann_stream_ingest", // q176's serve shapes over base + codes_stream (two pruned branches, one ranker); the stream ingest is a fixture
    "q185_embed_admit", // q176's serve shapes + q175's rerank (broadcast shortlist); the admission joins are equi-keyed
    "q186_stream_embed_ingest", // q185's admission inside foreachBatch; the returned status relation is a plain scan but fixture probes share q185's shapes
    "q177_ivfpq_residual", // assign/encode/query-table: corpus/probes × broadcast(centroids/residual codebook), q102's shape
    "q178_ann_serve_rerank", // q176's serve stage shapes; the re-rank is an equi-join
    "q188_ann_tombstone_serve", // q176's serve shapes (queries × broadcast supers/codebook) over the tombstoned index; the tombstone anti-join itself is an equi-key broadcast
    "q191_ann_list_balance", // per-list counts × broadcast(1-row totals): q73's share-arithmetic shape
    "q193_takedown_pipeline", // union of q176's serve shapes + q189's mask probe (batch grams × broadcast 4-row sharded mask) over the taken-down pipeline; every takedown anti-join is an equi-key broadcast
    "q194_ann_balance_footers", // per-list counts × broadcast(1-row totals): q191's share-arithmetic shape over footer-derived counts
    "q195_ann_hot_split", // single-level serve: queries × broadcast(post-split centroids/codebook), q176's probe shape
    "q196_ann_fold_serve", // q176's serve shapes over the stream-folded index (the fold is a fixture, not the timed body)
    "q197_maintenance_tick_serve", // q195's single-level serve shape over the post-tick structure (the tick is a fixture, not the timed body)
    "q198_ann_twolevel_split", // q176's two-level serve shapes over the post-split structure (frozen persisted supers; the split is a fixture)
    "q199_pipeline_tick", // q193's five-surface probe union over the post-pipelineTick state (the tick is a fixture, not the timed body)
    "q132_sparql_values_undef") // solutions × broadcast(2-row UNDEF VALUES): null-or-equal condition cannot be an equi-join (§10.2.2)

  test("no query plans a CartesianProduct; BNLJ only where a tiny side " +
      "is deliberately broadcast") {
    assume(new java.io.File(sfDir).isDirectory)
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
        offenders += s"$name: unexpected BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
