package graft.examples

import graft.TempDirs
import graft.operators.{AnnIndex, DedupIndex, Similarity, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Day-2 OPERATIONS demo — the round-14/15 operational layer end-to-end,
  * the loop a production training-data pipeline runs daily:
  *
  *   1. indexes built ONCE over the corpus (exact keys, minhash bands,
  *      winnowed anchors, benchmark bloom mask, doc store);
  *   2. a new crawl batch admitted at batch-proportional cost — exact
  *      re-fetch dedup, verified NEAR-dup dedup, substring-span cut
  *      against the anchor index, benchmark-contamination report;
  *   3. admitted docs appended (parquet append — no index rewrite);
  *   4. crash-safe compaction (tmp write + two-rename swap);
  *   5. the ANN side: IVF-PQ index built over the base era, the new
  *      era APPENDED against the frozen centroids/codebook, query batch
  *      served over both at probed-fraction cost.
  *
  * Run: sbt "runMain graft.examples.OpsDemo [sfDir]"   (default sf0.01)
  * Everything printed is a count/time the PLANS.md probes measure at
  * 10× and 100× (`graft.IndexProbe`). */
object OpsDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ops] $tag%-42s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val root = TempDirs.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_opsdemo_${java.util.UUID.randomUUID()}")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    // today's crawl: 20% novel docs, with one-in-ten a re-fetch of a
    // known page (its corpus neighbor's text)
    val neigh = docs.select((col("doc_id") - 1).as("doc_id"),
      col("text").as("_nt"))
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .join(neigh, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) === 0 && col("_nt").isNotNull,
          col("_nt")).otherwise(col("text")).as("text"))

    // ---- 1. one-time index builds (corpus-proportional, amortized)
    time("build: exact + minhash + anchor + store")(
      { DedupIndex.writeExactIndex(corpus, "text", "doc_id", s"$root/exact")
        DedupIndex.writeMinHashIndex(corpus, "text", "doc_id", s"$root/minhash")
        DedupIndex.writeAnchorIndex(corpus, "text", "doc_id", s"$root/anchor",
          k = 3, w = 4)
        corpus.select(col("doc_id"), col("text"))
          .write.mode("overwrite").parquet(s"$root/store") })
    time("build: benchmark bloom mask")(
      DedupIndex.writeBloomIndex(docs.filter(col("source") === "src0"),
        "text", "doc_id", s"$root/bloom"))

    // ---- 2. today's batch, admitted at batch-proportional cost
    val exactSt = time("admit: exact (re-fetch dedup)")(
      DedupIndex.admitAgainstIndex(batch, "text", "doc_id", s"$root/exact")
        .groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    println(s"[ops]   exact statuses: $exactSt")
    val ndSt = time("admit: near-dup (LSH -> verify)")(
      DedupIndex.admitNearDupAgainstIndex(batch, "text", "doc_id",
          s"$root/minhash", s"$root/store")
        .groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    println(s"[ops]   near-dup statuses: $ndSt")
    val spans = time("detect: substring spans vs anchor index")(
      DedupIndex.duplicateSpansAgainstIndex(batch, "text", "doc_id",
        s"$root/anchor", k = 3, w = 4))
    val nSpans = spans.count()
    val nCut = time("cut: remove duplicated spans")(
      TextOps.cutSpans(batch, "text", "doc_id", spans).count())
    println(s"[ops]   spans=$nSpans, docs after cut=$nCut")
    val dirty = time("probe: benchmark bloom contamination")(
      DedupIndex.bloomContaminationAgainstIndex(batch, "text", "doc_id",
        s"$root/bloom").filter(col("n_maybe_dirty") > 0).count())
    println(s"[ops]   bloom-flagged docs=$dirty (verify before dropping)")

    // ---- 3. maintenance: append the admitted docs, then compact
    val admitted = batch.join(
      DedupIndex.admitAgainstIndex(batch, "text", "doc_id", s"$root/exact")
        .filter(col("status") === "admitted").select("doc_id"),
      Seq("doc_id"), "leftsemi")
    time("append: admitted keys/bands/grams/texts")(
      { DedupIndex.appendToIndex(admitted, "text", "doc_id", s"$root/exact", "exact")
        DedupIndex.appendToIndex(admitted, "text", "doc_id", s"$root/minhash", "minhash")
        DedupIndex.appendToIndex(admitted, "text", "doc_id", s"$root/anchor",
          "anchor", anchorK = 3, anchorW = 4)
        admitted.select(col("doc_id"), col("text"))
          .write.mode("append").parquet(s"$root/store") })
    // round 18: maintenance is an AUTOPILOT — ONE pipelineTick call
    // ticks every root in cross-root order (row-wise indexes, aggregate
    // kinds, stores LAST) with the store wiring each kind needs, and
    // performs what is due (here: compaction of the appended small
    // files where the budget breaches, `healthy` otherwise) instead of
    // a hand-ordered per-root runbook
    time("maintenance: ONE pipelineTick over exact/minhash/anchor/store")(
      graft.operators.Maintenance.pipelineTick(spark,
          graft.operators.PipelineRoots(
            exactIndex = Some(s"$root/exact"),
            minhashIndex = Some(s"$root/minhash"),
            anchorIndex = Some(s"$root/anchor"),
            docStore = Some(s"$root/store")),
          policy = graft.operators.Maintenance.TickPolicy(
            maxStoreFiles = 8L))
        .orderBy("seq").collect()
        .foreach(r => println(s"[ops]   tick(${r.getString(2).split('/').last}): " +
          s"${r.getString(1)}(performed=${r.getBoolean(4)})")))

    // ---- 4. the ANN side: base build, era append, serve over both
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = emb.filter(
        pmod(col("vec_id"), lit(Similarity.autoCentroidMod(emb))) === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cb = Similarity.pqCodebook(emb, m = 8)
    time("ann: build IVF-PQ over the base era")(
      AnnIndex.writeIvfPqIndex(emb.filter(pmod(col("vec_id"), lit(5)) =!= 0),
        cents, cb, m = 8, dim = 64, s"$root/ann", twoLevel = true))
    time("ann: append today's era (frozen quantizer)")(
      AnnIndex.appendToIvfPqIndex(emb.filter(pmod(col("vec_id"), lit(5)) === 0),
        s"$root/ann", m = 8, dim = 64, twoLevel = true))
    val topk = time("ann: serve 8-query batch, probed lists only")(
      AnnIndex.queryIvfPqIndex(emb.filter(col("vec_id") < 8), s"$root/ann",
        m = 8, dim = 64, k = 5, nProbe = 2, twoLevel = true).count())
    // semantic admission: 8 "re-embedded re-crawls" (known vectors under
    // new ids) must all flag dup_corpus against the index at τ = 0.999
    val reEmb = emb.filter(col("vec_id").between(100, 107))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val admSt = time("ann: embedding near-dup admission")(
      AnnIndex.admitEmbeddingsAgainstIndex(reEmb, emb, s"$root/ann",
          m = 8, dim = 64, shortK = 20, nProbe = 2, twoLevel = true,
          tauBp = 9990L)
        .groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    println(s"[ops]   embedding admission statuses: $admSt")
    // round 18: the ANN root's compact/fold/split/retrain decision is
    // the autopilot's too — here the single era append stays within the
    // file budget and nothing is tombstoned, so the honest verdict is
    // `healthy` (MaintenanceSpec drives the all-three-actions tick)
    val annTick = time("ann: maintenance tick")(
      graft.operators.Maintenance.maintenanceTick(spark, s"$root/ann")
        .orderBy("seq").collect()
        .map(r => s"${r.getString(1)}(performed=${r.getBoolean(4)})"))
    println(s"[ops]   tick(ann): ${annTick.mkString(" -> ")}")
    // round 16: the one-call index health check (metadata-only)
    val desc = DedupIndex.describeIndex(spark, s"$root/ann").head()
    println(s"[ops]   describe(ann): kind=${desc.getString(1)} " +
      s"params=${desc.getString(2)} files=${desc.getLong(3)} " +
      s"bytes=${desc.getLong(4)} tombstones=${desc.getLong(5)}")
    // round 16: the drift-monitor → retrain cycle the append path's
    // policy documents. The balance report reads only the cid partition
    // column (footer-scale); the verdict gates the expensive cutover.
    val bal = time("ann: list-balance report (footer-scale)")(
      AnnIndex.listBalanceReport(spark, s"$root/ann")
        .agg(max("hot_factor_bp"), count(lit(1))).head())
    println(s"[ops]   hottest list ${bal.getLong(0)} bp of the mean " +
      s"across ${bal.getLong(1)} lists")
    if (AnnIndex.shouldRetrain(spark, s"$root/ann", hotFactor = 4.0))
      println("[ops]   drift past budget — retrain + cutover due")
    else println("[ops]   balance within budget — frozen quantizer holds")
    // the cutover itself, fed from the maintained vector store (the
    // admission pipelines keep it = the current corpus, so no stale
    // caller-supplied snapshot can sneak in)
    emb.write.mode("overwrite").parquet(s"$root/vecstore")
    time("ann: retrain cutover from the vector store")(
      AnnIndex.rebuildIvfPqIndexFromStore(spark, s"$root/vecstore",
        cents, cb, m = 8, dim = 64, s"$root/ann", twoLevel = true))
    println(s"[ops]   served top-k rows=$topk")

    // ---- 5. round 17: the takedown + rebalance layer ----------------
    // ONE call removes a doc set across the whole pipeline: row-wise
    // kinds tombstoned, anchor + bloom rebuilt from their stores.
    docs.filter(col("source") === "src0").select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/refstore")
    val tdReport = time("takedown: one call, all five index kinds")(
      graft.operators.Takedown(
        docs.filter(col("doc_id") % 100 === 1).select("doc_id"),
        graft.operators.PipelineRoots(
          exactIndex = Some(s"$root/exact"),
          minhashIndex = Some(s"$root/minhash"),
          docStore = Some(s"$root/store"),
          anchorIndex = Some(s"$root/anchor"),
          bloomIndex = Some(s"$root/bloom"),
          refStore = Some(s"$root/refstore"),
          annIndex = Some(s"$root/ann"),
          vecStore = Some(s"$root/vecstore")))
        .groupBy("action").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    println(s"[ops]   takedown actions: $tdReport")
    // the footer-metadata balance report (round 17): byte-identical to
    // the scan report, cheap at any file granularity
    val balF = time("ann: balance report from parquet footers")(
      AnnIndex.listBalanceReportFromFooters(spark, s"$root/ann")
        .agg(max("hot_factor_bp"), count(lit(1))).head())
    println(s"[ops]   footer report: hottest ${balF.getLong(0)} bp " +
      s"across ${balF.getLong(1)} lists")
    // hot-list split: a planted drift clump, then the list-proportional
    // rebalance (single-level demo index — the split's documented scope)
    val splitIdx = s"$root/ann-split"
    AnnIndex.writeIvfPqIndex(emb, cents, cb, m = 8, dim = 64, splitIdx,
      twoLevel = false)
    val clump = spark.range(300)
      .select((col("id") + 2000000000L).as("vec_id"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        emb.filter(col("vec_id") === 0).select(col("embedding"))))
    AnnIndex.appendToIvfPqIndex(clump, splitIdx, m = 8, dim = 64)
    emb.select(col("vec_id"), col("embedding"))
      .unionByName(clump.select(col("vec_id"), col("embedding")))
      .write.mode("overwrite").parquet(s"$root/split-store")
    // round 18: fold-if-needed → compact-if-due → split-if-hot is ONE
    // maintenanceTick call now (the autopilot decides and orders; here
    // the planted clump trips the hot rule and the tick performs the
    // split — an identical-copy clump cannot spread thinner than one
    // child, so the operational win is ISOLATION: queries not near the
    // clump no longer pay its list on every probe)
    val tickRep = time("ann: maintenance tick (fold/compact/split)")(
      graft.operators.Maintenance.maintenanceTick(spark, splitIdx,
          vecStore = Some(s"$root/split-store"))
        .orderBy("seq").collect()
        .map(r => s"${r.getString(1)}(performed=${r.getBoolean(4)})"))
    println(s"[ops]   tick(ann-split): ${tickRep.mkString(" -> ")}")
    println(s"[ops]   post-split children: " +
      spark.read.parquet(s"$splitIdx/centroids").count() + " lists")
    println("[ops] done — every stage above is oracled by q171-q196 and " +
      "probed at 10x/100x in PLANS.md")
    spark.stop()
  }
}
