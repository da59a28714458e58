package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round 18: the maintenance autopilot — ONE `maintenanceTick` call
  * reads the metadata-bound health surfaces, decides the due actions in
  * their safe order, and performs (or dry-run returns) them. The main
  * spec drives a fixture that needs ALL of fold + compact + split in
  * one tick and asserts full-probe serving is byte-identical through
  * it. */
class MaintenanceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def tmp(tag: String): String = TempDirs.register(
    s"${System.getProperty("java.io.tmpdir")}/graft_maint_${tag}_${java.util.UUID.randomUUID()}")

  private def hp(x: String) = new org.apache.hadoop.fs.Path(x)

  test("maintenanceTick performs fold + compact + split in one ordered " +
      "call; full-probe serving byte-identical before/after; dry-run " +
      "returns the same plan and touches nothing; a second tick is " +
      "healthy") {
    val s = spark; import s.implicits._
    val vecs = (0 until 60).map { i =>
      val a = 2 * math.Pi * i / 60.0
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat,
        (math.cos(3 * a) / 2).toFloat, (math.sin(3 * a) / 2).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val cents = vecs.filter(pmod(col("vec_id"), lit(12)) === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cb = Similarity.pqCodebook(vecs, m = 2, seedMod = 15)
    val path = tmp("tick"); val store = tmp("store")
    // base: 80% of the ring, single-level
    AnnIndex.writeIvfPqIndex(vecs.filter(pmod(col("vec_id"), lit(5)) =!= 0),
      cents, cb, m = 2, dim = 4, path)
    // FOLD debt: the other 20% arrives as a stream ingest batch
    AnnIndex.ingestVecBatch(vecs.filter(pmod(col("vec_id"), lit(5)) === 0),
      0L, path, m = 2, dim = 4, twoLevel = false, "vec_id", "embedding")
    // SPLIT debt: a straddled drift clump into vector 0's list — copies
    // of vec 0's and vec 1's embeddings (the list's two smallest member
    // ids 0 and 1 seed the children, one inside each sub-clump)
    val clump = s.range(120)
      .select((col("id") + 2000000000L).as("vec_id"))
      .crossJoin(broadcast(vecs.filter(col("vec_id") === 0L)
        .select(col("embedding"))))
      .unionByName(s.range(120)
        .select((col("id") + 3000000000L).as("vec_id"))
        .crossJoin(broadcast(vecs.filter(col("vec_id") === 1L)
          .select(col("embedding")))))
    AnnIndex.appendToIvfPqIndex(clump, path, m = 2, dim = 4)
    // COMPACT debt: take down two ring vectors
    AnnIndex.deleteVectors(Seq(7L, 23L).toDF("vec_id"), path)
    // the split's seed fetch reads the maintained vector store
    vecs.unionByName(clump).write.parquet(store)
    def serveFull(): Set[(Long, Long, Int, Double)] =
      AnnIndex.queryIvfPqIndex(queries, path, m = 2, dim = 4, k = 4,
          nProbe = 64)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val pre = serveFull()
    assert(!pre.exists(_._2 == 7L)) // tombstones already anti-joined
    val fs = hp(path).getFileSystem(s.sessionState.newHadoopConf())

    // ---- dry run: the full plan, nothing touched ---------------------
    val plan = Maintenance.maintenanceTick(s, path,
        vecStore = Some(store), dryRun = true)
      .orderBy("seq").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getBoolean(4)))
    assert(plan.map(_._2).toSeq == Seq("fold", "compact", "split"))
    assert(plan.forall(!_._3)) // nothing performed
    assert(fs.exists(hp(s"$path/codes_stream/ingest_batch=0")))
    assert(fs.exists(hp(s"$path/_tombstones")))
    assert(serveFull() == pre)

    // ---- the tick: all three performed, in order ---------------------
    val done = Maintenance.maintenanceTick(s, path, vecStore = Some(store))
      .orderBy("seq").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getBoolean(4)))
    assert(done.map(_._2).toSeq == Seq("fold", "compact", "split"))
    assert(done.forall(_._3)) // all performed
    // physical postconditions: stream folded away, tombstones applied,
    // the hot list split into children
    assert(!fs.exists(hp(s"$path/codes_stream")))
    assert(!fs.exists(hp(s"$path/_tombstones")))
    assert(s.read.parquet(s"$path/centroids").count() > cents.count())
    // serving: byte-identical at full probe (deletions were already
    // anti-joined pre-tick; fold and split preserve every code row)
    assert(serveFull() == pre)

    // ---- a second tick finds a healthy index -------------------------
    val again = Maintenance.maintenanceTick(s, path, vecStore = Some(store))
      .collect().map(r => (r.getString(1), r.getBoolean(4)))
    assert(again.toSeq == Seq(("healthy", false)), again.mkString(";"))
  }

  test("maintenanceTick on a LEGACY two-level hot index (no persisted " +
      "supers) reports retrain_required; a round-18 two-level root " +
      "splits; on dedup kinds it compacts tombstone debt; aggregate " +
      "kinds queue or perform store-fed rebuilds") {
    val s = spark; import s.implicits._
    val vecs = (0 until 60).map { i =>
      val a = 2 * math.Pi * i / 60.0
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat,
        (math.cos(3 * a) / 2).toFloat, (math.sin(3 * a) / 2).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = vecs.filter(pmod(col("vec_id"), lit(12)) === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cb = Similarity.pqCodebook(vecs, m = 2, seedMod = 15)
    // two-level + planted clump → retrain_required, NOT performed
    val tl = tmp("twolevel")
    AnnIndex.writeIvfPqIndex(vecs, cents, cb, m = 2, dim = 4, tl,
      twoLevel = true)
    val clump = s.range(300)
      .select((col("id") + 2000000000L).as("vec_id"))
      .crossJoin(broadcast(vecs.filter(col("vec_id") === 0L)
        .select(col("embedding"))))
    AnnIndex.appendToIvfPqIndex(clump, tl, m = 2, dim = 4, twoLevel = true)
    // round-18 two-level roots persist supers/ — the tick SPLITS them
    val tlStore = tmp("tlstore")
    vecs.unionByName(clump).write.parquet(tlStore)
    val tlSplit = Maintenance.maintenanceTick(s, tl,
        vecStore = Some(tlStore))
      .collect().map(r => (r.getString(1), r.getBoolean(4))).toSeq
    assert(tlSplit == Seq(("split", true)), tlSplit)
    // a LEGACY two-level root (no persisted supers) can only re-train
    val tl2 = tmp("twolevel_legacy")
    AnnIndex.writeIvfPqIndex(vecs, cents, cb, m = 2, dim = 4, tl2,
      twoLevel = true)
    AnnIndex.appendToIvfPqIndex(clump, tl2, m = 2, dim = 4, twoLevel = true)
    hp(s"$tl2/supers").getFileSystem(s.sessionState.newHadoopConf())
      .delete(hp(s"$tl2/supers"), true)
    val tlActions = Maintenance.maintenanceTick(s, tl2,
        vecStore = Some(tlStore))
      .collect().map(r => (r.getString(1), r.getBoolean(4))).toSeq
    assert(tlActions.contains(("retrain_required", false)), tlActions)
    assert(!tlActions.exists(_._1 == "split"))
    // exact index with a tombstone → compact performed, then healthy
    val corpus = (1L to 6L).map(i => (i, s"doc number $i text"))
      .toDF("doc_id", "text")
    val ex = tmp("exact")
    DedupIndex.writeExactIndex(corpus, "text", "doc_id", ex)
    DedupIndex.deleteDocs(Seq(3L).toDF("doc_id"), ex)
    val exActions = Maintenance.maintenanceTick(s, ex)
      .collect().map(r => (r.getString(1), r.getBoolean(4))).toSeq
    assert(exActions == Seq(("compact", true)))
    assert(!s.read.parquet(ex).collect().map(_.getLong(1)).contains(3L))
    assert(Maintenance.maintenanceTick(s, ex).collect()
      .map(_.getString(1)).toSeq == Seq("healthy"))
    // anchor with a tombstone: queued without a store, performed with
    val an = tmp("anchor"); val st = tmp("docstore")
    DedupIndex.writeAnchorIndex(corpus, "text", "doc_id", an, k = 3, w = 4)
    corpus.write.parquet(st)
    DedupIndex.deleteDocs(Seq(2L).toDF("doc_id"), an)
    assert(Maintenance.maintenanceTick(s, an).collect()
      .map(r => (r.getString(1), r.getBoolean(4))).toSeq ==
      Seq(("rebuild_required", false)))
    DedupIndex.deleteDocs(Seq(2L).toDF("doc_id"), st)
    assert(Maintenance.maintenanceTick(s, an, docStore = Some(st)).collect()
      .map(r => (r.getString(1), r.getBoolean(4))).toSeq ==
      Seq(("rebuild", true)))
    assert(DedupIndex.duplicateSpansAgainstIndex(
      Seq((61L, "doc number 2 text")).toDF("doc_id", "text"), "text",
      "doc_id", an, k = 3, w = 4).count() == 0L)
    // meta-less store root with tombstone debt → compactDocStore
    val stActions = Maintenance.maintenanceTick(s, st)
      .collect().map(r => (r.getString(1), r.getBoolean(4))).toSeq
    assert(stActions == Seq(("compact", true)))
    assert(s.read.parquet(st).count() == 5L)
  }

  test("lifecycle soak (round 18): ONE index driven through " +
      "stream-ingest -> fold -> append -> split -> takedown -> compact " +
      "-> store-fed rebuild; after EVERY step full-probe serving is " +
      "byte-identical to a fresh build over the current survivor set") {
    val s = spark; import s.implicits._
    def ring(ids: Seq[Long], offset: Double): org.apache.spark.sql.DataFrame =
      ids.zipWithIndex.map { case (id, i) =>
        val a = 2 * math.Pi * (i + offset) / 60.0
        (id, Array(math.cos(a).toFloat, math.sin(a).toFloat,
          (math.cos(3 * a) / 2).toFloat, (math.sin(3 * a) / 2).toFloat))
      }.toDF("vec_id", "embedding")
    val base = ring(0L until 60L, 0.0)
    val era = ring(100L until 120L, 0.31) // a later crawl, offset angles
    val cents = base.filter(pmod(col("vec_id"), lit(12)) === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cb = Similarity.pqCodebook(base, m = 2, seedMod = 15)
    val queries = base.filter(col("vec_id") < 3)
    val path = tmp("soak"); val store = tmp("soakstore")
    // the maintained vector store mirrors every admission up front (a
    // superset during early steps is fine: the split semi-joins to live
    // members; the final rebuild runs when index = store = survivors)
    base.unionByName(era).write.parquet(store)
    def serveFull(p: String): Set[(Long, Long, Int, Double)] =
      AnnIndex.queryIvfPqIndex(queries, p, m = 2, dim = 4, k = 6,
          nProbe = 64)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    var step = 0
    // THE per-step oracle: a fresh single-shot build over exactly the
    // rows the lifecycle index should now hold, served identically
    def checkStep(tag: String, survivors: org.apache.spark.sql.DataFrame): Unit = {
      step += 1
      val fp = tmp(f"soak_fresh_$step%02d")
      AnnIndex.writeIvfPqIndex(survivors, cents, cb, m = 2, dim = 4, fp)
      assert(serveFull(path) == serveFull(fp),
        s"step $step ($tag): lifecycle serving diverged from fresh build")
    }
    // 1. base build over 80%
    AnnIndex.writeIvfPqIndex(base.filter(pmod(col("vec_id"), lit(5)) =!= 0),
      cents, cb, m = 2, dim = 4, path)
    checkStep("base", base.filter(pmod(col("vec_id"), lit(5)) =!= 0))
    // 2. stream-ingest the remaining 20% (the foreachBatch body)
    AnnIndex.ingestVecBatch(base.filter(pmod(col("vec_id"), lit(5)) === 0),
      0L, path, m = 2, dim = 4, twoLevel = false, "vec_id", "embedding")
    checkStep("stream-ingest", base)
    // 3. fold the streamed partitions into the base layout
    AnnIndex.foldStreamIntoCodes(s, path)
    checkStep("fold", base)
    // 4. append a new era against the frozen quantizer
    AnnIndex.appendToIvfPqIndex(era, path, m = 2, dim = 4)
    checkStep("append", base.unionByName(era))
    // 5. split every above-mean list (hotFactorBp = 1x the mean) — the
    // permanent _folded marker must ride through the split's entry
    // cleanup and the centroid swap
    val rep = AnnIndex.splitHotLists(s, store, path, m = 2, dim = 4,
      hotFactorBp = 10000L)
    assert(rep.count() > 0, "soak fixture: no list split")
    checkStep("split", base.unionByName(era))
    // 6. takedown: one call tombstones index + store together
    Takedown(Seq(5L, 103L, 17L).toDF("vec_id"), PipelineRoots(
      annIndex = Some(path), vecStore = Some(store)), idCol = "vec_id")
    val survivors = base.unionByName(era)
      .filter(!col("vec_id").isin(5L, 103L, 17L))
    checkStep("takedown", survivors)
    // 7. compaction applies the takedown physically
    AnnIndex.compactIvfPqCodes(s, path)
    val fsS = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sessionState.newHadoopConf())
    assert(!fsS.exists(new org.apache.hadoop.fs.Path(s"$path/_tombstones")))
    checkStep("compact", survivors)
    // 8. store-fed rebuild (the retrain cutover shape): store tombstones
    // still pending there are excluded by the rebuild
    AnnIndex.rebuildIvfPqIndexFromStore(s, store, cents, cb, m = 2,
      dim = 4, path)
    checkStep("rebuild", survivors)
    // the rebuilt index keeps serving appends (lifecycle continues)
    val era2 = ring(200L until 210L, 0.77)
    AnnIndex.appendToIvfPqIndex(era2, path, m = 2, dim = 4)
    checkStep("append-after-rebuild", survivors.unionByName(era2))
  }

  test("pipelineTick (round 18): ONE call ticks every root of a " +
      "PipelineRoots in cross-root order (row-wise, ANN, aggregate " +
      "rebuilds, stores LAST), converging to zero pending residue in " +
      "one pass; dry-run plans without touching; second tick healthy") {
    val s = spark; import s.implicits._
    val root = tmp("pipe")
    val corpus = (1L to 30L).map(i => (i, s"pipeline doc $i body " +
      s"with shared tail ${i % 7}")).toDF("doc_id", "text")
    DedupIndex.writeExactIndex(corpus, "text", "doc_id", s"$root/exact")
    DedupIndex.writeMinHashIndex(corpus, "text", "doc_id",
      s"$root/minhash", k = 16, bands = 4, shingleN = 2)
    DedupIndex.writeAnchorIndex(corpus, "text", "doc_id",
      s"$root/anchor", k = 3, w = 4)
    corpus.write.parquet(s"$root/docstore")
    val ref = corpus.filter(col("doc_id") <= 10)
    ref.write.parquet(s"$root/refstore")
    DedupIndex.writeBloomIndexSharded(ref, "text", "doc_id",
      s"$root/bloomsh", n = 3, shards = 2, mBits = 512)
    val vecs = (0 until 60).map { i =>
      val a = 2 * math.Pi * i / 60.0
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat,
        (math.cos(3 * a) / 2).toFloat, (math.sin(3 * a) / 2).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = vecs.filter(pmod(col("vec_id"), lit(12)) === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cb = Similarity.pqCodebook(vecs, m = 2, seedMod = 15)
    AnnIndex.writeIvfPqIndex(vecs.filter(pmod(col("vec_id"), lit(5)) =!= 0),
      cents, cb, m = 2, dim = 4, s"$root/ann")
    AnnIndex.ingestVecBatch(vecs.filter(pmod(col("vec_id"), lit(5)) === 0),
      0L, s"$root/ann", m = 2, dim = 4, twoLevel = false,
      "vec_id", "embedding") // fold debt
    vecs.write.parquet(s"$root/vecstore")
    // debts: doc-side deletions land on every doc-rooted relation
    // directly (NOT via Takedown — the tick must do the rebuilds);
    // vector deletions on the ANN pair
    val delDocs = Seq(4L, 9L).toDF("doc_id")
    Seq(s"$root/exact", s"$root/minhash", s"$root/anchor",
      s"$root/bloomsh", s"$root/docstore", s"$root/refstore")
      .foreach(p => DedupIndex.deleteDocs(delDocs, p))
    AnnIndex.deleteVectors(Seq(8L, 21L).toDF("vec_id"), s"$root/ann")
    AnnIndex.deleteVectors(Seq(8L, 21L).toDF("vec_id"), s"$root/vecstore")
    val roots = PipelineRoots(
      exactIndex = Some(s"$root/exact"),
      minhashIndex = Some(s"$root/minhash"),
      docStore = Some(s"$root/docstore"),
      anchorIndex = Some(s"$root/anchor"),
      bloomIndex = Some(s"$root/bloomsh"),
      refStore = Some(s"$root/refstore"),
      annIndex = Some(s"$root/ann"),
      vecStore = Some(s"$root/vecstore"))
    val noSplit = Maintenance.TickPolicy(hotFactor = 1000.0)
    val expected = Seq(
      (s"$root/exact", "compact"), (s"$root/minhash", "compact"),
      (s"$root/ann", "fold"), (s"$root/ann", "compact"),
      (s"$root/anchor", "rebuild"), (s"$root/bloomsh", "rebuild"),
      (s"$root/docstore", "compact"), (s"$root/refstore", "compact"),
      (s"$root/vecstore", "compact"))
    val fs = hp(root).getFileSystem(s.sessionState.newHadoopConf())
    // ---- dry run: the full cross-root plan, nothing touched ----------
    val plan = Maintenance.pipelineTick(s, roots, dryRun = true,
        policy = noSplit)
      .orderBy("seq").collect()
      .map(r => (r.getString(2), r.getString(1), r.getBoolean(4)))
    assert(plan.map(p => (p._1, p._2)).toSeq == expected,
      plan.mkString(";"))
    assert(plan.forall(!_._3))
    assert(fs.exists(hp(s"$root/ann/codes_stream")))
    assert(fs.exists(hp(s"$root/exact/_tombstones")))
    // ---- perform: every action lands, globally sequenced -------------
    val done = Maintenance.pipelineTick(s, roots, policy = noSplit)
      .orderBy("seq").collect()
      .map(r => (r.getInt(0), r.getString(2), r.getString(1),
        r.getBoolean(4)))
    assert(done.map(d => (d._2, d._3)).toSeq == expected,
      done.mkString(";"))
    assert(done.forall(_._4))
    assert(done.map(_._1).toSeq == (1 to expected.size))
    // zero pending residue anywhere — the stores-LAST ordering claim:
    // the aggregate rebuilds propagated their index tombstones into
    // doc/ref stores, and the store compactions then absorbed them
    // within the SAME tick
    Seq("exact", "minhash", "ann", "anchor", "bloomsh", "docstore",
      "refstore", "vecstore").foreach(k =>
      assert(!fs.exists(hp(s"$root/$k/_tombstones")),
        s"$k still has pending tombstones after one pipelineTick"))
    // spot serving checks (the full five-surface proof is q199's oracle)
    assert(s.read.parquet(s"$root/docstore").count() == 28L)
    assert(s.read.parquet(s"$root/refstore").count() == 8L)
    assert(DedupIndex.admitAgainstIndex(
        corpus.filter(col("doc_id") === 4L)
          .select(col("doc_id") + 100L as "doc_id", col("text")),
        "text", "doc_id", s"$root/exact")
      .filter(col("status") === "admitted").count() == 1L,
      "deleted doc 4's text must re-admit after physical compaction")
    assert(!AnnIndex.queryIvfPqIndex(vecs.filter(col("vec_id") < 2),
        s"$root/ann", m = 2, dim = 4, k = 6, nProbe = 64)
      .collect().map(_.getLong(1)).contains(8L))
    // ---- second tick: every root healthy -----------------------------
    val again = Maintenance.pipelineTick(s, roots, policy = noSplit)
      .collect().map(r => (r.getString(1), r.getBoolean(4))).toSet
    assert(again == Set(("healthy", false)), again.mkString(";"))
  }

  test("pipeline lifecycle soak (round 18): a five-kind pipeline " +
      "driven through direct deletions -> pipelineTick -> Takedown -> " +
      "pipelineTick -> append era -> pipelineTick; after EVERY " +
      "completing step each serving surface equals a fresh build over " +
      "the current survivor set, and mid-lifecycle the aggregate kinds " +
      "fail loudly exactly while tombstoned") {
    val s = spark; import s.implicits._
    val root = tmp("pipesoak")
    // token-disjoint texts: no cross-doc grams/keys, so deletions can
    // never collide with survivors through a shared text_key or anchor
    // gram (fresh-build equality is then exact for every kind)
    def docsFor(r: Range) = r.map(i => (i.toLong,
      s"soak doc $i alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
      .toDF("doc_id", "text")
    def ring(ids: Seq[Long], offset: Double) = ids.zipWithIndex.map {
      case (id, j) =>
        val a = 2 * math.Pi * (j + offset) / 40.0
        (id, Array(math.cos(a).toFloat, math.sin(a).toFloat,
          (math.cos(3 * a) / 2).toFloat, (math.sin(3 * a) / 2).toFloat))
    }.toDF("vec_id", "embedding")
    val corpus0 = docsFor(1 to 40)
    val era = docsFor(101 to 110)
    val refs0 = corpus0.filter(col("doc_id") <= 12)
    val vecs0 = ring(0L until 40L, 0.0)
    val vecsEra = ring(200L until 210L, 0.37)
    val cents = vecs0.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cb = Similarity.pqCodebook(vecs0, m = 2, seedMod = 11)
    // fixed probe batches: every original + era text under shifted ids
    val probeDocs = corpus0.unionByName(era)
      .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
      .localCheckpoint()
    val probeVecs = vecs0.filter(col("vec_id") < 3).localCheckpoint()
    DedupIndex.writeExactIndex(corpus0, "text", "doc_id", s"$root/exact")
    DedupIndex.writeMinHashIndex(corpus0, "text", "doc_id",
      s"$root/minhash", k = 16, bands = 4, shingleN = 2)
    DedupIndex.writeAnchorIndex(corpus0, "text", "doc_id",
      s"$root/anchor", k = 3, w = 4)
    corpus0.write.parquet(s"$root/docstore")
    refs0.write.parquet(s"$root/refstore")
    DedupIndex.writeBloomIndexSharded(refs0, "text", "doc_id",
      s"$root/bloomsh", n = 3, shards = 2, mBits = 512)
    AnnIndex.writeIvfPqIndex(vecs0, cents, cb, m = 2, dim = 4, s"$root/ann")
    vecs0.write.parquet(s"$root/vecstore")
    val roots = PipelineRoots(
      exactIndex = Some(s"$root/exact"),
      minhashIndex = Some(s"$root/minhash"),
      docStore = Some(s"$root/docstore"),
      anchorIndex = Some(s"$root/anchor"),
      bloomIndex = Some(s"$root/bloomsh"),
      refStore = Some(s"$root/refstore"),
      annIndex = Some(s"$root/ann"),
      vecStore = Some(s"$root/vecstore"))
    val noSplit = Maintenance.TickPolicy(hotFactor = 1000.0,
      maxStoreFiles = 1000L, maxFilesPerList = 1000L)
    val fs = hp(root).getFileSystem(s.sessionState.newHadoopConf())
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    var step = 0
    // THE per-step oracle: every surface probed against the lifecycle
    // pipeline AND a fresh single-shot build over exactly the rows the
    // pipeline should now hold
    def checkAll(tag: String,
        docs: org.apache.spark.sql.DataFrame,
        refs: org.apache.spark.sql.DataFrame,
        vecs: org.apache.spark.sql.DataFrame,
        aggTombstoned: Boolean = false): Unit = {
      step += 1
      val f = tmp(f"pipesoak_fresh_$step%02d")
      DedupIndex.writeExactIndex(docs, "text", "doc_id", s"$f/exact")
      DedupIndex.writeMinHashIndex(docs, "text", "doc_id", s"$f/minhash",
        k = 16, bands = 4, shingleN = 2)
      docs.write.parquet(s"$f/docstore")
      def ex(p: String) = rows(DedupIndex.admitAgainstIndex(
        probeDocs, "text", "doc_id", s"$p/exact"))
      def nd(p: String) = rows(DedupIndex.admitNearDupAgainstIndex(
        probeDocs, "text", "doc_id", s"$p/minhash", s"$p/docstore",
        k = 16, bands = 4, shingleN = 2, thetaBp = 5000L))
      assert(ex(root) == ex(f), s"step $step ($tag): exact diverged")
      assert(nd(root) == nd(f), s"step $step ($tag): neardup diverged")
      def sp(p: String) = rows(DedupIndex.duplicateSpansAgainstIndex(
        probeDocs, "text", "doc_id", s"$p/anchor", k = 3, w = 4))
      def bl(p: String) = rows(DedupIndex.bloomContaminationAgainstShardedIndex(
        probeDocs, "text", "doc_id", s"$p/bloomsh", n = 3, shards = 2,
        mBits = 512))
      if (aggTombstoned) {
        // aggregate kinds must fail LOUDLY while tombstoned — deleted
        // content is never served, even before the rebuild happens
        assert(intercept[IllegalArgumentException](sp(root))
          .getMessage.contains("rebuild"))
        assert(intercept[IllegalArgumentException](bl(root))
          .getMessage.contains("rebuild"))
      } else {
        DedupIndex.writeAnchorIndex(docs, "text", "doc_id", s"$f/anchor",
          k = 3, w = 4)
        DedupIndex.writeBloomIndexSharded(refs, "text", "doc_id",
          s"$f/bloomsh", n = 3, shards = 2, mBits = 512)
        assert(sp(root) == sp(f), s"step $step ($tag): spans diverged")
        assert(bl(root) == bl(f), s"step $step ($tag): bloom diverged")
      }
      AnnIndex.writeIvfPqIndex(vecs, cents, cb, m = 2, dim = 4, s"$f/ann")
      def an(p: String) = rows(AnnIndex.queryIvfPqIndex(probeVecs,
        s"$p/ann", m = 2, dim = 4, k = 5, nProbe = 64))
      assert(an(root) == an(f), s"step $step ($tag): ann diverged")
    }
    checkAll("base", corpus0, refs0, vecs0)
    // ---- direct deletions on every root (ids 3, 17 hit docs AND refs
    // AND vecs — one numeric id space, the takedown posture) ----------
    val del1 = Seq(3L, 17L).toDF("doc_id")
    Seq("exact", "minhash", "anchor", "bloomsh", "docstore", "refstore")
      .foreach(k => DedupIndex.deleteDocs(del1, s"$root/$k"))
    AnnIndex.deleteVectors(del1.select(col("doc_id").as("vec_id")),
      s"$root/ann")
    AnnIndex.deleteVectors(del1.select(col("doc_id").as("vec_id")),
      s"$root/vecstore")
    val docs1 = corpus0.filter(!col("doc_id").isin(3L, 17L))
    val refs1 = refs0.filter(!col("doc_id").isin(3L, 17L))
    val vecs1 = vecs0.filter(!col("vec_id").isin(3L, 17L))
    checkAll("pending-deletions", docs1, refs1, vecs1, aggTombstoned = true)
    // ---- ONE pipelineTick resolves every debt ------------------------
    val t1 = Maintenance.pipelineTick(s, roots, policy = noSplit)
      .collect().map(r => (r.getString(1), r.getBoolean(4)))
    assert(t1.forall(_._2), t1.mkString(";")) // every action performed
    checkAll("post-tick", docs1, refs1, vecs1)
    Seq("exact", "minhash", "ann", "anchor", "bloomsh", "docstore",
      "refstore", "vecstore").foreach(k =>
      assert(!fs.exists(hp(s"$root/$k/_tombstones")),
        s"$k has pending residue after the soak's first tick"))
    // ---- ONE Takedown call (rebuilds the aggregate kinds itself) -----
    val rep = Takedown(Seq(8L, 25L).toDF("id"), roots).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(rep.forall(x => x._2 == "tombstoned" || x._2 == "rebuilt"),
      rep.mkString(";"))
    val docs2 = docs1.filter(!col("doc_id").isin(8L, 25L))
    val refs2 = refs1.filter(!col("doc_id").isin(8L, 25L))
    val vecs2 = vecs1.filter(!col("vec_id").isin(8L, 25L))
    checkAll("post-takedown", docs2, refs2, vecs2)
    // ---- tick absorbs the takedown's row-wise pendings ---------------
    Maintenance.pipelineTick(s, roots, policy = noSplit)
    checkAll("post-takedown-tick", docs2, refs2, vecs2)
    // ---- a new era appends into every surface ------------------------
    DedupIndex.appendToIndex(era, "text", "doc_id", s"$root/exact", "exact")
    DedupIndex.appendToIndex(era, "text", "doc_id", s"$root/minhash",
      "minhash", k = 16, bands = 4, shingleN = 2)
    DedupIndex.appendToIndex(era, "text", "doc_id", s"$root/anchor",
      "anchor", anchorK = 3, anchorW = 4)
    era.write.mode("append").parquet(s"$root/docstore")
    AnnIndex.appendToIvfPqIndex(vecsEra, s"$root/ann", m = 2, dim = 4)
    vecsEra.write.mode("append").parquet(s"$root/vecstore")
    val docs3 = docs2.unionByName(era)
    val vecs3 = vecs2.unionByName(vecsEra)
    checkAll("post-append", docs3, refs2, vecs3)
    // ---- final tick: nothing due beyond (maybe) small-file budgets ---
    val t3 = Maintenance.pipelineTick(s, roots, policy = noSplit)
      .collect().map(r => r.getString(1)).toSet
    assert(t3.subsetOf(Set("healthy", "compact")), t3.mkString(";"))
    checkAll("post-final-tick", docs3, refs2, vecs3)
  }

  test("ANN maintenance between streaming micro-batches (round 18): a " +
      "tick-performed fold + compact mid-stream keeps the checkpoint " +
      "(no replay of the folded batch), the next stream batch lands " +
      "under a fresh id despite the permanent _folded marker, and " +
      "serving equals a fresh build over all admitted survivors") {
    val s = spark; import s.implicits._
    val vecs = (0 until 40).map { i =>
      val a = 2 * math.Pi * i / 40.0
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat,
        (math.cos(3 * a) / 2).toFloat, (math.sin(3 * a) / 2).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = vecs.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cb = Similarity.pqCodebook(vecs, m = 2, seedMod = 11)
    val path = tmp("annmstream"); val srcDir = tmp("annmstream_src")
    val base = vecs.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val sliceA = vecs.filter(pmod(col("vec_id"), lit(5)) === 0 &&
      col("vec_id") < 20)
    val sliceB = vecs.filter(pmod(col("vec_id"), lit(5)) === 0 &&
      col("vec_id") >= 20)
    AnnIndex.writeIvfPqIndex(base, cents, cb, m = 2, dim = 4, path)
    sliceA.coalesce(1).write.mode("append").parquet(srcDir)
    def stream = s.readStream
      .schema(s.read.parquet(srcDir).schema).parquet(srcDir)
    AnnIndex.streamIvfPqIngest(stream, path, m = 2, dim = 4)
    val fs = hp(path).getFileSystem(s.sessionState.newHadoopConf())
    assert(fs.exists(hp(s"$path/codes_stream/ingest_batch=0")))
    // takedown + ONE tick between the micro-batches: fold retires the
    // streamed partition into the base layout, compact applies the
    // deletion — the stream checkpoint (under the index root) and the
    // permanent _folded marker both ride through
    AnnIndex.deleteVectors(Seq(7L).toDF("vec_id"), path)
    val acts = Maintenance.maintenanceTick(s, path,
        policy = Maintenance.TickPolicy(hotFactor = 1000.0))
      .collect().map(r => (r.getString(1), r.getBoolean(4))).toSeq
    assert(acts == Seq(("fold", true), ("compact", true)), acts.mkString(";"))
    assert(!fs.exists(hp(s"$path/codes_stream")))
    // the next batch: NOT a replay of the folded batch 0 (its file is
    // checkpoint-committed), lands under the NEXT batch id, and serves
    sliceB.coalesce(1).write.mode("append").parquet(srcDir)
    AnnIndex.streamIvfPqIngest(stream, path, m = 2, dim = 4)
    assert(fs.exists(hp(s"$path/codes_stream/ingest_batch=1")))
    assert(!fs.exists(hp(s"$path/codes_stream/ingest_batch=0")))
    val fresh = tmp("annmstream_fresh")
    AnnIndex.writeIvfPqIndex(
      base.unionByName(sliceA).unionByName(sliceB)
        .filter(col("vec_id") =!= 7L),
      cents, cb, m = 2, dim = 4, fresh)
    def serve(p: String) = AnnIndex.queryIvfPqIndex(
        vecs.filter(col("vec_id") < 3), p, m = 2, dim = 4, k = 5,
        nProbe = 64)
      .collect().map(_.mkString("|")).toSet
    assert(serve(path) == serve(fresh),
      "mid-stream maintenance diverged from the fresh build")
  }

  test("pipelineTick failure honesty at both levels: an action throw " +
      "becomes <action>_failed, a decision-phase throw tick_failed; " +
      "the other roots' actions still land") {
    val s = spark; import s.implicits._
    val root = tmp("pipefail")
    val corpus = (1L to 12L).map(i => (i, s"isolated doc $i payload"))
      .toDF("doc_id", "text")
    DedupIndex.writeExactIndex(corpus, "text", "doc_id", s"$root/exact")
    DedupIndex.writeAnchorIndex(corpus, "text", "doc_id",
      s"$root/anchor", k = 3, w = 4)
    val del = Seq(5L).toDF("doc_id")
    DedupIndex.deleteDocs(del, s"$root/exact")
    DedupIndex.deleteDocs(del, s"$root/anchor")
    // three failure shapes in one pipeline: a root missing entirely
    // (minhash) fails in its DECISION phase → tick_failed; the
    // anchor's wired doc store is broken so its rebuild ACTION throws
    // → rebuild_failed (per-action honesty — a performed action would
    // stay reported); the "store" root itself exists by then (the
    // failed rebuild's tombstone propagation created its _tombstones
    // dir) but holds no data, so its compact action throws →
    // compact_failed. The exact root's action still lands.
    val report = Maintenance.pipelineTick(s, PipelineRoots(
        exactIndex = Some(s"$root/exact"),
        minhashIndex = Some(s"$root/missing_minhash"),
        anchorIndex = Some(s"$root/anchor"),
        docStore = Some(s"$root/no_such_store")))
      .orderBy("seq").collect()
      .map(r => (r.getString(2), r.getString(1), r.getBoolean(4)))
    assert(report.map(x => (x._1, x._2, x._3)).toSeq == Seq(
      (s"$root/exact", "compact", true),
      (s"$root/missing_minhash", "tick_failed", false),
      (s"$root/anchor", "rebuild_failed", false),
      (s"$root/no_such_store", "compact_failed", false)), report.mkString(";"))
    // the exact root's compaction really landed; the anchor root is
    // still loudly queued (tombstoned, fail-loud on probe)
    val fs = hp(root).getFileSystem(s.sessionState.newHadoopConf())
    assert(!fs.exists(hp(s"$root/exact/_tombstones")))
    assert(fs.exists(hp(s"$root/anchor/_tombstones")))
    val ex = intercept[IllegalArgumentException](
      DedupIndex.duplicateSpansAgainstIndex(corpus.limit(1), "text",
        "doc_id", s"$root/anchor", k = 3, w = 4).count())
    assert(ex.getMessage.contains("rebuild"))
  }
}
