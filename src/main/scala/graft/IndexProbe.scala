package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 probes for the two scale claims the round-13 verdict asked
  * to MEASURE rather than argue:
  *
  *  1. **Persisted-index batch queries are ∝ batch, not corpus**: a
  *     FIXED batch (the sf0.1 batch split) queries the anchor and
  *     minhash indexes built over the 1× corpus and the 10× corpus
  *     (ScaleProbe's token-suffixed build — zero cross-copy overlap, so
  *     the batch's true match set is identical at both scales). Flat
  *     batch-query wall across the two index scales is the claim; the
  *     index BUILD is expected ∝ corpus and is reported for honesty.
  *
  *  2. **tokenBudgetSelect's two-phase prefix sum bounds the per-task
  *     row count under a planted mega-source**: half the 10× corpus is
  *     relabeled into ONE source; the probe reports the largest
  *     (partition, source) window cell the two-phase plan actually
  *     created vs the mega-source's total rows (what a PARTITION BY
  *     source window would put in one task), plus wall time.
  *
  * Usage: runMain graft.IndexProbe [srcDir] [bigDir] [mult]
  * Results land in PLANS.md by hand (round-14 table).
  */
object IndexProbe {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val big = if (args.length > 1) args(1) else "/tmp/graft-scaleprobe/sf1"
    val mult = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    if (!new java.io.File(s"$big/_BUILT").exists())
      ScaleProbe.build(spark, src, big, mult)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val docs1 = spark.read.parquet(s"$src/documents.parquet")
    val docsN = spark.read.parquet(s"$big/documents.parquet")
    // the FIXED batch: sf0.1's batch split, identical in every row
    val batch = docs1.filter(pmod(col("doc_id"), lit(5)) === 0)
      .localCheckpoint() // pin: batch derivation must not re-read at probe time
    println(s"fixed batch docs = ${batch.count()}")

    println(f"${"index"}%-14s ${"corpus"}%8s ${"build(s)"}%9s " +
      f"${"q1st(s)"}%8s ${"qwarm(s)"}%9s ${"rows"}%8s")
    Seq(("1x", docs1), (s"${mult}x", docsN)).foreach { case (tag, docs) =>
      val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val nCorpus = corpus.count()
      // ---- anchor index
      val aPath = TempDirs.register(s"/tmp/graft-indexprobe/anchor-$tag")
      val aBuild = time(operators.DedupIndex.writeAnchorIndex(
        corpus, "text", "doc_id", aPath, k = 3, w = 4))
      def aQuery() = operators.DedupIndex.duplicateSpansAgainstIndex(
        batch, "text", "doc_id", aPath, k = 3, w = 4)
      var aRows = 0L
      val a1 = time { aRows = aQuery().count() }
      val aW = time(aQuery().count())
      println(f"anchor$tag%-14s $nCorpus%8d $aBuild%9.1f $a1%8.2f $aW%9.2f $aRows%8d")
      // ---- minhash index
      val mPath = TempDirs.register(s"/tmp/graft-indexprobe/minhash-$tag")
      val mBuild = time(operators.DedupIndex.writeMinHashIndex(
        corpus, "text", "doc_id", mPath, k = 64, bands = 16))
      def mQuery() = operators.DedupIndex.minhashCandidatesAgainstIndex(
        batch, "text", "doc_id", mPath, k = 64, bands = 16)
      var mRows = 0L
      val m1 = time { mRows = mQuery().count() }
      val mW = time(mQuery().count())
      println(f"minhash$tag%-13s $nCorpus%8d $mBuild%9.1f $m1%8.2f $mW%9.2f $mRows%8d")
      // ---- exact index + admission (round 15: q173/q174 shapes)
      val ePath = TempDirs.register(s"/tmp/graft-indexprobe/exact-$tag")
      val eBuild = time(operators.DedupIndex.writeExactIndex(
        corpus, "text", "doc_id", ePath))
      def eQuery() = operators.DedupIndex.admitAgainstIndex(
        batch, "text", "doc_id", ePath)
      var eRows = 0L
      val e1 = time { eRows = eQuery().count() }
      val eW = time(eQuery().count())
      println(f"exact$tag%-15s $nCorpus%8d $eBuild%9.1f $e1%8.2f $eW%9.2f $eRows%8d")
      // ---- near-dup admission (round 15: q180 shape — LSH probe +
      // doc-store text fetch ∝ candidates + exact-Jaccard verify). The
      // doc store is corpus-sized to WRITE (build cost, honest) but the
      // admission only FETCHES candidate texts from it.
      val dPath = TempDirs.register(s"/tmp/graft-indexprobe/docstore-$tag")
      val dBuild = time(corpus.select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(dPath))
      def ndQuery() = operators.DedupIndex.admitNearDupAgainstIndex(
        batch, "text", "doc_id", mPath, dPath, k = 64, bands = 16)
      var ndRows = 0L
      val nd1 = time { ndRows = ndQuery().count() }
      val ndW = time(ndQuery().count())
      println(f"neardup$tag%-13s $nCorpus%8d $dBuild%9.1f $nd1%8.2f $ndW%9.2f $ndRows%8d")
      // ---- persisted bloom mask (round 15: q182 shape — the probe is a
      // pure batch scan at ANY reference size; build ∝ reference)
      val bPath = TempDirs.register(s"/tmp/graft-indexprobe/bloom-$tag")
      val bBuild = time(operators.DedupIndex.writeBloomIndex(
        docs.filter(col("source") === "src0"), "text", "doc_id", bPath))
      def bQuery() = operators.DedupIndex.bloomContaminationAgainstIndex(
        batch, "text", "doc_id", bPath)
      var bRows = 0L
      val b1 = time { bRows = bQuery().count() }
      val bW = time(bQuery().count())
      println(f"bloom$tag%-15s $nCorpus%8d $bBuild%9.1f $b1%8.2f $bW%9.2f $bRows%8d")
      // ---- SHARDED bloom mask (round 16: q189 shape — the scale path
      // for references that overflow one mask). Claim: the probe stays
      // a pure batch scan; 8× the mask bytes broadcast changes nothing
      // measurable vs the single-mask row above.
      val bsPath = TempDirs.register(s"/tmp/graft-indexprobe/bloomsh-$tag")
      val bsBuild = time(operators.DedupIndex.writeBloomIndexSharded(
        docs.filter(col("source") === "src0"), "text", "doc_id", bsPath,
        n = 3, shards = 8))
      def bsQuery() = operators.DedupIndex.bloomContaminationAgainstShardedIndex(
        batch, "text", "doc_id", bsPath, n = 3, shards = 8)
      var bsRows = 0L
      val bs1 = time { bsRows = bsQuery().count() }
      val bsW = time(bsQuery().count())
      println(f"bloomsh8$tag%-12s $nCorpus%8d $bsBuild%9.1f $bs1%8.2f $bsW%9.2f $bsRows%8d")
      // ---- backfill fallback differential (round 16): the SAME exact
      // admission forced through the shuffle path (maxBroadcastBytes=0)
      // — the memory-bounded plan a backfill-sized batch takes
      // automatically. The daily-batch premium it pays (index shuffles
      // on the key instead of streaming) is the honest cost; the point
      // is it exists and is byte-identical, not that it is faster.
      // try/finally (round 17, ADVICE): a throwing probe must not leave
      // the forced shuffle conf on the shared session — every later
      // probe in the run would silently measure the shuffle plan
      spark.conf.set(operators.DedupIndex.MaxBroadcastBytesKey, "0")
      val eShuf =
        try time(eQuery().count())
        finally spark.conf.unset(operators.DedupIndex.MaxBroadcastBytesKey)
      println(f"exact-shufmode$tag%-6s $nCorpus%8d admit-warm(shuffle-path)=$eShuf%6.2f s" +
        f"  (broadcast-path above: ${eW}%.2f s)")
      // ---- pipelineTick dry-run decision (round 18): ONE call plans
      // the whole dedup-family pipeline — six roots, every one carrying
      // a pending 2%-of-corpus deletion. Claim: pipeline scope adds
      // SEQUENCING only — the decision wall is the sum of the per-root
      // metadata-bound reads (describe listings over compaction-bounded
      // file counts + deletions-sized tombstone counts), flat vs corpus
      // bytes. Performed actions cost what their own ops cost (the
      // build/compact/rebuild rows of this probe and PLANS.md).
      val rPath = TempDirs.register(s"/tmp/graft-indexprobe/refstore-$tag")
      docs.filter(col("source") === "src0").select("doc_id", "text")
        .write.mode("overwrite").parquet(rPath)
      val delIds = docs.filter(pmod(col("doc_id"), lit(50)) === 9)
        .select("doc_id").localCheckpoint()
      Seq(ePath, mPath, aPath, bsPath, dPath, rPath)
        .foreach(p => operators.DedupIndex.deleteDocs(delIds, p))
      var pipePlan = ""
      val pipeT = time { pipePlan = operators.Maintenance.pipelineTick(
          spark, operators.PipelineRoots(
            exactIndex = Some(ePath), minhashIndex = Some(mPath),
            anchorIndex = Some(aPath), bloomIndex = Some(bsPath),
            docStore = Some(dPath), refStore = Some(rPath)),
          dryRun = true).collect()
          .map(r => s"${r.getString(2).split('/').last.takeWhile(_ != '-')}:" +
            s"${r.getString(1)}")
          .mkString(" ") }
      println(f"pipe-tick$tag%-11s $nCorpus%8d dry-run-decision=$pipeT%6.2f s " +
        f"($pipePlan)")
    }

    // ---- ANN index: serve a FIXED query batch against 1x and 10x
    // indexes (round 14, q176). Serving is expected ∝ probed lists —
    // with the √N nlist each list is ~√N vectors, so ~√mult growth
    // (≈3.2× at 10×), vs the corpus-linear re-encode the in-memory
    // operator pays per run. Build is ∝ corpus (reported for honesty).
    val emb1 = spark.read.parquet(s"$src/embeddings.parquet")
    val embN = spark.read.parquet(s"$big/embeddings.parquet")
    val qBatch = emb1.filter(col("vec_id") < 8).localCheckpoint()
    Seq(("1x", emb1), (s"${mult}x", embN)).foreach { case (tag, emb) =>
      val nCorpus = emb.count()
      val cents = emb.filter(
          pmod(col("vec_id"), lit(operators.Similarity.autoCentroidMod(emb))) === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val cb = operators.Similarity.pqCodebook(emb, m = 8)
      val vPath = TempDirs.register(s"/tmp/graft-indexprobe/ann-$tag")
      val vBuild = time(operators.AnnIndex.writeIvfPqIndex(
        emb, cents, cb, m = 8, dim = 64, vPath, twoLevel = true))
      def vQuery() = operators.AnnIndex.queryIvfPqIndex(
        qBatch, vPath, m = 8, dim = 64, k = 5, nProbe = 2, twoLevel = true)
      var vRows = 0L
      val v1 = time { vRows = vQuery().count() }
      val vW = time(vQuery().count())
      println(f"ann$tag%-14s $nCorpus%8d $vBuild%9.1f $v1%8.2f $vW%9.2f $vRows%8d")
      // ---- ANN append (round 15, q179): a FIXED batch (sf0.1's 20%
      // split, ids shifted clear of every corpus scale) encoded against
      // the PERSISTED centroids/codebook and appended into codes/cid=.
      // Claim: append wall ∝ batch (flat across index scales — only the
      // √N centroid read grows), and warm serving is unchanged after
      // the append (the probe set prunes to the same lists; the
      // appended lists grow by batch/nlist rows each).
      val aBatchAnn = emb1.filter(pmod(col("vec_id"), lit(5)) === 0)
        .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
        .localCheckpoint()
      val nAppend = aBatchAnn.count()
      val apT = time(operators.AnnIndex.appendToIvfPqIndex(
        aBatchAnn, vPath, m = 8, dim = 64, twoLevel = true))
      val vWa = time(vQuery().count())
      println(f"ann-append$tag%-7s $nCorpus%8d batch=$nAppend%7d " +
        f"append=$apT%6.2f s  warm-serve-after=$vWa%6.2f s")
      // ---- embedding near-dup admission (round 15: q185 shape —
      // shortlist serve + exact top-1 re-score on the raw store; cost ∝
      // batch × probed fraction, the store touched only at shortlist ids)
      val admBatch = emb1.filter(col("vec_id") < 8)
        .select((col("vec_id") + 2000000000L).as("vec_id"), col("embedding"))
        .localCheckpoint()
      def admQuery() = operators.AnnIndex.admitEmbeddingsAgainstIndex(
        admBatch, emb, vPath, m = 8, dim = 64, shortK = 20, nProbe = 2,
        twoLevel = true, tauBp = 9990L)
      val ad1 = time(admQuery().count())
      val adW = time(admQuery().count())
      println(f"ann-admit$tag%-8s $nCorpus%8d admit1st=$ad1%6.2f s  " +
        f"admit-warm=$adW%6.2f s")
      // ---- list-balance report (round 16: the drift monitor). Claim:
      // footer-scale — the aggregation reads only the cid partition
      // column, so its wall tracks FILE COUNT, not corpus bytes (report
      // the full-codes data-scan wall for contrast).
      var nLists = 0L
      val balT = time { nLists =
        operators.AnnIndex.listBalanceReport(spark, vPath).count() }
      val scanT = time(spark.read.parquet(s"$vPath/codes")
        .agg(sum(col("code"))).head())
      println(f"ann-balance$tag%-6s $nCorpus%8d report=$balT%6.2f s " +
        f"($nLists lists)  vs codes data-scan=$scanT%6.2f s")
      // ---- FOOTER-metadata balance report (round 17): per-list counts
      // from parquet row-group metadata, no Spark scan machinery.
      // Claim: inverts the round-16 honest negative — cheap at ANY file
      // granularity, beating both the scan report and the data scan
      // even over this probe's many tiny files.
      var nListsF = 0L
      val balF = time { nListsF =
        operators.AnnIndex.listBalanceReportFromFooters(spark, vPath)
          .count() }
      println(f"ann-balancefoot$tag%-2s $nCorpus%8d footer-report=$balF%6.2f s " +
        f"($nListsF lists)  vs scan-report=$balT%6.2f s, data-scan=$scanT%6.2f s")
      // ---- hot-list split (round 17): a FIXED 2000-copy drift clump
      // planted into one list of a fresh single-level index, then
      // splitHotLists at the 4x budget. Claim: split wall ∝ the HOT
      // LIST (plant-sized at every scale), NOT the corpus — the flat
      // row as the corpus grows 10x/100x is the point. Build reported
      // for honesty; the split's own report/detection is the footer
      // read probed above.
      val sPath = TempDirs.register(s"/tmp/graft-indexprobe/annsplit-$tag")
      val sStore = TempDirs.register(s"/tmp/graft-indexprobe/annsplit-store-$tag")
      val sBuild = time(operators.AnnIndex.writeIvfPqIndex(
        emb, cents, cb, m = 8, dim = 64, sPath, twoLevel = false))
      val plant = spark.range(2000)
        .select((col("id") + 3000000000L).as("vec_id"))
        .crossJoin(broadcast(emb1.filter(col("vec_id") === 0)
          .select(col("embedding"))))
      operators.AnnIndex.appendToIvfPqIndex(plant, sPath, m = 8, dim = 64)
      emb.select(col("vec_id"), col("embedding"))
        .unionByName(plant.select(col("vec_id"), col("embedding")))
        .write.mode("overwrite").parquet(sStore)
      // moved volume printed WITH the wall: the multiplied synthetic
      // table carries natural list skew of its own at Nx (duplicated
      // embeddings concentrate), so several lists may trip the budget
      // beyond the planted clump — the honest claim is wall ∝ REWRITTEN
      // list volume, which the row itself evidences
      var nChildren = 0L; var movedRows = 0L
      val splitT = time {
        val rep = operators.AnnIndex.splitHotLists(
          spark, sStore, sPath, m = 8, dim = 64, hotFactorBp = 40000L,
          splitInto = 2).collect()
        nChildren = rep.length.toLong
        movedRows = rep.map(_.getLong(2)).sum
      }
      println(f"ann-split$tag%-8s $nCorpus%8d build=$sBuild%6.2f s  " +
        f"split=$splitT%6.2f s ($nChildren children, $movedRows code rows " +
        "moved; 2000-row clump planted)")
      // ---- stream-fold (round 17): ingest a fixed 400-vector batch
      // through the streaming encode, then fold it into the base
      // layout. The fold is a compaction-class op — one full codes
      // rewrite — so its wall is expected ∝ corpus; the claim worth
      // checking is that it stays a plain partitioned rewrite (no
      // blow-up beyond the build row above) and serving afterwards is
      // the single-branch plan.
      val fBatch = emb1.filter(col("vec_id") >= 1600)
        .select((col("vec_id") + 4000000000L).as("vec_id"), col("embedding"))
      operators.AnnIndex.ingestVecBatch(fBatch, 0L, sPath, m = 8,
        dim = 64, twoLevel = false, "vec_id", "embedding")
      val foldT = time(operators.AnnIndex.foldStreamIntoCodes(spark, sPath))
      val servedF = time(operators.AnnIndex.queryIvfPqIndex(
        qBatch, sPath, m = 8, dim = 64, k = 5, nProbe = 2,
        twoLevel = false).count())
      println(f"ann-fold$tag%-9s $nCorpus%8d fold=$foldT%6.2f s  " +
        f"serve-after=$servedF%6.2f s (single-branch)")
      // ---- tombstone serving overhead (round 16): 1%% of vectors
      // deleted → serving adds ONE broadcast anti-join against the
      // deletions-sized set. Claim: warm serve unchanged.
      operators.AnnIndex.deleteVectors(
        emb.filter(pmod(col("vec_id"), lit(100)) === 7).select("vec_id"),
        vPath)
      val vWt = time(vQuery().count())
      println(f"ann-tombserve$tag%-4s $nCorpus%8d warm-serve-with-tombstones=$vWt%6.2f s" +
        f"  (pre-delete warm: ${vWa}%.2f s)")
      // ---- maintenanceTick decision read (round 18): the autopilot's
      // dry-run plan over the tombstoned two-level index. Claim: the
      // DECISION cost is metadata-bound — one recursive listing
      // (describeIndex) + the raw-thrift footer balance report — so its
      // wall tracks file count, never corpus bytes.
      var tickPlan = ""
      val tickT = time { tickPlan = operators.Maintenance.maintenanceTick(
          spark, vPath, dryRun = true).collect()
          .map(_.getString(1)).mkString("+") }
      println(f"ann-tick$tag%-9s $nCorpus%8d dry-run-decision=$tickT%6.2f s " +
        f"(plan: $tickPlan)")
      // ---- TWO-LEVEL hot-list split (round 18): the production-scale
      // geometry gets the local rebalance via the PERSISTED super set.
      // Claim: wall ∝ rewritten list volume (plant-sized clump) plus
      // one nlist × nSupers superMap derivation (planning-scale) — the
      // same flat-at-Nx shape as the single-level ann-split row, on the
      // index whose super routing used to force a full rebuild.
      val plant2 = spark.range(2000)
        .select((col("id") + 5000000000L).as("vec_id"))
        .crossJoin(broadcast(emb1.filter(col("vec_id") === 1)
          .select(col("embedding"))))
      operators.AnnIndex.appendToIvfPqIndex(plant2, vPath, m = 8,
        dim = 64, twoLevel = true)
      // the store must carry every admitted vector: base corpus + the
      // ann-append probe's batch (already in vPath) + this clump
      val tlStore = TempDirs.register(s"/tmp/graft-indexprobe/anntl-store-$tag")
      emb.select(col("vec_id"), col("embedding"))
        .unionByName(aBatchAnn.select(col("vec_id"), col("embedding")))
        .unionByName(plant2.select(col("vec_id"), col("embedding")))
        .write.mode("overwrite").parquet(tlStore)
      var nCh2 = 0L; var moved2 = 0L
      val split2T = time {
        val rep = operators.AnnIndex.splitHotLists(
          spark, tlStore, vPath, m = 8, dim = 64, hotFactorBp = 40000L,
          splitInto = 2).collect()
        nCh2 = rep.length.toLong
        moved2 = rep.map(_.getLong(2)).sum
      }
      val vW2 = time(vQuery().count())
      println(f"ann-tlsplit$tag%-6s $nCorpus%8d split=$split2T%6.2f s " +
        f"($nCh2 children, $moved2 code rows moved; 2000-row clump) " +
        f"warm-serve-after=$vW2%6.2f s")
    }

    // ---- stats refresh ∝ changed fragments (round 15, q184 shape) ----
    // A FIXED daily increment (2000 sf0.1 rows) lands in a 1× and a
    // N× partitioned store: the full (re)build scans the store, the
    // refresh scans only the new fragments — rebuild grows ∝ store,
    // refresh stays flat (listing is metadata-only).
    val ev1 = spark.read.parquet(s"$src/events.parquet")
    val evN = spark.read.parquet(s"$big/events.parquet")
    def asFact(df: org.apache.spark.sql.DataFrame) = df.select(
      col("ts").as("time"), col("value"),
      col("event_type").as("label"), lit("bench").as("collection"),
      format_string("00000000-0000-0000-0000-%012d",
        pmod(col("user_id"), lit(100))).as("uuid"))
    val inc = asFact(ev1.limit(2000)).localCheckpoint()
    Seq(("1x", ev1), (s"${mult}x", evN)).foreach { case (tag, ev) =>
      val store = TempDirs.register(s"/tmp/graft-indexprobe/store-$tag")
      val statsP = s"$store-stats"
      val n = ev.count()
      asFact(ev).repartition(col("uuid")).sortWithinPartitions("uuid", "time")
        .write.mode("overwrite").partitionBy("collection", "uuid")
        .option("maxRecordsPerFile", math.max(10L, n / 100 / 3)).parquet(store)
      val sBuild = time(graft.sources.StatsIndex.build(spark, store, statsP))
      inc.write.mode("append").partitionBy("collection", "uuid").parquet(store)
      val sRefresh = time(
        graft.sources.StatsIndex.refresh(spark, store, statsP))
      val nStats = spark.read.parquet(statsP).count()
      println(f"stats$tag%-15s $n%8d rows  rebuild=$sBuild%6.2f s  " +
        f"refresh(+2000 rows)=$sRefresh%6.2f s  stats_rows=$nStats%6d")
    }

    // ---- mega-source cell bound (two-phase tokenBudgetSelect) --------
    val mega = docsN.withColumn("source",
      when(pmod(col("doc_id"), lit(2)) === 0, lit("megacrawl"))
        .otherwise(col("source")))
    val budgets = mega.groupBy(col("source"))
      .agg(sum(size(split(trim(lower(col("text"))), "\\s+"))
        .cast("long")).as("_toks"))
      .select(col("source"), expr("_toks DIV 3").as("token_budget"))
      .localCheckpoint()
    var selRows = 0L
    val tSel = time { selRows = operators.Sampling.tokenBudgetSelect(
      mega, "text", "doc_id", "source", budgets).count() }
    // the cell relation the two-phase plan windows over: re-derive it the
    // same way (range partition by (source, h, id) → per-(pid, source)
    // counts) and report the worst cell vs what one source-window task
    // would have held
    val nParts = spark.sessionState.conf.numShufflePartitions
    val toks = mega.select(col("source"), col("doc_id"),
        operators.Sampling.hashKey(col("doc_id")).as("_h"))
      .repartitionByRange(nParts, col("source"), col("_h"), col("doc_id"))
      .withColumn("_pid", spark_partition_id())
    val cells = toks.groupBy(col("_pid"), col("source")).count()
    val maxCell = cells.agg(max(col("count"))).head().getLong(0)
    val megaRows = mega.filter(col("source") === "megacrawl").count()
    val totalRows = mega.count()
    println(f"tokenBudgetSelect(mega): ${tSel}%.2f s, kept=$selRows; " +
      f"mega-source rows=$megaRows of $totalRows; " +
      f"largest window cell=$maxCell rows " +
      f"(single-task bound would be $megaRows)")
    spark.stop()
  }
}
