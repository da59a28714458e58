package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale probe: verifies that the documented 100 TB shapes actually
  * scale ~linearly on the only hardware available, catching hidden
  * driver-side or quadratic terms the sf0.1 bench cannot see.
  *
  * Builds an sf1-equivalent dataset by unioning `mult` re-keyed copies of
  * the source tables, then times the most expensive driver queries at
  * both scales and prints wall-time ratios. A shape that is linear in the
  * data should show ratio ≈ mult (modulo fixed per-query overhead, which
  * dominates sub-second queries — compare the expensive rows).
  *
  * Copy construction preserves per-copy statistics instead of cloning
  * rows verbatim:
  *  - documents: every TOKEN gets a copy-suffix, so cross-copy shingle /
  *    n-gram / minhash similarity is ZERO — dedup workloads see a corpus
  *    10× larger with the SAME duplication rate, not 10-way clone
  *    clusters that would inflate candidate pairs quadratically and
  *    measure a different workload;
  *  - events: user ids are re-keyed per copy (10× users, unchanged
  *    per-user event density — sessionize/funnel state bounds hold);
  *  - orders/lineitem: order keys re-keyed per copy, dimension tables
  *    and foreign keys into them unchanged (facts scale, dims don't —
  *    exactly how a warehouse grows);
  *  - embeddings: vec ids re-keyed; vectors perturbed by a tiny
  *    copy-specific offset on one coordinate so IVF centroids see 10×
  *    genuine points rather than 10-way ties.
  *
  * Usage: runMain graft.ScaleProbe [srcDir] [outDir] [mult] [q1,q2,…]
  * (the optional 4th arg restricts the probe to those queries — the
  * 100× runs target the top five rather than re-timing everything).
  * Results land in PLANS.md by hand (see round-10/11 tables).
  */
object ScaleProbe {

  private val probeQueries = Seq(
    "q117_dup_ngrams", "q19_minhash_lsh", "q118_minhash_fused",
    "q78_setjoin_exact", "q90_regional_revenue", "q16_sessionize",
    "q76_funnel", "q23_embed_ivf", "q104_hybrid_rrf", "q18_dedup_exact",
    // round-10 additions: cluster-aware split (rides the q35 cluster
    // pipeline), LM terciles (bounded-domain histogram), tar shard
    // roundtrip (real file I/O per shard)
    "q137_cluster_split", "q138_lm_terciles", "q139_tar_shards",
    "q143_url_dedup", "q144_domain_cap",
    // round-11: q35 moved off blockPairs onto block-scoped LSH — probe
    // the switched shape (and q106 shares the same candidate generator)
    "q35_dedup_clusters", "q145_sparql_negated_set",
    // late round-11: DSIR (two LM joins over the corpus bigram relation),
    // the codec fan-out (q45 is the heaviest decode pipeline), the
    // histogram-path percentiles, and the ORC format roundtrip
    "q148_dsir_resample", "q45_mjpeg_decode",
    "q36_percentiles", "q151_orc_roundtrip",
    // round-12: PageRank joins the 100× shuffle-heavy probe family;
    // ExactSubstr span detection is the newest corpus-wide shuffle shape
    "q85_pagerank", "q162_substring_dedup", "q164_substring_dedup_anchored",
    // round-13: the cut phases (exact and anchored — the anchored one is
    // the 100 TB path and must stay in the anchored-detect cost class),
    // the hot-gram-capped detector, and the two expensive entries the
    // round-12 verdict flagged as still-unprobed
    "q163_substring_cut", "q166_substring_cut_anchored",
    "q165_substring_dedup_capped", "q168_substring_cut_anchored_capped",
    "q106_canonical_keep", "q109_stream_interval_join", "q102_ivf_pq",
    "q169_token_budget_mix", "q170_canonical_keep_lsh",
    // round-14 entries: streaming dedup-ingest (builds its own index per
    // invocation — the probe row includes the build), PQ re-rank, the
    // persisted-ANN serve (fixture cached per dir; IndexProbe has the
    // batch-vs-corpus rows), residual IVF-PQ
    "q174_stream_dedup_ingest", "q175_pq_rerank", "q176_ann_index_serve",
    "q177_ivfpq_residual", "q178_ann_serve_rerank")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft-scaleprobe/sf1"
    val mult = if (args.length > 2) args(2).toInt else 10
    val selected =
      if (args.length > 3) probeQueries.filter(args(3).split(",").toSet)
      else probeQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    if (!new java.io.File(s"$out/_BUILT").exists()) build(spark, src, out, mult)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // one warm-up pass at the small scale amortizes codegen/JIT
    selected.foreach { q =>
      try SparkEntry.queries(q)(spark, src).count()
      catch { case e: Throwable => println(s"WARMUP FAIL $q: ${e.getMessage}") }
    }
    // big-side first-touch warm-up (round 13): the FIRST query against
    // the big build was measured paying ~110 s of page-cache/parquet
    // footer first-read cost that later queries in the same session
    // never see (q164 read 124 s first vs 14 s warm) — touch the two
    // big fact tables once so every probe row is a WARM measurement and
    // rows are comparable regardless of selection order
    Seq("documents", "events", "embeddings", "lineitem").foreach { t =>
      try spark.read.parquet(s"$out/$t.parquet").foreach(_ => ())
      catch { case _: Throwable => () }
    }
    println(f"${"query"}%-22s ${"sf0.1(s)"}%10s ${"big(s)"}%10s ${"ratio"}%8s")
    selected.foreach { q =>
      val fn = SparkEntry.queries(q)
      val tSmall = time(fn(spark, src).count())
      val tBig = time(fn(spark, out).count())
      println(f"$q%-22s $tSmall%10.2f $tBig%10.2f ${tBig / math.max(tSmall, 1e-9)}%8.2f")
    }
    spark.stop()
  }

  /** Write the mult× dataset. Copy 0 is the source verbatim, so sf1
    * results are a strict superset of sf0.1's per-copy structure.
    * (private[graft]: IndexProbe reuses the same build.) */
  private[graft] def build(spark: SparkSession, src: String, out: String,
      mult: Int): Unit = {
    def copies(df: DataFrame)(rekey: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(i => rekey(df, i)).reduce(_ union _)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    copies(docs) { (d, i) =>
      if (i == 0) d
      else d
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10_000_000L))
        // suffix every token — zero cross-copy shingle overlap
        .withColumn("text",
          concat_ws(" ", transform(split(col("text"), "\\s+"),
            t => concat(t, lit(s"x$i")))))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    copies(emb) { (e, i) =>
      if (i == 0) e
      else e
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 10_000_000L))
        .withColumn("embedding", transform(col("embedding"),
          (v, j) => when(j === 0, v + lit(i * 1e-3f)).otherwise(v)))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val events = spark.read.parquet(s"$src/events.parquet")
    copies(events) { (e, i) =>
      if (i == 0) e
      else e
        .withColumn("event_id", col("event_id") + lit(i.toLong * 1_000_000_000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 10_000_000L))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    val orders = spark.read.parquet(s"$src/orders.parquet")
    copies(orders) { (o, i) =>
      if (i == 0) o
      else o.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 1_000_000_000L))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")

    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    copies(lineitem) { (l, i) =>
      if (i == 0) l
      else l.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 1_000_000_000L))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // dimensions unchanged — facts scale, dims don't
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    new java.io.FileOutputStream(s"$out/_BUILT").close()
  }
}
