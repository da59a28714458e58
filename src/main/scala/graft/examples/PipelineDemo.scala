package graft.examples

import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable training-data curation pipeline over the driver corpus:
  * normalize → exact dedup → near-dup candidates (MinHash LSH + SimHash) →
  * duplicate-span scan → quality/language filtering → deterministic
  * per-language sampling → embedding near-dup + ANN search → multimodal
  * decode (real PNG/WAV/JPEG/AVI codecs). Prints stage row counts — the
  * "hello world" of the LLM-pipeline operator surface. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[pipeline] input docs: ${docs.count()}")

    val normalized = docs.withColumn("text", TextOps.normalize(col("text")))
    val deduped = Dedup.dropExactDuplicates(normalized, "text", "doc_id")
    println(s"[pipeline] after exact dedup: ${deduped.count()}")

    val minhashPairs = Dedup.ngramJaccard(
      Dedup.minhashCandidates(deduped, "text", "doc_id"), deduped, "text", "doc_id",
      minThetaBp = Some(3000L))
    println(s"[pipeline] minhash near-dup pairs (J>=0.3): ${minhashPairs.count()}")
    val simhashPairs = Dedup.simhashCandidates(deduped, "text", "doc_id", maxDist = 3)
    println(s"[pipeline] simhash near-dup pairs (hamming<=3): ${simhashPairs.count()}")

    // drop the larger id of each near-dup pair
    val dropIds = minhashPairs.select(col("id_b").as("doc_id")).distinct()
    val nearDeduped = deduped.join(dropIds, Seq("doc_id"), "left_anti")
    println(s"[pipeline] after near-dedup: ${nearDeduped.count()}")

    val quality = nearDeduped.select(
      (col("doc_id") +: col("lang") +: col("text") +:
        TextOps.qualityColumns(col("text")).map { case (n, c) => c.as(n) }): _*)
      .withColumn("guessed_lang", TextOps.langId(col("text")))
      .filter(col("n_tokens") >= 10 && col("punct_ratio") <= 0.3)
    println(s"[pipeline] after quality filter: ${quality.count()}")

    // rule-based reject report (Gopher-style bitmask) + PII scrub
    val rules = TextOps.qualityFilter(nearDeduped, "text", "doc_id")
    println(s"[pipeline] rule-filter passes: " +
      s"${rules.filter(col("passes") === 1).count()}/${rules.count()}")
    val scrubbed = quality.withColumn("text", TextOps.redactPii(col("text")))
    println(s"[pipeline] PII-scrubbed docs: ${scrubbed.count()}")

    val sampled = Sampling.perGroup(scrubbed, "lang", "doc_id", n = 25)
    println(s"[pipeline] per-language sample (25/lang): ${sampled.count()}")

    // chunk → pack → shard: the write-side of the curation flow
    val chunks = TextOps.chunkSpans(sampled, "text", "doc_id",
      chunkLen = 64, stride = 48)
    println(s"[pipeline] 64-token chunks (stride 48): ${chunks.count()}")
    val packed = Packing.packSequences(sampled, "text", "doc_id", capacity = 2048)
    println(s"[pipeline] packed sequences: " +
      s"${packed.agg(max(col("seq_id"))).head().getLong(0) + 1}")
    val shards = Packing.shardStats(sampled, "text", "doc_id", nShards = 16)
    println(s"[pipeline] shard manifest rows: ${shards.count()}")
    val mix = Sampling.temperatureMixture(sampled, "lang", budget = 1000L)
    println(s"[pipeline] mixture allocations: " +
      mix.collect().map(r => s"${r.getString(0)}=${r.getLong(3)}").mkString(" "))

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nearDupVecs = Dedup.blockedCosinePairs(emb, "embedding", "vec_id", "label", 0.3)
    println(s"[pipeline] embedding near-dup pairs (label-blocked, cos>=0.3): ${nearDupVecs.count()}")
    val topk = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 4), k = 3)
    println("[pipeline] IVF top-3 neighbors of first 4 vectors:")
    topk.show(12, truncate = false)

    // semantic dedup + int8 compression over the embedding table
    val cents = Similarity.kmeansCentroids(emb, dim = 64, centroidMod = 37, iters = 1)
    val sem = Dedup.semanticDedup(emb, cents, "embedding", "vec_id", threshold = 0.6)
    println(s"[pipeline] SemDeDup drops at cos>=0.6: " +
      s"${sem.filter(col("dropped") === 1).count()}/${sem.count()}")
    val quant = Similarity.quantizeInt8Stats(emb, "embedding", "vec_id")
    println(s"[pipeline] int8 quantization: median err ≈ " +
      s"${quant.agg(expr("percentile(err_bp, 0.5)")).head().get(0)} bp")

    // repeated-substring scan: verbatim shared passages between doc pairs
    val spans = Dedup.duplicateNgramSpans(docs, "text", "doc_id", n = 5,
      maxOccurrences = 10000)
    println(s"[pipeline] duplicate n-gram spans (n=5): ${spans.count()}")

    // ExactSubstr dedup (Lee et al.), the 100 TB configuration: the
    // winnowing-anchored char-span detector with the hot-anchor cap
    // armed, feeding the cut phase — duplicated passages REMOVED from
    // the corpus, not just reported
    val esSpans = TextOps.duplicateSpansAnchoredChars(docs, "text",
      "doc_id", k = 3, w = 4, hotAnchorCap = 1000L)
    val esCut = TextOps.cutSpans(docs, "text", "doc_id", esSpans)
    val cutChars = docs.agg(sum(length(col("text")))).head().getLong(0) -
      esCut.agg(sum(length(col("clean_text")))).head().getLong(0)
    println(s"[pipeline] ExactSubstr anchored cut: " +
      s"${esSpans.count()} spans, $cutChars chars removed")

    // multimodal: real decoders end-to-end (PNG pixels, WAV samples,
    // JPEG entropy pipeline, MJPEG frames)
    val png = Multimodal.pngFeatures(Multimodal.packPng(docs, "doc_id").toDF())
    println(s"[pipeline] PNG decode: ${png.count()} images, " +
      s"Σbytes=${png.agg(sum("sum_bytes")).head().getLong(0)}")
    val wav = Multimodal.wavFeatures(
      Multimodal.packSynthetic(docs, "doc_id", "text").toDF())
    println(s"[pipeline] WAV decode: ${wav.count()} streams")
    val mjpeg = Multimodal.mjpegFrameFeatures(
      Multimodal.packMjpeg(docs.limit(100), "doc_id").toDF())
    println(s"[pipeline] MJPEG decode: ${mjpeg.count()} frames")

    // round-7 additions: profile the input, flag value outliers, rank
    // character-level near-dups, fingerprint images perceptually
    val prof = Profiling.profile(docs, Seq("text", "lang", "source"))
    println("[pipeline] profile: " + prof.collect()
      .map(r => s"${r.getString(0)}(null=${r.getLong(2)},distinct=${r.getLong(3)})")
      .mkString(" "))
    val events = graft.Tables.events(spark, sfDir)
    val anomalies = Events.anomalyReport(events, k = 3)
    println(s"[pipeline] value outliers (>3σ per type): ${anomalies.count()}")
    val editPairs = Dedup.editDistanceNearDup(docs, "text", "doc_id",
      Seq("lang", "source"), maxDist = 40, bandWidth = 64)
    println(s"[pipeline] edit-distance near-dup pairs (d<=40): ${editPairs.count()}")
    val phash = Multimodal.pngPerceptualHashes(
      Multimodal.packPng(docs, "doc_id").toDF())
    println(s"[pipeline] perceptual hashes: ${phash.count()} images, " +
      s"distinct=${phash.toDF().select("ahash_hi", "ahash_lo").distinct().count()}")

    // round-10 additions: leakage-free splits, LM-quality buckets, and
    // the loader-facing interchange formats (tar shards + robust JSONL)
    val comps = Dedup.connectedComponents(docs, "doc_id",
      Dedup.ngramJaccard(
        Dedup.minhashCandidates(docs, "text", "doc_id", k = 64, bands = 16),
        docs, "text", "doc_id", shingleN = 3, minThetaBp = Some(5000L))
        .select("id_a", "id_b"))
    val split = Dedup.clusterAwareSplit(comps).collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}(leaky:${r.getLong(3)})")
    println("[pipeline] cluster-aware split: " + split.mkString(" "))
    val terc = graft.operators.TextOps.scoreTerciles(
      graft.operators.TextOps.bigramLmScores(docs, "text", "doc_id")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "avg_prob_bp"),
      Seq("lang"), "avg_prob_bp")
    println(s"[pipeline] LM terciles: " + terc.groupBy("bucket").count()
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" "))
    val tarDir = graft.TempDirs.create("pipeline-tar")
    val nShards = graft.sources.TarShards.write(
      docs.select(expr("doc_id DIV 50").as("shard"),
        format_string("%012d.txt", col("doc_id")).as("name"),
        col("text").cast("binary").as("bytes")),
      "shard", "name", "bytes", tarDir)
    val tarBack = graft.sources.TarShards.read(spark, s"$tarDir/*.tar").count()
    println(s"[pipeline] tar shards: $nShards written, $tarBack entries read back")
    val jsonlDir = graft.TempDirs.create("pipeline-jsonl")
    docs.write.mode("overwrite").json(jsonlDir)
    val robust = graft.sources.Jsonl.readRobust(spark, jsonlDir, docs.schema)
    println(s"[pipeline] robust JSONL: ${robust.filter(col("_ok")).count()} good, " +
      s"${robust.filter(!col("_ok")).count()} quarantined")
    spark.stop()
  }
}
