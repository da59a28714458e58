package graft

import graft.functions.Bloom
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native bloom machinery: mergeable mask aggregate, codegen'd
  * membership probe, and the decontamination operator's exact semantics
  * (including deterministic false positives). */
class BloomSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("bloom_mask_agg sets exactly the given bits; merge ORs partitions") {
    val s = spark; import s.implicits._
    // positions straddling byte/word boundaries, spread over 8 partitions
    // so merge() must combine partial masks
    val pos = Seq(0L, 7L, 8L, 63L, 64L, 1023L)
    val mask = pos.toDF("pos").repartition(8)
      .agg(Bloom.bloom_mask_agg(col("pos"), 1024).as("mask"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(mask.length == 128)
    val setBits = (0 until 1024).filter(p => (mask(p >> 3) & (1 << (p & 7))) != 0)
    assert(setBits == pos.map(_.toInt).sorted)
  }

  test("bloom_contains probes the same layout the aggregate writes") {
    val s = spark; import s.implicits._
    val masked = Seq(5L, 300L).toDF("pos")
      .agg(Bloom.bloom_mask_agg(col("pos"), 512).as("mask"))
    val probes = Seq(5L, 6L, 300L, 299L).toDF("q")
      .crossJoin(masked)
      .select(col("q"), Bloom.bloom_contains(col("mask"), col("q")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(probes == Map(5L -> true, 6L -> false, 300L -> true, 299L -> false))
  }

  test("bloom_mask_agg rejects out-of-range positions loudly") {
    val s = spark; import s.implicits._
    val e = intercept[Exception] {
      Seq(1024L).toDF("pos")
        .agg(Bloom.bloom_mask_agg(col("pos"), 1024).as("mask"))
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("bloomContamination: superset of exact hits, self-reference fully dirty") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f", "ref"), // reference doc: all grams dirty
      (2L, "a b c x y z", "other"), // shares gram "a b c" with the reference
      (3L, "p q r s t u", "other")) // shares nothing (fp possible but
      .toDF("doc_id", "text", "source") // deterministic — asserted below
    val out = Dedup.bloomContamination(docs,
        docs.filter(col("source") === "ref"), "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((4L, 4L))) // 4 grams, all in the mask
    assert(out(2L)._1 == 4L)
    assert(out(2L)._2 >= 1L) // "a b c" must hit; more only via bloom fp
    // doc 3: no shared grams — with 16 set bits in 2^20 the fp chance per
    // gram is ~(16/2^20)^4; any hit here would mean broken position math
    assert(out(3L) == ((4L, 0L)))
  }

  test("sharded bloom index (round 16): no false negatives in any shard " +
      "geometry, and a planted LARGER-than-one-mask reference whose single " +
      "mask false-positives in double-digit % collapses back to near-zero " +
      "when sharded — at an identical pure-batch-scan probe") {
    val s = spark; import s.implicits._
    import graft.operators.DedupIndex
    def tmp(tag: String): String = TempDirs.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_bloomsh_${tag}_${java.util.UUID.randomUUID()}")
    // reference: ~1000 distinct grams; probe: DISJOINT token space, so
    // every reported dirty gram is a false positive by construction.
    // mBits = 4096 models "reference overflowed the mask": single-mask
    // fill ≈ 1 − e^(−4000/4096) ≈ 0.62 → FP ≈ fill⁴ ≈ 15%; 8 shards cut
    // per-shard fill to ≈ 0.115 → FP ≈ 0.02% — the documented 1/shards
    // fill, fill⁴ FP collapse.
    val reference = Seq((1L, (0 until 1002).map(j => s"ref$j").mkString(" ")))
      .toDF("doc_id", "text")
    val probe = (0 until 20).map(i =>
      (100L + i, (0 until 52).map(j => s"novel${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val single = tmp("single"); val sharded = tmp("sharded")
    DedupIndex.writeBloomIndexSharded(reference, "text", "doc_id", single,
      n = 3, shards = 1, mBits = 4096)
    DedupIndex.writeBloomIndexSharded(reference, "text", "doc_id", sharded,
      n = 3, shards = 8, mBits = 4096)
    def fpBp(path: String, shards: Int): Double = {
      val r = DedupIndex.bloomContaminationAgainstShardedIndex(probe,
          "text", "doc_id", path, n = 3, shards = shards, mBits = 4096)
        .agg(sum("n_maybe_dirty"), sum("n_grams")).head()
      r.getLong(0).toDouble * 10000 / r.getLong(1)
    }
    val singleFp = fpBp(single, 1)
    val shardedFp = fpBp(sharded, 8)
    assert(singleFp > 500.0, // the over-full mask IS useless (> 5% FP)
      s"planted overflow should false-positive heavily, got $singleFp bp")
    assert(shardedFp < 100.0, // sharding restores single-digit-% (≪ 1%)
      s"sharded FP should collapse, got $shardedFp bp")
    assert(shardedFp < singleFp / 5)
    // no false negatives in EITHER geometry: the reference probes fully
    // dirty against itself, shard by shard
    for ((p, sh) <- Seq((single, 1), (sharded, 8))) {
      val self = DedupIndex.bloomContaminationAgainstShardedIndex(reference,
          "text", "doc_id", p, n = 3, shards = sh, mBits = 4096)
        .head()
      assert(self.getLong(1) == 1000L && self.getLong(2) == 1000L)
    }
    // parameter validation fires on wrong geometry
    val e = intercept[IllegalArgumentException](
      DedupIndex.bloomContaminationAgainstShardedIndex(probe, "text",
        "doc_id", sharded, n = 3, shards = 4, mBits = 4096).collect())
    assert(e.getMessage.contains("parameter mismatch"))
  }

  test("bloom index APPEND (round 16): OR-merging a new reference slice " +
      "is byte-identical to the one-shot build over the union — single " +
      "and sharded kinds — and fails loudly on wrong geometry or " +
      "tombstones") {
    val s = spark; import s.implicits._
    import graft.operators.DedupIndex
    def tmp(tag: String): String = TempDirs.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_bloomapp_${tag}_${java.util.UUID.randomUUID()}")
    def slice(tag: String, from: Int, until: Int) =
      (from until until).map(i =>
        (i.toLong, (0 until 40).map(j => s"$tag${i}w$j").mkString(" ")))
        .toDF("doc_id", "text")
    val refA = slice("a", 0, 12); val refB = slice("b", 100, 112)
    val union = refA.unionByName(refB)
    // single-mask kind
    val grown = tmp("grown"); val oneshot = tmp("oneshot")
    DedupIndex.writeBloomIndex(refA, "text", "doc_id", grown)
    DedupIndex.appendToBloomIndex(refB, "text", "doc_id", grown)
    DedupIndex.writeBloomIndex(union, "text", "doc_id", oneshot)
    def maskBytes(p: String): Seq[Seq[Byte]] = s.read.parquet(p)
      .collect().map(_.getAs[Array[Byte]]("mask").toSeq).toSeq
    assert(maskBytes(grown) == maskBytes(oneshot))
    // sharded kind: per-shard byte identity
    val grownSh = tmp("grownsh"); val oneshotSh = tmp("oneshotsh")
    DedupIndex.writeBloomIndexSharded(refA, "text", "doc_id", grownSh,
      n = 3, shards = 8, mBits = 4096)
    DedupIndex.appendToBloomIndexSharded(refB, "text", "doc_id", grownSh,
      n = 3, shards = 8, mBits = 4096)
    DedupIndex.writeBloomIndexSharded(union, "text", "doc_id", oneshotSh,
      n = 3, shards = 8, mBits = 4096)
    def shardMasks(p: String): Map[Long, Seq[Byte]] = s.read.parquet(p)
      .collect().map(r => r.getAs[Long]("shard") ->
        r.getAs[Array[Byte]]("mask").toSeq).toMap
    assert(shardMasks(grownSh) == shardMasks(oneshotSh))
    assert(shardMasks(grownSh).nonEmpty)
    // wrong geometry fails loudly before touching the masks
    val eGeo = intercept[IllegalArgumentException](
      DedupIndex.appendToBloomIndexSharded(refB, "text", "doc_id",
        grownSh, n = 3, shards = 4, mBits = 4096))
    assert(eGeo.getMessage.contains("parameter mismatch"))
    // a tombstoned mask cannot be appended to (bits are shared)
    DedupIndex.deleteDocs(Seq(0L).toDF("doc_id"), grown)
    val eTs = intercept[IllegalArgumentException](
      DedupIndex.appendToBloomIndex(refB, "text", "doc_id", grown))
    assert(eTs.getMessage.contains("tombstones"))
  }
}
