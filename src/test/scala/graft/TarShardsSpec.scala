package graft

import graft.sources.TarShards
import org.scalatest.funsuite.AnyFunSuite

/** WebDataset-style tar shard codec: pure roundtrip over edge sizes,
  * corrupt-input totality, system-tar interop, and the Spark write/read
  * end-to-end. */
class TarShardsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def entry(name: String, n: Int, seed: Int): (String, Array[Byte]) = {
    val rnd = new scala.util.Random(seed)
    val b = new Array[Byte](n); rnd.nextBytes(b); (name, b)
  }

  test("roundtrip: block-boundary sizes, empty entries, binary payloads") {
    val entries = Seq(
      entry("000000000001.bin", 0, 1), // empty
      entry("000000000002.bin", 1, 2),
      entry("000000000003.bin", 511, 3), // one byte short of a block
      entry("000000000004.bin", 512, 4), // exactly one block
      entry("000000000005.bin", 513, 5), // one byte over
      entry("000000000006.bin", 10000, 6))
    val parsed = TarShards.parseTar(TarShards.tarBytes(entries.iterator))
    assert(parsed.map(_._1) == entries.map(_._1))
    parsed.zip(entries).foreach { case ((_, got), (_, want)) =>
      assert(java.util.Arrays.equals(got, want))
    }
  }

  test("corrupt archives yield their valid prefix, never throw") {
    val entries = (1 to 5).map(i => entry(f"$i%012d.bin", 700, i))
    val tar = TarShards.tarBytes(entries.iterator)
    // truncate mid-way through entry 4's data: entries 1-3 survive
    val cut = 3 * (512 + 1024) + 512 + 100
    val truncated = TarShards.parseTar(java.util.Arrays.copyOf(tar, cut))
    assert(truncated.map(_._1) == entries.take(3).map(_._1))
    // flip a byte in entry 3's header checksum region: 1-2 survive
    val flipped = tar.clone()
    flipped(2 * (512 + 1024) + 150) = 'x'.toByte
    assert(TarShards.parseTar(flipped).map(_._1) == entries.take(2).map(_._1))
    // garbage input: empty result, no throw
    assert(TarShards.parseTar(Array.fill(2048)(0x5a.toByte)).isEmpty)
    assert(TarShards.parseTar(Array.emptyByteArray).isEmpty)
  }

  test("randomized roundtrip fuzz: 40 archives of arbitrary entries") {
    val rnd = new scala.util.Random(42)
    (1 to 40).foreach { _ =>
      val entries = (1 to (1 + rnd.nextInt(12))).map { j =>
        entry(f"$j%012d.bin", rnd.nextInt(3000), rnd.nextInt())
      }
      val parsed = TarShards.parseTar(TarShards.tarBytes(entries.iterator))
      assert(parsed.map(_._1) == entries.map(_._1))
      parsed.zip(entries).foreach { case ((_, got), (_, want)) =>
        assert(java.util.Arrays.equals(got, want))
      }
    }
  }

  test("contract violations fail loudly: long names, negative shards") {
    val e = intercept[IllegalArgumentException] {
      TarShards.tarBytes(Iterator(("x" * 101, Array.emptyByteArray)))
    }
    assert(e.getMessage.contains("100 bytes"), e.getMessage)
  }

  test("system tar reads our archives (interop)") {
    val tarBin = Seq("/bin/tar", "/usr/bin/tar").find(p => new java.io.File(p).exists)
    assume(tarBin.isDefined, "no system tar available")
    val entries = (1 to 4).map(i => entry(f"$i%012d.bin", 777 * i, i))
    val dir = java.nio.file.Files.createTempDirectory("graft-tar")
    val f = dir.resolve("a.tar")
    java.nio.file.Files.write(f, TarShards.tarBytes(entries.iterator))
    import scala.sys.process._
    val listed = Seq(tarBin.get, "-tf", f.toString).!!.trim.split("\n").toSeq
    assert(listed == entries.map(_._1))
    // extract and byte-compare every entry
    val xdir = dir.resolve("x")
    java.nio.file.Files.createDirectory(xdir)
    Seq(tarBin.get, "-xf", f.toString, "-C", xdir.toString).!!
    entries.foreach { case (name, bytes) =>
      val got = java.nio.file.Files.readAllBytes(xdir.resolve(name))
      assert(java.util.Arrays.equals(got, bytes), s"extracted bytes differ: $name")
    }
  }

  test("parseTarWithStatus: clean only at a true end-of-archive marker") {
    val entries = (1 to 3).map(i => entry(f"$i%012d.bin", 700, i))
    val tar = TarShards.tarBytes(entries.iterator)
    val (full, fullClean) = TarShards.parseTarWithStatus(tar)
    assert(fullClean && full.map(_._1) == entries.map(_._1))
    // cut at an ENTRY BOUNDARY (no marker): same prefix, but NOT clean —
    // this is exactly the half-written-shard shape the strict reader must
    // refuse (lenient parseTar cannot tell it from a complete archive)
    val boundary = java.util.Arrays.copyOf(tar, 3 * (512 + 1024))
    val (ents, clean) = TarShards.parseTarWithStatus(boundary)
    assert(ents.map(_._1) == entries.map(_._1) && !clean)
    // garbage after the marker: entries intact, not clean
    val dirty = tar.clone(); dirty(tar.length - 1) = 0x7f.toByte
    assert(!TarShards.parseTarWithStatus(dirty)._2)
    assert(TarShards.parseTarWithStatus(dirty)._1.map(_._1) == entries.map(_._1))
  }

  test("strict read fails on a truncated shard; lenient salvages the prefix") {
    val s = spark; import s.implicits._
    val entries = (1 to 4).map(i => entry(f"$i%012d.bin", 600, i))
    val tar = TarShards.tarBytes(entries.iterator)
    val dir = java.nio.file.Files.createTempDirectory("graft-tarstrict")
    // cut mid-entry-3: two complete entries then a torn tail
    java.nio.file.Files.write(dir.resolve("shard-0000000.tar"),
      java.util.Arrays.copyOf(tar, 2 * (512 + 1024) + 512 + 100))
    val e = intercept[org.apache.spark.SparkException] {
      TarShards.read(spark, s"$dir/*.tar").count()
    }
    assert(e.getCause != null || e.getMessage.contains("truncated"),
      s"unexpected failure shape: $e")
    val salvaged = TarShards.read(spark, s"$dir/*.tar", strict = false)
    assert(salvaged.select("name").as[String].collect().sorted.toSeq ==
      entries.take(2).map(_._1))
  }

  test("Spark write/read roundtrip: sharded, sorted, byte-exact") {
    val s = spark; import s.implicits._
    val rows = (1L to 57L).map { i =>
      (i / 10L, f"$i%012d.txt", s"payload number $i with bytes".getBytes("UTF-8"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-tarsp").toString
    val n = TarShards.write(rows.toDF("shard", "name", "bytes"),
      "shard", "name", "bytes", dir)
    assert(n == 6) // shards 0..5
    // atomic commit leaves ONLY the renamed shards — no .inprogress temps
    // (Hadoop RawLocalFileSystem also drops .crc siblings on rename? no —
    // ignore checksum sidecars, they're the local FS's, not ours)
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.endsWith(".crc")).toSeq
    assert(names.count(_.endsWith(".tar")) == 6, names)
    assert(names.forall(_.matches("shard-\\d{7}\\.tar")), names)
    // the STREAMED writer must be byte-identical to the pure codec
    val shard0 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "shard-0000000.tar"))
    val want0 = TarShards.tarBytes(
      rows.filter(_._1 == 0L).sortBy(_._2).map(r => (r._2, r._3)).iterator)
    assert(java.util.Arrays.equals(shard0, want0), "streamed bytes != codec bytes")
    val back = TarShards.read(spark, s"$dir/*.tar").collect()
      .map(r => (r.getString(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8")))
    assert(back.length == 57)
    val byName = back.map(r => r._2 -> (r._1, r._3)).toMap
    rows.foreach { case (sh, name, bytes) =>
      val (file, text) = byName(name)
      assert(file == f"shard-$sh%07d.tar")
      assert(text == new String(bytes, "UTF-8"))
    }
  }
}
