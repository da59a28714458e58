package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard source/sink: training corpora for
  * multimodal/LLM loaders ship as directories of `shard-NNNNN.tar`
  * archives whose entries are the samples (the WebDataset convention —
  * sequential reads, loader-friendly, object-store-native). This is the
  * interchange format between this engine's curation output and a
  * training job's data loader.
  *
  * The codec is a REAL byte-level ustar implementation (same house rule
  * as the PNG/JPEG/WAV decoders — no external libs, every byte
  * accounted for): 512-byte headers with octal size/checksum fields,
  * data padded to block size, two zero blocks at end-of-archive.
  * Deterministic output: fixed mode/uid/gid/mtime, entries written in
  * the caller's sort order — byte-identical shards across runs, so
  * shard-level checksums are reproducible corpus fingerprints.
  *
  * Scale shape: `write` repartitions by shard id (one shuffle of the
  * payload), assembles each shard IN ORDER within its partition — one
  * shard's bytes in memory at a time, never a partition's — and streams
  * it to the target filesystem via the Hadoop FS API (works on any
  * Hadoop-supported store). `read` uses Spark's binaryFile source (one
  * task per shard, whole-archive parse — tar has no internal index, so
  * whole-file is the honest unit) and flatMaps the pure parser.
  *
  * Robustness (RobustnessSpec house rule: return, never throw): a
  * malformed header or truncated archive stops the parse at the last
  * well-formed entry — corrupt shards yield their valid prefix.
  */
object TarShards {

  private val Block = 512

  /** One ustar header block. `name` must fit the classic 100-byte name
    * field (shard entry names are generated ids — enforce, don't split
    * into prefix fields). */
  private def header(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100,
      s"tar entry name exceeds 100 bytes: $name")
    val h = new Array[Byte](Block)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644\u0000") // mode
    put(108, "0000000\u0000") // uid
    put(116, "0000000\u0000") // gid
    put(124, f"$size%011o\u0000") // size, octal
    put(136, "00000000000\u0000") // mtime 0: deterministic archives
    put(148, "        ") // chksum field = spaces while summing
    h(156) = '0' // typeflag: regular file
    put(257, "ustar\u0000" + "00") // magic + version
    val sum = h.map(_ & 0xff).sum
    put(148, f"$sum%06o\u0000 ")
    h
  }

  /** Assemble one tar archive from (name, bytes) entries — pure. */
  def tarBytes(entries: Iterator[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      out.write(header(name, data.length.toLong))
      out.write(data)
      val pad = (Block - data.length % Block) % Block
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * Block)) // end-of-archive
    out.toByteArray
  }

  /** Parse a tar archive to (name, bytes) entries — pure, total: stops
    * at end-of-archive, a malformed header, or truncation (returning the
    * valid prefix), never throws. */
  def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
    var off = 0
    var done = false
    while (!done && off + Block <= bytes.length) {
      val h = java.util.Arrays.copyOfRange(bytes, off, off + Block)
      if (h.forall(_ == 0)) done = true // end-of-archive marker
      else {
        val stored = new String(h, 148, 8, "UTF-8")
          .takeWhile(c => c >= '0' && c <= '7')
        val computed = {
          val withSpaces = h.clone()
          java.util.Arrays.fill(withSpaces, 148, 156, ' '.toByte)
          withSpaces.map(_ & 0xff).sum
        }
        val sizeStr = new String(h, 124, 12, "UTF-8")
          .takeWhile(c => c >= '0' && c <= '7')
        val ok = stored.nonEmpty && sizeStr.nonEmpty &&
          java.lang.Long.parseLong(stored, 8) == computed
        if (!ok) done = true // malformed header: keep the valid prefix
        else {
          val size = java.lang.Long.parseLong(sizeStr, 8)
          val name = new String(h, 0, 100, "UTF-8").takeWhile(_ != '\u0000')
          val dataEnd = off + Block + size
          if (size < 0 || dataEnd > bytes.length) done = true // truncated
          else {
            out += ((name,
              java.util.Arrays.copyOfRange(bytes, off + Block, dataEnd.toInt)))
            off = (dataEnd + ((Block - size % Block) % Block)).toInt
          }
        }
      }
      if (!done && off < 0) done = true
    }
    out.toSeq
  }

  /** Write (shardCol: long, nameCol: string, bytesCol: binary) rows as
    * `outDir/shard-NNNNNNN.tar`, entries sorted by name within each
    * shard. Returns the number of shards written. */
  def write(df: DataFrame, shardCol: String, nameCol: String,
      bytesCol: String, outDir: String): Long = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(shardCol).cast("long").as("_s"), col(nameCol).as("_n"),
        col(bytesCol).as("_b"))
      // negative ids would format as "shard--0000001.tar" and break the
      // reader's name convention — fail loudly at the first offender
      .withColumn("_s", when(col("_s") < 0, raise_error(concat(
        lit("negative shard id: "), col("_s")))).otherwise(col("_s")))
      .repartition(col("_s"))
      .sortWithinPartitions("_s", "_n")
      .mapPartitions { it =>
        // consecutive rows share a shard (sorted); assemble one shard at
        // a time so memory is bounded by the largest SHARD, not partition
        val buffered = it.buffered
        val counts = scala.collection.mutable.ArrayBuffer[Long]()
        while (buffered.hasNext) {
          val shard = buffered.head.getLong(0)
          val entries = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
          while (buffered.hasNext && buffered.head.getLong(0) == shard) {
            val r = buffered.next()
            entries += ((r.getString(1), r.getAs[Array[Byte]](2)))
          }
          val path = new org.apache.hadoop.fs.Path(outDir, f"shard-$shard%07d.tar")
          val fs = path.getFileSystem(conf.value)
          val os = fs.create(path, true)
          try os.write(tarBytes(entries.iterator)) finally os.close()
          counts += 1L
        }
        counts.iterator
      }(org.apache.spark.sql.Encoders.scalaLong)
      .collect().sum // one small count per task, not data
  }

  /** Read a directory/glob of tar shards → (shard_file, name, content)
    * rows, one task per shard via the binaryFile source. */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val fname = path.substring(path.lastIndexOf('/') + 1)
        parseTar(bytes).map { case (n, b) => (fname, n, b) }
      }
      .toDF("shard_file", "name", "content")
  }
}
