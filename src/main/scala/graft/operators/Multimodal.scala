package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-sized batches.
  *
  * Two layers, honestly separated:
  *
  *   - REAL: container-format construction and header parsing. `packSynthetic`
  *     builds deterministic payloads in genuine container formats (PNG
  *     signature+IHDR, JPEG/JFIF marker segments, RIFF WAVE fmt chunk, RIFF
  *     AVI avih header — all public specs), and `sniff` parses them back
  *     byte-by-byte: magic detection, big-endian PNG dims, JPEG SOF segment
  *     walk, little-endian RIFF chunk walk. Construct ∘ parse = identity is
  *     oracle-checkable (the dims/rates derive from the row id).
  *   - STUB: pixel/sample DECODE (`decodeStub`): the image/audio codecs
  *     aren't in this container, so "features" are a deterministic function
  *     of the raw bytes. Swapping in a real decoder replaces only
  *     `decodeStub`'s body; the distributed plumbing is unchanged.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      declared_frames: Int)

  /** Sniffed container metadata (None where the format has no such field). */
  final case class MediaMeta(
      media_id: Long,
      kind: String,
      format: String, // "png" | "jpeg" | "wav" | "avi" | "unknown"
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int],
      channels: Option[Int],
      n_frames: Option[Int],
      n_bytes: Long)

  /** Extracted features per asset (shape of a real decode output). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      content_hash: Long,
      magic: String, // first bytes, hex — format sniffing
      feature: Array[Float]) // stub "embedding" of the payload

  /** Fan a codec stage out to the cluster's parallelism. A CPU-bound
    * encode/decode pipeline must NOT inherit its task count from the file
    * layout of the id relation it happens to read: the id table is tiny
    * (8 bytes/row), so a corpus that fits one parquet file gives the scan
    * ONE partition — and every downstream mapPartitions codec then runs
    * single-core regardless of cluster size (measured at sf0.1: the
    * single-file documents table pinned q42/q45/q94 at cpu_frac ≈ 1).
    * Hash-repartitioning the ids is a negligible shuffle (deterministic,
    * unlike round-robin) that buys full-width codec stages; at 100 TB a
    * real media table spans many splits and this exchange is a no-op-cost
    * insurance, not a tax. */
  private def fanOutIds(df: DataFrame, idCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"))
    ids.repartition(ids.sparkSession.sparkContext.defaultParallelism, col("media_id"))
  }

  /** Build a media table from any table with an id + string column: payload
    * = UTF-8 bytes (stand-in for real image/audio bytes), kind assigned
    * deterministically by id. */
  def packFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      (pmod(col(idCol), lit(48)) + 2).cast("int").as("declared_frames"))

  // --- deterministic metadata derivation (mirrored by the DuckDB oracle) ---
  private[graft] def widthOf(id: Long): Int = (16 + id % 160).toInt
  private[graft] def heightOf(id: Long): Int = (16 + id % 90).toInt
  private def rateOf(id: Long): Int = (8000 * (1 + id % 5)).toInt
  private def channelsOf(id: Long): Int = (1 + id % 2).toInt
  private def framesOf(id: Long): Int = (id % 48 + 2).toInt

  /** Synthetic media assets in REAL container formats, derived
    * deterministically from an id + text column: image ids get PNG (even)
    * or JPEG/JFIF (odd), audio ids RIFF/WAVE, video ids RIFF/AVI; the text
    * bytes ride along as the (uncompressed) payload body. Headers are
    * spec-correct enough for any magic-byte sniffer to parse dimensions /
    * sample rate / frame counts; CRCs and entropy-coded bodies are zeroed
    * (building THOSE needs the codecs this container lacks). */
  def packSynthetic(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    implicit val encIn = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    df.select(col(idCol).cast("long").as("media_id"), col(textCol))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("media_id"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val body = text.getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload = kind match {
          case "image" =>
            if (id % 2 == 0) png(widthOf(id), heightOf(id), body)
            else jpeg(widthOf(id), heightOf(id), body)
          case "audio" => wav(rateOf(id), channelsOf(id), body)
          case _ => avi(widthOf(id), heightOf(id), framesOf(id), body)
        }
        MediaRow(id, kind, payload, framesOf(id))
      }
  }

  // --- byte builders (public container specs) ---
  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** PNG: 8-byte signature, IHDR chunk (13-byte data: width/height BE32,
    * bit depth 8, color type 6), body, IEND. 45 header/trailer bytes. */
  private def png(w: Int, h: Int, body: Array[Byte]): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ ascii("IHDR") ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0) /* CRC zeroed */ ++
      body ++ be32(0) ++ ascii("IEND") ++ be32(0)

  /** JPEG/JFIF: SOI, APP0 (JFIF), SOF0 carrying height/width BE16, body,
    * EOI. 35 header/trailer bytes. */
  private def jpeg(w: Int, h: Int, body: Array[Byte]): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++ ascii("JFIF") ++
      Array[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0) ++
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](1, 1, 0x11, 0) ++
      body ++ Array[Byte](0xff.toByte, 0xd9.toByte)

  /** RIFF/WAVE: RIFF header, 16-byte PCM fmt chunk (channels LE16, sample
    * rate LE32), data chunk. 44 header bytes. */
  private def wav(rate: Int, nch: Int, body: Array[Byte]): Array[Byte] = {
    val blockAlign = nch * 2
    ascii("RIFF") ++ le32(36 + body.length) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(nch) ++ le32(rate) ++
      le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(16) ++
      ascii("data") ++ le32(body.length) ++ body
  }

  /** RIFF/AVI: RIFF header, LIST/hdrl with a 56-byte avih main header
    * (µs-per-frame LE32 at 0, total frames at 16, width at 32, height at
    * 36). 88 header bytes. */
  private def avi(w: Int, h: Int, frames: Int, body: Array[Byte]): Array[Byte] = {
    val avihData =
      le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    ascii("RIFF") ++ le32(4 + 12 + 8 + 56 + body.length) ++ ascii("AVI ") ++
      ascii("LIST") ++ le32(4 + 8 + 56) ++ ascii("hdrl") ++
      ascii("avih") ++ le32(56) ++ avihData ++ body
  }

  // --- sniffers (real byte-level parsers) ---
  private def rdBe32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def rdBe16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def rdLe32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def rdLe16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def fourcc(b: Array[Byte], i: Int, tag: String): Boolean =
    i + 4 <= b.length && tag.indices.forall(j => b(i + j) == tag.charAt(j).toByte)

  /** Parse one payload's container header. Pure function over public
    * format specs; returns format="unknown" (all-None fields) for
    * unrecognized magic rather than throwing — at 100 TB a corrupt file
    * must not kill the stage. */
  def sniffBytes(id: Long, kind: String, b: Array[Byte]): MediaMeta = {
    val none = MediaMeta(id, kind, "unknown", None, None, None, None, None, b.length.toLong)
    if (b.length >= 24 && (b(0) & 0xff) == 0x89 && fourcc(b, 1, "PNG")) {
      // PNG: IHDR is mandated first chunk; width/height at fixed offsets
      if (fourcc(b, 12, "IHDR"))
        none.copy(format = "png",
          width = Some(rdBe32(b, 16)), height = Some(rdBe32(b, 20)))
      else none
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: walk marker segments until a SOF marker carries the dims.
      // Standalone markers (SOI/EOI/RST0-7/TEM) and 0xFF fill bytes carry
      // NO length field — advancing by 2+len over them would misread
      // entropy-coded bytes as a length and walk off into garbage.
      var i = 2
      var out = none.copy(format = "jpeg")
      var found = false
      var ok = true
      while (!found && ok && i + 1 < b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (marker == 0xff) i += 1 // fill byte: resync on the next 0xFF
        else if (isSof) {
          if (i + 9 < b.length) {
            out = out.copy(height = Some(rdBe16(b, i + 5)), width = Some(rdBe16(b, i + 7)))
            found = true
          } else ok = false
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
          i += 2 // standalone: TEM, RST0-7, SOI, EOI — no length segment
        } else if (i + 3 < b.length) {
          val len = rdBe16(b, i + 2)
          if (len < 2) ok = false else i += 2 + len // len includes itself
        } else ok = false
      }
      out
    } else if (fourcc(b, 0, "RIFF") && fourcc(b, 8, "WAVE")) {
      // RIFF/WAVE: chunk-walk to "fmt " (channels LE16 @+2, rate LE32 @+4).
      // Chunk sizes are UNSIGNED le32: a corrupt size like 0xFFFFFFF8 read
      // signed (-8) would advance the cursor by zero or backwards — an
      // infinite executor loop. Mask to long and require strict advance;
      // a failed walk returns the format-only meta (never kills the stage).
      var i = 12L
      var out = none.copy(format = "wav")
      var found = false
      while (!found && i + 8 <= b.length) {
        val sz = rdLe32(b, i.toInt + 4) & 0xFFFFFFFFL
        if (fourcc(b, i.toInt, "fmt ") && i + 16 <= b.length) {
          out = out.copy(channels = Some(rdLe16(b, i.toInt + 10)), sample_rate = Some(rdLe32(b, i.toInt + 12)))
          found = true
        } else i += 8 + sz + (sz & 1)
      }
      out
    } else if (fourcc(b, 0, "RIFF") && fourcc(b, 8, "AVI ")) {
      // RIFF/AVI: find the avih main header (frames @+16, w @+32, h @+36
      // within its data); unsigned sizes + strict advance, as for WAVE
      var i = 12L
      var out = none.copy(format = "avi")
      var found = false
      while (!found && i + 8 <= b.length) {
        if (fourcc(b, i.toInt, "avih") && i + 8 + 56 <= b.length) {
          out = out.copy(n_frames = Some(rdLe32(b, i.toInt + 8 + 16)),
            width = Some(rdLe32(b, i.toInt + 8 + 32)), height = Some(rdLe32(b, i.toInt + 8 + 36)))
          found = true
        } else if (fourcc(b, i.toInt, "LIST")) i += 12 // descend into the list
        else i += 8 + (rdLe32(b, i.toInt + 4) & 0xFFFFFFFFL)
      }
      out
    } else none
  }

  /** Sniff every asset's container header, batch-wise per partition. */
  def sniff(media: DataFrame): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    implicit val encIn = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions(_.map(r => sniffBytes(r.media_id, r.kind, r.payload)))
  }

  /** Per-asset integer-exact PCM sample statistics — the decode output
    * shape for the audio path. All-integer so any engine reproduces the
    * values bit-for-bit (no float accumulation order to worry about). */
  final case class WavFeatures(
      media_id: Long,
      sample_rate: Int,
      channels: Int,
      n_samples: Long, // total s16 samples across channels
      sum_samples: Long, // Σ s          (DC offset · n)
      sum_squares: Long, // Σ s²         (energy; RMS = √(ss/n))
      peak_abs: Int) // max |s|

  /** REAL audio decode: RIFF/WAVE → signed 16-bit little-endian PCM
    * samples → integer-exact stats. Walks the chunk list (unsigned sizes,
    * strict advance — same corrupt-input contract as `sniffBytes`) to the
    * `fmt ` chunk (PCM format 1, 16-bit) and the `data` chunk, then decodes
    * every sample: pure arithmetic over the bytes, no codec library.
    * Returns None for non-WAV, non-PCM16, or corrupt payloads — a corrupt
    * file must not kill the stage. */
  /** Locate the PCM16 payload of a RIFF/WAVE stream: (sample_rate,
    * channels, data byte offset, sample count). The chunk walk (unsigned
    * sizes, strict advance) shared by the whole-stream and per-frame
    * decoders; None for non-WAV / non-PCM16 / corrupt payloads. */
  private def wavPcm(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (!(fourcc(b, 0, "RIFF") && fourcc(b, 8, "WAVE"))) return None
    var i = 12L
    var rate = -1; var nch = -1; var bits = -1; var fmtCode = -1
    var dataOff = -1L; var dataLen = -1L
    while ((dataOff < 0 || rate < 0) && i + 8 <= b.length) {
      val sz = rdLe32(b, i.toInt + 4) & 0xFFFFFFFFL
      if (fourcc(b, i.toInt, "fmt ") && i + 8 + 16 <= b.length) {
        fmtCode = rdLe16(b, i.toInt + 8)
        nch = rdLe16(b, i.toInt + 10)
        rate = rdLe32(b, i.toInt + 12)
        bits = rdLe16(b, i.toInt + 22)
      } else if (fourcc(b, i.toInt, "data")) {
        dataOff = i + 8
        dataLen = math.min(sz, b.length.toLong - dataOff) max 0L
      }
      i += 8 + sz + (sz & 1)
    }
    if (rate <= 0 || nch <= 0 || fmtCode != 1 || bits != 16 || dataOff < 0) None
    else Some((rate, nch, dataOff.toInt, (dataLen / 2).toInt))
  }

  /** Signed 16-bit little-endian sample `k` of a located PCM payload. */
  @inline private def pcm16(b: Array[Byte], off: Int, k: Int): Int =
    (((b(off + 2 * k + 1) & 0xff) << 8) | (b(off + 2 * k) & 0xff)).toShort.toInt

  def decodeWav(id: Long, b: Array[Byte]): Option[WavFeatures] =
    wavPcm(b).map { case (rate, nch, off, n) =>
      var sum = 0L; var ss = 0L; var peak = 0
      var k = 0
      while (k < n) {
        val s = pcm16(b, off, k)
        sum += s; ss += s.toLong * s
        val a = math.abs(s)
        if (a > peak) peak = a
        k += 1
      }
      WavFeatures(id, rate, nch, n.toLong, sum, ss, peak)
    }

  /** Per-frame audio features — one row per fixed-length analysis frame:
    * energy inputs (Σs, Σs²; RMS = √(Σs²/n)), peak amplitude, and the
    * ZERO-CROSSING count (sign changes between consecutive samples inside
    * the frame — the classic voiced/unvoiced/noise discriminator).
    * All-integer so any engine recomputes the values bit-for-bit. */
  final case class WavFrameFeatures(
      media_id: Long,
      frame_index: Int,
      n_samples: Long,
      sum_samples: Long,
      sum_squares: Long,
      peak_abs: Int,
      n_crossings: Long)

  /** Frame-level decode of a RIFF/WAVE payload: the PCM stream cut into
    * `frameLen`-sample frames (last frame ragged). Same corrupt-input
    * contract as `decodeWav` (empty result, never a throw). */
  def decodeWavFrames(
      id: Long, b: Array[Byte], frameLen: Int = 256): Seq[WavFrameFeatures] =
    wavPcm(b) match {
      case None => Seq.empty
      case Some((_, _, off, n)) =>
        val out = Seq.newBuilder[WavFrameFeatures]
        var f = 0
        while (f.toLong * frameLen < n) {
          val s0 = f * frameLen
          val end = math.min(s0 + frameLen, n)
          var sum = 0L; var ss = 0L; var peak = 0; var cross = 0L
          var prev = 0
          var k = s0
          while (k < end) {
            val s = pcm16(b, off, k)
            sum += s; ss += s.toLong * s
            val a = math.abs(s)
            if (a > peak) peak = a
            if (k > s0 && ((prev < 0) != (s < 0))) cross += 1
            prev = s
            k += 1
          }
          out += WavFrameFeatures(id, f, (end - s0).toLong, sum, ss, peak, cross)
          f += 1
        }
        out.result()
    }

  /** Frame-level features for every WAV asset (flatMap — non-audio rows
    * contribute nothing), batch-wise per partition. */
  def wavFrameFeatures(
      media: DataFrame, frameLen: Int = 256): Dataset[WavFrameFeatures] = {
    implicit val enc = Encoders.product[WavFrameFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions(
      _.flatMap(r => decodeWavFrames(r.media_id, r.payload, frameLen)))
  }

  /** Decode every WAV asset's PCM stream, batch-wise per partition;
    * non-audio / undecodable payloads are dropped (flatMap). */
  def wavFeatures(media: DataFrame): Dataset[WavFeatures] = {
    implicit val enc = Encoders.product[WavFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions(_.flatMap(r => decodeWav(r.media_id, r.payload)))
  }

  /** Per-asset integer-exact pixel statistics — the decode output shape
    * for the image path (mirror of `WavFeatures` for audio). All-integer
    * so any engine reproduces the values bit-for-bit. */
  final case class PngFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      n_bytes: Long, // decoded pixel bytes = width·height·4 (RGBA8)
      sum_bytes: Long, // Σ v      over all pixel bytes (0..255)
      sum_squares: Long, // Σ v²
      max_r: Int, // per-channel peak byte value
      max_g: Int,
      max_b: Int,
      max_a: Int)

  private def crc32(parts: Array[Byte]*): Array[Byte] = {
    val c = new java.util.zip.CRC32()
    parts.foreach(c.update(_))
    be32(c.getValue.toInt)
  }

  /** PNG Paeth predictor (PNG spec §9, filter type 4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Build a REAL spec-compliant PNG (decodable by any viewer): RGBA8,
    * deterministic pixel bytes v(y,x) = (id + 7y + 13x) mod 251, each
    * scanline filtered with type y mod 5 (so all five PNG filters are
    * exercised), zlib-deflated IDAT, correct CRC32 on every chunk. The
    * pixel formula is trivially recomputable by any SQL engine, which is
    * what makes the DECODE (inflate + unfilter) oracle-checkable. */
  def pngEncode(id: Long, w: Int, h: Int): Array[Byte] = {
    val stride = w * 4
    val raw = Array.tabulate(h, stride)((y, x) =>
      (((id + 7L * y + 13L * x) % 251L).toInt & 0xff).toByte)
    val filtered = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val ft = y % 5
      filtered(y * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = raw(y)(x) & 0xff
        val left = if (x >= 4) raw(y)(x - 4) & 0xff else 0
        val up = if (y > 0) raw(y - 1)(x) & 0xff else 0
        val ul = if (x >= 4 && y > 0) raw(y - 1)(x - 4) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, ul)
        }
        filtered(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
    }
    // BEST_SPEED: the compression level never reaches the decoded bytes
    // (the oracle sees pixels, not the stream), so pay for the cheapest
    // valid zlib stream
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    deflater.setInput(filtered)
    deflater.finish()
    val buf = new Array[Byte](filtered.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = out.toByteArray
    val ihdrData = be32(w) ++ be32(h) ++ Array[Byte](8, 6, 0, 0, 0)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ ascii("IHDR") ++ ihdrData ++ crc32(ascii("IHDR"), ihdrData) ++
      be32(idat.length) ++ ascii("IDAT") ++ idat ++ crc32(ascii("IDAT"), idat) ++
      be32(0) ++ ascii("IEND") ++ crc32(ascii("IEND"))
  }

  /** REAL image decode: PNG → inflate IDAT (`java.util.zip.Inflater`) →
    * un-apply the five PNG filter types → integer-exact RGBA pixel stats.
    * CRCs are verified chunk by chunk. Returns None for non-PNG, non-RGBA8,
    * interlaced, or corrupt payloads (bad CRC, truncated chunk, short or
    * malformed IDAT stream) — a corrupt file must not kill the stage. */
  /** Inflate + un-filter a PNG into its raw RGBA8 byte grid:
    * (width, height, pixels) with byte (y,x,ch) at pixels(y·4w + 4x + ch).
    * Shared by the stats decoder and the resize transform. Returns None
    * for non-PNG, non-RGBA8, interlaced, or corrupt payloads. */
  private def pngPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 8 || (b(0) & 0xff) != 0x89 || !fourcc(b, 1, "PNG")) return None
    var i = 8
    var w = -1; var h = -1
    var ok = true; var done = false
    val idat = new java.io.ByteArrayOutputStream()
    while (ok && !done && i + 8 <= b.length) {
      val len = rdBe32(b, i).toLong & 0xFFFFFFFFL
      if (i + 12 + len > b.length) ok = false
      else {
        val typ = new String(b, i + 4, 4, "US-ASCII")
        val data = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len.toInt)
        val crcStored = rdBe32(b, i + 8 + len.toInt)
        val c = new java.util.zip.CRC32()
        c.update(b, i + 4, 4 + len.toInt)
        if (c.getValue.toInt != crcStored) ok = false
        else typ match {
          case "IHDR" =>
            if (len != 13) ok = false
            else {
              w = rdBe32(data, 0); h = rdBe32(data, 4)
              // bit depth 8, color type 6 (RGBA), no interlace only
              if (data(8) != 8 || data(9) != 6 || data(12) != 0 ||
                w <= 0 || h <= 0 || w.toLong * h * 4 > Int.MaxValue / 2) ok = false
            }
          case "IDAT" => idat.write(data)
          case "IEND" => done = true
          case _ => () // ancillary chunk: skip
        }
        i += 12 + len.toInt
      }
    }
    if (!ok || !done || w <= 0) return None
    val stride = w * 4
    val expect = h * (1 + stride)
    val inflated = new Array[Byte](expect)
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < expect && !inf.finished()) {
        val n = inf.inflate(inflated, got, expect - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      inf.end()
      if (got != expect) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    // un-filter scanline by scanline into the pixel grid
    val pixels = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = inflated(y * (1 + stride)) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < stride) {
        val f = inflated(y * (1 + stride) + 1 + x) & 0xff
        val left = if (x >= 4) pixels(y * stride + x - 4) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= 4 && y > 0) pixels((y - 1) * stride + x - 4) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, ul)
        }
        pixels(y * stride + x) = ((f + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, pixels))
  }

  def decodePng(id: Long, b: Array[Byte]): Option[PngFeatures] =
    pngPixels(b).map { case (w, h, px) =>
      var sum = 0L; var ss = 0L
      val maxCh = new Array[Int](4)
      var i = 0
      while (i < px.length) {
        val v = px(i) & 0xff
        sum += v; ss += v.toLong * v
        val ch = i & 3
        if (v > maxCh(ch)) maxCh(ch) = v
        i += 1
      }
      PngFeatures(id, w, h, px.length.toLong, sum, ss,
        maxCh(0), maxCh(1), maxCh(2), maxCh(3))
    }

  /** Integer-exact stats of a nearest-neighbor DOWNSAMPLED image — the
    * resize transform of a multimodal pipeline, run on the real decoded
    * pixels: resized pixel (ry, rx) = source pixel (factor·ry, factor·rx),
    * output dims ⌈w/factor⌉ × ⌈h/factor⌉. */
  final case class ResizeFeatures(
      media_id: Long,
      src_w: Int,
      src_h: Int,
      width: Int,
      height: Int,
      n_bytes: Long,
      sum_bytes: Long,
      sum_squares: Long,
      max_px: Int)

  def resizePngStats(id: Long, b: Array[Byte], factor: Int): Option[ResizeFeatures] =
    pngPixels(b).map { case (w, h, px) =>
      val rw = (w + factor - 1) / factor
      val rh = (h + factor - 1) / factor
      var sum = 0L; var ss = 0L; var mx = 0
      var ry = 0
      while (ry < rh) {
        val rowOff = (ry * factor) * w * 4
        var rx = 0
        while (rx < rw) {
          val pOff = rowOff + rx * factor * 4
          var ch = 0
          while (ch < 4) {
            val v = px(pOff + ch) & 0xff
            sum += v; ss += v.toLong * v
            if (v > mx) mx = v
            ch += 1
          }
          rx += 1
        }
        ry += 1
      }
      ResizeFeatures(id, w, h, rw, rh, rh.toLong * rw * 4, sum, ss, mx)
    }

  /** Resize every PNG asset (nearest-neighbor, integer factor), batch-wise
    * per partition; non-PNG / corrupt payloads are dropped. */
  def pngResizeFeatures(media: DataFrame, factor: Int = 2): Dataset[ResizeFeatures] = {
    implicit val enc = Encoders.product[ResizeFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions(
      _.flatMap(r => resizePngStats(r.media_id, r.payload, factor)))
  }

  /** Build one real PNG asset per row (dims derived from the id as in
    * `packSynthetic`), batch-wise per partition. */
  def packPng(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    implicit val encIn = Encoders.scalaLong
    fanOutIds(df, idCol).as[Long].mapPartitions(_.map { id =>
      MediaRow(id, "image", pngEncode(id, widthOf(id), heightOf(id)), framesOf(id))
    })
  }

  /** Decode every PNG asset's pixel stream, batch-wise per partition;
    * non-PNG / undecodable payloads are dropped (flatMap). */
  def pngFeatures(media: DataFrame): Dataset[PngFeatures] = {
    implicit val enc = Encoders.product[PngFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions(_.flatMap(r => decodePng(r.media_id, r.payload)))
  }

  /** Perceptual average-hash of a decoded image, split into two unsigned
    * 32-bit halves (portable: no engine-specific 64-bit sign games). */
  final case class PHashFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      ahash_hi: Long, // bits 32..63 of the 8×8 block-mean hash
      ahash_lo: Long) // bits 0..31

  /** Perceptual average-hash (aHash) over REAL decoded pixels: the image
    * is cut into an 8×8 block grid (block of pixel (y,x) = (8y DIV h,
    * 8x DIV w)), each block's grayscale sum (r+g+b, no division) is
    * compared with the global mean — bit i=8·by+bx is set iff
    * blockSum·totalPixels > totalSum·blockPixels, an EXACT integer
    * cross-multiplication. Brightness-shifted or resized variants of an
    * image keep (nearly) the same 64 bits, so hamming distance over the
    * hash is the image near-dup signal — feed the halves to the same
    * pigeonhole chunk join SimHash uses for text. Decode + hash run
    * executor-side per partition; nothing but (id, dims, 2×32 bits) is
    * ever shuffled. */
  def decodePHash(id: Long, b: Array[Byte]): Option[PHashFeatures] =
    pngPixels(b).map { case (w, h, px) =>
      val bsum = new Array[Long](64)
      val bn = new Array[Long](64)
      var y = 0
      while (y < h) {
        val by = 8 * y / h
        var x = 0
        while (x < w) {
          val o = (y * w + x) * 4
          val s = (px(o) & 0xff) + (px(o + 1) & 0xff) + (px(o + 2) & 0xff)
          val i = by * 8 + 8 * x / w
          bsum(i) += s
          bn(i) += 1
          x += 1
        }
        y += 1
      }
      val tsum = bsum.sum
      val tn = w.toLong * h
      var hi = 0L; var lo = 0L
      var i = 0
      while (i < 64) {
        if (bsum(i) * tn > tsum * bn(i)) {
          if (i >= 32) hi |= 1L << (i - 32) else lo |= 1L << i
        }
        i += 1
      }
      PHashFeatures(id, w, h, hi, lo)
    }

  /** Perceptual-hash every PNG asset, batch-wise per partition;
    * non-PNG / undecodable payloads are dropped (flatMap). */
  def pngPerceptualHashes(media: DataFrame): Dataset[PHashFeatures] = {
    implicit val enc = Encoders.product[PHashFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions(_.flatMap(r => decodePHash(r.media_id, r.payload)))
  }

  /** Per-FRAME integer-exact pixel statistics — the decode output shape
    * for the video path: one row per decoded frame (`sampleFrames`' shape,
    * but over genuinely decoded frame bytes). */
  final case class AviFrameFeatures(
      media_id: Long,
      frame_index: Int,
      n_bytes: Long, // decoded frame bytes = fw·fh·3 (BGR24)
      sum_bytes: Long, // Σ v over the frame's pixel bytes (0..255)
      sum_squares: Long, // Σ v²
      peak: Int) // max byte value in the frame

  /** Frame dimensions derived from the id (small on purpose: frame COUNT ×
    * frame size is the payload driver). */
  private def frameWidthOf(id: Long): Int = (8 + id % 8).toInt
  private def frameHeightOf(id: Long): Int = (6 + id % 6).toInt

  /** Build a REAL RIFF/AVI container with UNCOMPRESSED frames: LIST hdrl
    * carrying a spec-correct avih main header, then LIST movi holding one
    * '00db' (uncompressed DIB) chunk per frame of raw BGR24 bytes
    * v(f,k) = (id + 11f + 5k) mod 241 — odd-sized chunks get the RIFF pad
    * byte. The pixel formula is recomputable by any SQL engine, which
    * makes the frame-walk decode oracle-checkable (same playbook as
    * `pngEncode`/`decodeWav`). */
  def aviEncode(id: Long): Array[Byte] = {
    val nf = framesOf(id)
    val fw = frameWidthOf(id); val fh = frameHeightOf(id)
    val frameBytes = fw * fh * 3
    val out = new java.io.ByteArrayOutputStream()
    (0 until nf).foreach { f =>
      out.write(ascii("00db")); out.write(le32(frameBytes), 0, 4)
      var k = 0
      while (k < frameBytes) {
        out.write((((id + 11L * f + 5L * k) % 241L) & 0xff).toInt)
        k += 1
      }
      if ((frameBytes & 1) == 1) out.write(0) // RIFF chunks are word-aligned
    }
    val movi = out.toByteArray
    val avihData =
      le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(nf) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(fw) ++ le32(fh) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = ascii("LIST") ++ le32(4 + 8 + 56) ++ ascii("hdrl") ++
      ascii("avih") ++ le32(56) ++ avihData
    val moviList = ascii("LIST") ++ le32(4 + movi.length) ++ ascii("movi") ++ movi
    ascii("RIFF") ++ le32(4 + hdrl.length + moviList.length) ++ ascii("AVI ") ++
      hdrl ++ moviList
  }

  /** REAL video decode for uncompressed AVI: walk the RIFF chunk list to
    * LIST/movi, then decode every '00db'/'00dc' frame chunk's raw bytes
    * into per-frame integer-exact stats. Same corrupt-input contract as
    * every walker here (unsigned sizes, strict advance, bounds-checked):
    * a malformed container yields the frames decoded so far and never
    * kills the stage. Entropy-coded (compressed) frame formats remain in
    * `decodeStub` — the codecs aren't in this container. */
  def decodeAviFrames(id: Long, b: Array[Byte]): Seq[AviFrameFeatures] = {
    if (!(fourcc(b, 0, "RIFF") && fourcc(b, 8, "AVI "))) return Seq.empty
    val frames = scala.collection.mutable.ArrayBuffer[AviFrameFeatures]()
    var i = 12L
    var moviEnd = -1L
    var frameIdx = 0
    while (i + 8 <= b.length) {
      val sz = rdLe32(b, i.toInt + 4) & 0xFFFFFFFFL
      if (fourcc(b, i.toInt, "LIST") && i + 12 <= b.length &&
          fourcc(b, i.toInt + 8, "movi")) {
        moviEnd = math.min(i + 8 + sz, b.length.toLong)
        i += 12 // descend into the movi list
      } else if (moviEnd >= 0 && i < moviEnd &&
          (fourcc(b, i.toInt, "00db") || fourcc(b, i.toInt, "00dc"))) {
        val dataOff = (i + 8).toInt
        val dataLen = math.min(sz, b.length.toLong - dataOff).max(0L).toInt
        var sum = 0L; var ss = 0L; var peak = 0
        var k = 0
        while (k < dataLen) {
          val v = b(dataOff + k) & 0xff
          sum += v; ss += v.toLong * v
          if (v > peak) peak = v
          k += 1
        }
        frames += AviFrameFeatures(id, frameIdx, dataLen.toLong, sum, ss, peak)
        frameIdx += 1
        i += 8 + sz + (sz & 1)
      } else i += 8 + sz + (sz & 1)
    }
    frames.toSeq
  }

  /** Per-FRAME decoded-pixel statistics for MOTION-JPEG video. */
  final case class MjpegFrameFeatures(
      media_id: Long,
      frame_index: Int,
      width: Int,
      height: Int,
      n_pixels: Long,
      sum_bytes: Long,
      sum_squares: Long,
      peak: Int)

  private def mjpegWidthOf(id: Long): Int = 8 * (2 + (id % 3).toInt)
  private def mjpegHeightOf(id: Long): Int = 8 * (2 + (id % 2).toInt)

  /** Build a REAL Motion-JPEG AVI: the same RIFF/LIST-movi container as
    * `aviEncode`, but each frame chunk ('00dc', "compressed DIB") holds a
    * genuine baseline JPEG produced by the `Jpeg` encoder. Frame pixels
    * are 8×8-block-constant c(f,bx,by) = (id + 7f + 3bx + 5by) mod 256 —
    * the construction for which the lossy pipeline is bit-exact on decode
    * (see `Jpeg` scaladoc), so per-frame decoded stats are SQL-oracle-able. */
  def mjpegEncode(id: Long): Array[Byte] = {
    val nf = framesOf(id)
    val fw = mjpegWidthOf(id); val fh = mjpegHeightOf(id)
    val out = new java.io.ByteArrayOutputStream()
    (0 until nf).foreach { f =>
      val px = Array.tabulate(fw * fh) { i =>
        val bx = (i % fw) / 8; val by = (i / fw) / 8
        ((id + 7L * f + 3L * bx + 5L * by) % 256L).toInt
      }
      val jpg = Jpeg.encode(px, fw, fh)
      out.write(ascii("00dc")); out.write(le32(jpg.length), 0, 4)
      out.write(jpg)
      if ((jpg.length & 1) == 1) out.write(0)
    }
    val movi = out.toByteArray
    val avihData =
      le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(nf) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(fw) ++ le32(fh) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = ascii("LIST") ++ le32(4 + 8 + 56) ++ ascii("hdrl") ++
      ascii("avih") ++ le32(56) ++ avihData
    val moviList = ascii("LIST") ++ le32(4 + movi.length) ++ ascii("movi") ++ movi
    ascii("RIFF") ++ le32(4 + hdrl.length + moviList.length) ++ ascii("AVI ") ++
      hdrl ++ moviList
  }

  /** REAL Motion-JPEG decode: walk the movi list (same corrupt-safe
    * contract as `decodeAviFrames`), feed every frame chunk through the
    * baseline JPEG decoder, emit per-frame decoded-pixel stats. Frames
    * that fail to decode are skipped (frame_index still counts container
    * chunks, so survivors keep their true position). */
  def decodeMjpegFrames(id: Long, b: Array[Byte]): Seq[MjpegFrameFeatures] = {
    if (!(fourcc(b, 0, "RIFF") && fourcc(b, 8, "AVI "))) return Seq.empty
    val frames = scala.collection.mutable.ArrayBuffer[MjpegFrameFeatures]()
    var i = 12L
    var moviEnd = -1L
    var frameIdx = 0
    while (i + 8 <= b.length) {
      val sz = rdLe32(b, i.toInt + 4) & 0xFFFFFFFFL
      if (fourcc(b, i.toInt, "LIST") && i + 12 <= b.length &&
          fourcc(b, i.toInt + 8, "movi")) {
        moviEnd = math.min(i + 8 + sz, b.length.toLong)
        i += 12
      } else if (moviEnd >= 0 && i < moviEnd &&
          (fourcc(b, i.toInt, "00dc") || fourcc(b, i.toInt, "00db"))) {
        val dataOff = (i + 8).toInt
        val dataLen = math.min(sz, b.length.toLong - dataOff).max(0L).toInt
        Jpeg.decode(java.util.Arrays.copyOfRange(b, dataOff, dataOff + dataLen))
          .foreach { img =>
            var sum = 0L; var ss = 0L; var peak = 0
            var k = 0
            while (k < img.pixels.length) {
              val v = img.pixels(k)
              sum += v; ss += v.toLong * v
              if (v > peak) peak = v
              k += 1
            }
            frames += MjpegFrameFeatures(id, frameIdx, img.width, img.height,
              img.pixels.length.toLong, sum, ss, peak)
          }
        frameIdx += 1
        i += 8 + sz + (sz & 1)
      } else i += 8 + sz + (sz & 1)
    }
    frames.toSeq
  }

  /** Build one real Motion-JPEG AVI asset per row, batch-wise. */
  def packMjpeg(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    implicit val encIn = Encoders.scalaLong
    fanOutIds(df, idCol).as[Long].mapPartitions(_.map { id =>
      MediaRow(id, "video", mjpegEncode(id), framesOf(id))
    })
  }

  /** Decode every Motion-JPEG asset's frames — one row per decoded frame. */
  def mjpegFrameFeatures(media: DataFrame): Dataset[MjpegFrameFeatures] = {
    implicit val enc = Encoders.product[MjpegFrameFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions(_.flatMap(r => decodeMjpegFrames(r.media_id, r.payload)))
  }

  /** Build one real uncompressed-AVI asset per row, batch-wise. */
  def packAvi(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    implicit val encIn = Encoders.scalaLong
    fanOutIds(df, idCol).as[Long].mapPartitions(_.map { id =>
      MediaRow(id, "video", aviEncode(id), framesOf(id))
    })
  }

  /** Decode every AVI asset's frame stream — one output row per frame,
    * generated executor-side (flatMap), no driver loops. */
  def aviFrameFeatures(media: DataFrame): Dataset[AviFrameFeatures] = {
    implicit val enc = Encoders.product[AviFrameFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions(_.flatMap(r => decodeAviFrames(r.media_id, r.payload)))
  }

  /** Per-asset integer-exact grayscale pixel statistics — the decode
    * output shape for the JPEG path. */
  final case class JpegFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      n_pixels: Long,
      sum_bytes: Long, // Σ v over decoded pixels (0..255)
      sum_squares: Long, // Σ v²
      max_px: Int,
      min_px: Int)

  private def jpegWidthOf(id: Long): Int = 8 * (2 + (id % 6).toInt)
  private def jpegHeightOf(id: Long): Int = 8 * (2 + (id % 4).toInt)

  /** Build one REAL baseline JPEG per row: grayscale, 8×8-BLOCK-CONSTANT
    * pixels c(bx,by) = (id + 3bx + 5by) mod 256 — the construction for
    * which the full entropy pipeline (FDCT → unit quant → Huffman) is
    * bit-exact on decode (see `Jpeg` scaladoc), making the decoded stats
    * recomputable by the SQL oracle. */
  def packJpeg(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    implicit val encIn = Encoders.scalaLong
    fanOutIds(df, idCol).as[Long].mapPartitions(_.map { id =>
      val w = jpegWidthOf(id); val h = jpegHeightOf(id)
      val px = Array.tabulate(w * h) { i =>
        val bx = (i % w) / 8; val by = (i / w) / 8
        ((id + 3L * bx + 5L * by) % 256L).toInt
      }
      MediaRow(id, "image", Jpeg.encode(px, w, h), framesOf(id))
    })
  }

  /** Decode every baseline-JPEG asset through the real entropy pipeline
    * (Huffman → dequant → IDCT), batch-wise; undecodable payloads are
    * dropped (flatMap). */
  def jpegFeatures(media: DataFrame): Dataset[JpegFeatures] = {
    implicit val enc = Encoders.product[JpegFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      Jpeg.decode(r.payload).map { img =>
        var sum = 0L; var ss = 0L; var mx = 0; var mn = 255
        var i = 0
        while (i < img.pixels.length) {
          val v = img.pixels(i)
          sum += v; ss += v.toLong * v
          if (v > mx) mx = v
          if (v < mn) mn = v
          i += 1
        }
        JpegFeatures(r.media_id, img.width, img.height,
          img.pixels.length.toLong, sum, ss, mx, mn)
      }
    })
  }

  /** Deterministic stand-in kept ONLY as the generic any-format feature
    * shape (every modality now has a real decoder: `decodePng`,
    * `decodeWav`, `decodeAviFrames`, `Jpeg.decode`); the stub hashes raw
    * bytes so arbitrary unknown formats still flow through the pipeline. */
  private def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    var h = 1125899906842597L // FNV-ish rolling hash of the payload
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
    val feature = Array.tabulate(8) { j =>
      val hj = h ^ (0x9e3779b97f4a7c15L * (j + 1))
      (hj % 1000) / 1000.0f
    }
    MediaFeatures(row.media_id, row.kind, bytes.length.toLong, h, magic, feature)
  }

  /** Decode / feature-extract every asset, batch-wise per partition (the
    * shape a vectorized decode batch would take). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val encIn = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { it => it.map(decodeStub) }
  }

  /** Uniform frame sampling for video assets: every `stride`-th declared
    * frame, as (media_id, frame_index, frame_fp) — generated with a
    * distributed explode, no driver loops. The fingerprint is
    * md5(hex(payload) || '#' || index): engine-portable (any engine with
    * md5+hex reproduces it), unlike xxhash64. */
  def sampleFrames(media: DataFrame, stride: Int = 8): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), col("declared_frames") - 1, lit(stride))).as("frame_index"))
      .select(col("media_id"), col("frame_index"),
        md5(concat(upper(hex(col("payload"))), lit("#"),
          col("frame_index").cast("string"))).as("frame_fp"))
}
