package graft.operators

/** A real, self-contained BASELINE JPEG codec (ITU-T T.81), grayscale,
  * zero external dependencies — the codec that closes the last decode
  * stub (reference treats media as opaque; we decode it).
  *
  * Scope (honestly stated):
  *   - encoder: 8-bit grayscale, dims multiples of 8, one component, unit
  *     or caller-supplied quantization table, canonical Huffman tables
  *     emitted in-stream via DHT (fixed code lengths — valid, if not
  *     entropy-optimal), proper byte stuffing and DC prediction;
  *   - decoder: any single-component baseline JPEG with 8-bit precision
  *     and 1×1 sampling whose tables arrive via DQT/DHT (i.e. everything
  *     the encoder emits, plus foreign files of the same shape). Corrupt
  *     or unsupported input → None, never an exception — the same
  *     contract as every byte parser in `Multimodal`.
  *
  * Exactness property used by the q44 oracle: for images whose 8×8 blocks
  * are each CONSTANT and a unit quant table, the FDCT concentrates all
  * energy in the DC coefficient (8·(c−128), exact in IEEE doubles for
  * integer c), every AC quantizes to zero, and the IDCT reproduces the
  * constant exactly after rounding — decode(encode(img)) == img
  * bit-for-bit, so any SQL engine can recompute the decoded stats from
  * the block formula. On arbitrary images the codec round-trips within
  * ±1 per pixel at unit quantization (float DCT rounding only) — asserted
  * with a tolerance in JpegSpec territory (RobustnessSpec).
  */
object Jpeg {

  // --- Huffman table construction (canonical, fixed-length) ---------------

  /** DC: 12 categories (0..11), all with 5-bit codes: bits[5]=12.
    * AC: all 162 baseline (run,size) symbols with 9-bit codes: bits[9]=162.
    * Both satisfy Kraft with slack, so the canonical assignment below is a
    * valid prefix code and no code is the all-ones pattern of its length. */
  private[operators] val DcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private[operators] val DcVals: Array[Int] = (0 to 11).toArray
  private[operators] val AcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0)
  private[operators] val AcVals: Array[Int] = {
    // EOB (0x00), ZRL (0xF0), and (run 0-15, size 1-10)
    val rs = for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s
    (Seq(0x00, 0xf0) ++ rs).toArray
  }

  /** Canonical code assignment (T.81 Annex C): symbol → (code, length). */
  private def buildCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len - 1)) {
        out(vals(k)) = (code, len)
        code += 1
        k += 1
      }
      code <<= 1
    }
    out.toMap
  }

  private lazy val dcCodes = buildCodes(DcBits, DcVals)
  private lazy val acCodes = buildCodes(AcBits, AcVals)

  // --- DCT ----------------------------------------------------------------

  private val cosT: Array[Array[Double]] = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private def cScale(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward 8×8 DCT-II with JPEG scaling: F(u,v) = ¼ C(u)C(v) ΣΣ s·cos·cos. */
  private def fdct(s: Array[Int]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            acc += s(y * 8 + x) * cosT(x)(u) * cosT(y)(v)
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = 0.25 * cScale(u) * cScale(v) * acc
        u += 1
      }
      v += 1
    }
    out
  }

  /** Inverse 8×8 DCT: s(x,y) = ¼ ΣΣ C(u)C(v) F·cos·cos. */
  private def idct(f: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            acc += cScale(u) * cScale(v) * f(v * 8 + u) * cosT(x)(u) * cosT(y)(v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = math.round(0.25 * acc).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  // --- zig-zag ------------------------------------------------------------

  private[operators] val ZigZag: Array[Int] = {
    val order = new Array[Int](64)
    var i = 0
    for (d <- 0 until 15) { // anti-diagonals
      val range = if (d % 2 == 0) (math.min(d, 7) to math.max(0, d - 7) by -1)
                  else (math.max(0, d - 7) to math.min(d, 7))
      for (y <- range) { order(i) = y * 8 + (d - y); i += 1 }
    }
    order
  }

  // --- bit I/O ------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { put(0x7f, 8 - nbits) } // pad with 1s
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var bad = false
    /** next bit, unstuffing 0xFF00; a marker (0xFF non-zero) sets `bad`. */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) { bad = true; return 0 }
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) { bad = true; return 0 }
          val nxt = b(pos) & 0xff
          if (nxt == 0x00) pos += 1
          else { bad = true; v = 0 } // hit a marker mid-stream
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  // --- encoder ------------------------------------------------------------

  private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte) ++ be16(payload.length + 2) ++ payload

  private def category(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode an 8-bit grayscale image (row-major, dims multiples of 8) as a
    * baseline JPEG with a unit quantization table. */
  def encode(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "dims must be multiples of 8")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    out.write(seg(0xdb, Array[Byte](0x00) ++ Array.fill[Byte](64)(1))) // DQT: q=1
    out.write(seg(0xc0, Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](1, 1, 0x11, 0))) // SOF0: 1 component, 1×1 sampling
    out.write(seg(0xc4, Array[Byte](0x00) ++ DcBits.map(_.toByte) ++
      DcVals.map(_.toByte))) // DHT DC 0
    out.write(seg(0xc4, Array[Byte](0x10) ++ AcBits.map(_.toByte) ++
      AcVals.map(_.toByte))) // DHT AC 0
    out.write(seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))) // SOS
    val bw = new BitWriter(out)
    var prevDc = 0
    val block = new Array[Int](64)
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      var i = 0
      var const = true
      while (i < 64) {
        block(i) = pixels((by * 8 + i / 8) * w + bx * 8 + i % 8) - 128
        if (block(i) != block(0)) const = false
        i += 1
      }
      // Flat-block fast path (the special case every production encoder
      // has): a constant block's DCT is DC = 8·s, all ACs zero — exact,
      // and identical to what the float FDCT rounds to (8S·(1+2ε) rounds
      // to 8S). Skips the O(64²) transform on flat content.
      val q =
        if (const) { val z = new Array[Int](64); z(0) = 8 * block(0); z }
        else { val coefs = fdct(block); ZigZag.map(z => math.round(coefs(z)).toInt) }
      // DC: category + offset bits of the prediction difference
      val diff = q(0) - prevDc
      prevDc = q(0)
      val s = category(diff)
      val (dcCode, dcLen) = dcCodes(s)
      bw.put(dcCode, dcLen)
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC: run-length of zeros, ZRL for 16+, EOB for trailing zeros
      var run = 0
      var k = 1
      while (k < 64) {
        if (q(k) == 0) run += 1
        else {
          while (run >= 16) { val (c, l) = acCodes(0xf0); bw.put(c, l); run -= 16 }
          val sz = category(q(k))
          val (c, l) = acCodes((run << 4) | sz)
          bw.put(c, l)
          bw.put(if (q(k) < 0) q(k) + (1 << sz) - 1 else q(k), sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (c, l) = acCodes(0x00); bw.put(c, l) } // EOB
    }
    bw.flush()
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte)) // EOI
    out.toByteArray
  }

  // --- decoder ------------------------------------------------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // T.81 F.2.2.3 decode tables
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len - 1)
        k += bits(len - 1)
        maxCode(len) = if (bits(len - 1) > 0) code - 1 else -1
        code <<= 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var len = 1
      while (len <= 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | br.bit()
        len += 1
      }
      if (len > 16 || br.bad) { br.bad = true; return -1 }
      vals(valPtr(len) + code - minCode(len))
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decoded grayscale image. */
  final case class Image(width: Int, height: Int, pixels: Array[Int])

  /** Decode a single-component baseline JPEG. None for non-JPEG input,
    * unsupported shapes (progressive, multi-component, 16-bit quant,
    * subsampling), or corrupt streams. */
  def decode(b: Array[Byte]): Option[Image] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val quant = scala.collection.mutable.Map[Int, Array[Int]]()
    val dcTabs = scala.collection.mutable.Map[Int, HuffTable]()
    val acTabs = scala.collection.mutable.Map[Int, HuffTable]()
    var w = -1; var h = -1
    var dcSel = -1; var acSel = -1; var qSel = -1
    var i = 2
    var sosAt = -1
    while (sosAt < 0 && i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9) return None // EOI before SOS
      if (marker >= 0xd0 && marker <= 0xd7 || marker == 0x01) { i += 2 }
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > b.length) return None
        val p = i + 4
        marker match {
          case 0xdb => // DQT (possibly several tables per segment)
            var q = p
            while (q < i + 2 + len) {
              val pq = (b(q) & 0xff) >> 4
              val tq = b(q) & 0x0f
              if (pq != 0 || q + 65 > i + 2 + len) return None // 8-bit only
              quant(tq) = Array.tabulate(64)(j => b(q + 1 + j) & 0xff)
              q += 65
            }
          case 0xc0 => // SOF0 baseline
            if ((b(p) & 0xff) != 8) return None
            h = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
            w = ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
            val ncomp = b(p + 5) & 0xff
            if (ncomp != 1 || (b(p + 7) & 0xff) != 0x11) return None
            qSel = b(p + 8) & 0xff
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
              0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // non-baseline SOF
          case 0xc4 => // DHT (possibly several tables per segment)
            var q = p
            while (q < i + 2 + len) {
              val tc = (b(q) & 0xff) >> 4
              val th = b(q) & 0x0f
              if (q + 17 > i + 2 + len) return None
              val bits = Array.tabulate(16)(j => b(q + 1 + j) & 0xff)
              val n = bits.sum
              if (q + 17 + n > i + 2 + len) return None
              val vals = Array.tabulate(n)(j => b(q + 17 + j) & 0xff)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              q += 17 + n
            }
          case 0xda => // SOS
            if ((b(p) & 0xff) != 1) return None
            dcSel = (b(p + 2) & 0xff) >> 4
            acSel = b(p + 2) & 0x0f
            sosAt = i + 2 + len
          case _ => () // APPn/COM/etc: skip
        }
        i += 2 + len
      }
    }
    if (sosAt < 0 || w <= 0 || h <= 0 || w % 8 != 0 || h % 8 != 0) return None
    val qt = quant.getOrElse(qSel, return None)
    val dcT = dcTabs.getOrElse(dcSel, return None)
    val acT = acTabs.getOrElse(acSel, return None)
    val br = new BitReader(b, sosAt)
    val pixels = new Array[Int](w * h)
    var prevDc = 0
    val coefs = new Array[Int](64)
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      java.util.Arrays.fill(coefs, 0)
      val s = dcT.decode(br)
      if (s < 0 || s > 11) return None
      prevDc += extend(br.bits(s), s)
      coefs(ZigZag(0)) = prevDc * qt(0)
      var k = 1
      var eob = false
      var anyAc = false
      while (k < 64 && !eob) {
        val rs = acT.decode(br)
        if (rs < 0) return None
        val run = rs >> 4
        val sz = rs & 0x0f
        if (sz == 0) {
          if (run == 15) k += 16 // ZRL
          else eob = true // EOB
        } else {
          k += run
          if (k > 63) return None
          coefs(ZigZag(k)) = extend(br.bits(sz), sz) * qt(k)
          anyAc = true
          k += 1
        }
      }
      if (br.bad) return None
      // DC-only fast path (mirror of the encoder's flat-block case): the
      // IDCT of a DC-only block is the constant round(DC/8) — exact, and
      // identical to the float IDCT's rounding (including the half-way
      // F00 ≡ 4 mod 8 case, which rounds up on both paths).
      val block =
        if (!anyAc) Array.fill(64)(math.round(coefs(0) / 8.0).toInt)
        else idct(coefs)
      var j = 0
      while (j < 64) {
        val v = block(j) + 128
        pixels((by * 8 + j / 8) * w + bx * 8 + j % 8) =
          if (v < 0) 0 else if (v > 255) 255 else v
        j += 1
      }
    }
    Some(Image(w, h, pixels))
  }
}
