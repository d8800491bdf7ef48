package graft.functions

import org.apache.spark.sql.functions.udf

/** REAL baseline JPEG decode (ISO/IEC 10918-1 / ITU T.81, public) — the
  * third image container family and the first with HUFFMAN entropy
  * decoding: marker segment walk (SOI/DQT/SOF0/DHT/SOS/EOI), canonical
  * Huffman table construction from BITS/HUFFVAL, bit-serial entropy decode
  * with 0xFF00 byte unstuffing, DC differential prediction with the T.81
  * EXTEND sign procedure, dequantization, and a full 8×8 inverse DCT per
  * block. Together with [[Png]] (zlib/DEFLATE) and [[Bmp]]/[[Ppm]] (fixed
  * layout), every decode discipline a real image pipeline needs is
  * exercised honestly.
  *
  * Supported lane: baseline sequential DCT, 8-bit, single greyscale
  * component, no subsampling, dimensions multiples of 8 (the fixture
  * contract — general JPEG pads partial MCUs; rejecting them keeps the
  * pixel loops on validated geometry). Anything else — progressive,
  * multi-component, restart markers, 12-bit, truncated entropy data,
  * codes absent from the table — returns None; dims are bounds-checked
  * before any allocation (the Bmp width-overflow lesson).
  *
  * Determinism/oracle note: the fixture synthesizer emits BLOCK-CONSTANT
  * images with even grey levels and a flat quant table (all 16), so
  * DCT→quantize→dequantize→IDCT is bit-exact end to end (DC = (g−128)/2
  * integer, AC = 0) and the decoded plane equals the synth formula — the
  * full entropy/IDCT machinery runs, and the oracle can still state the
  * expected pixels in closed form.
  */
object Jpeg {
  final case class JpegInfo(width: Int, height: Int)
  /** Channel sums over decoded pixels; greyscale reports its channel in
    * all three (consistent with [[Png.PngStats]]). */
  final case class JpegStats(width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  private val MaxPixels = 1 << 24

  /** Standard luminance DC table (T.81 Annex K.3.1): BITS then HUFFVAL. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)
  /** Standard luminance AC table (T.81 Annex K.3.2), all 162 symbols —
    * EOB decodes as the canonical '1010'. The decoder builds ANY table
    * generically from BITS/HUFFVAL; carrying the real-world table keeps
    * the fixture files decodable by stock JPEG tooling. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  private val QuantAll16 = Array.fill(64)(16)

  // ---- canonical Huffman (T.81 C.2 / F.2.2.3) ----

  /** (maxcode, valptr, mincode, huffval) per code length 1..16. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val huffval: Array[Int] = vals
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    /** Encoder view: symbol → (code, length). */
    lazy val encode: Map[Int, (Int, Int)] = {
      val m = Map.newBuilder[Int, (Int, Int)]
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) { m += vals(k) -> ((code, l)); code += 1; k += 1; i += 1 }
        code <<= 1
        l += 1
      }
      m.result()
    }
  }

  // ---- bit IO over entropy-coded data ----

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def finishBytes(): Array[Byte] = {
      if (nbits > 0) put(0xff, 8 - nbits) // pad with 1s
      out.toByteArray
    }
  }

  /** Reads entropy-coded bits, unstuffing 0xFF00; any marker byte or end
    * of input mid-stream raises (caught by the caller → None). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0; private var nbits = 0
    private def nextByte(): Int = {
      if (pos >= b.length) throw new IllegalStateException("eof")
      val v = b(pos) & 0xff; pos += 1
      if (v == 0xff) {
        if (pos >= b.length) throw new IllegalStateException("eof")
        val m = b(pos) & 0xff
        if (m == 0x00) pos += 1 // stuffed data byte
        else throw new IllegalStateException("marker in scan") // incl. EOI
      }
      v
    }
    def bit(): Int = {
      if (nbits == 0) { acc = nextByte(); nbits = 8 }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decodeSymbol(t: HuffTable): Int = {
      var code = bit(); var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l))
          return t.huffval(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit(); l += 1
      }
      throw new IllegalStateException("bad huffman code")
    }
  }

  /** T.81 F.2.2.1 EXTEND: map SSSS amplitude bits to a signed value. */
  private def extend(v: Int, ssss: Int): Int =
    if (ssss == 0) 0 else if (v < (1 << (ssss - 1))) v - (1 << ssss) + 1 else v

  // ---- marker walk ----

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Header-only validation: walk segments to SOF0 and check the lane.
    * None for progressive/multi-component/odd geometry/anything corrupt. */
  def parse(bytes: Array[Byte]): Option[JpegInfo] =
    try {
      if (bytes == null || bytes.length < 20) return None
      if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
      var off = 2
      while (off + 4 <= bytes.length) {
        if ((bytes(off) & 0xff) != 0xff) return None
        val marker = bytes(off + 1) & 0xff
        if (marker == 0xd9) return None // EOI before SOF0
        val len = u16(bytes, off + 2)
        if (len < 2 || off + 2 + len > bytes.length) return None
        if (marker == 0xc0) { // SOF0 baseline
          if (len < 11) return None
          val prec = bytes(off + 4) & 0xff
          val h = u16(bytes, off + 5)
          val w = u16(bytes, off + 7)
          val nf = bytes(off + 9) & 0xff
          if (prec != 8 || nf != 1) return None
          if ((bytes(off + 11) & 0xff) != 0x11) return None // no subsampling
          if (w <= 0 || h <= 0 || w % 8 != 0 || h % 8 != 0) return None
          if (w.toLong * h > MaxPixels) return None
          return Some(JpegInfo(w, h))
        }
        if (marker >= 0xc1 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8)
          return None // any other SOF family: out of lane
        off += 2 + len
      }
      None
    } catch { case _: Throwable => None }

  /** Full decode: entropy-decode every block, dequantize, IDCT, clamp;
    * returns channel sums. None on anything outside the lane or corrupt. */
  def stats(bytes: Array[Byte]): Option[JpegStats] =
    try {
      val info = parse(bytes).getOrElse(return None)
      var off = 2
      var quant: Array[Int] = null
      var dcTab: HuffTable = null
      var acTab: HuffTable = null
      var scanStart = -1
      while (scanStart < 0 && off + 4 <= bytes.length) {
        if ((bytes(off) & 0xff) != 0xff) return None
        val marker = bytes(off + 1) & 0xff
        val len = u16(bytes, off + 2)
        if (len < 2 || off + 2 + len > bytes.length) return None
        marker match {
          case 0xdb => // DQT (possibly several tables)
            var p = off + 4
            while (p < off + 2 + len) {
              val pqtq = bytes(p) & 0xff
              if ((pqtq >> 4) != 0) return None // 8-bit precision only
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) { t(i) = bytes(p + 1 + i) & 0xff; i += 1 }
              if ((pqtq & 0x0f) == 0) quant = t // component uses table 0
              p += 65
            }
          case 0xc4 => // DHT (possibly several tables)
            var p = off + 4
            while (p < off + 2 + len) {
              val tcth = bytes(p) & 0xff
              val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
              val n = bits.sum
              if (n > 256 || p + 17 + n > off + 2 + len) return None
              val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
              val tab = new HuffTable(bits, vals)
              if ((tcth & 0x0f) == 0) {
                if ((tcth >> 4) == 0) dcTab = tab else acTab = tab
              }
              p += 17 + n
            }
          case 0xda => scanStart = off + 2 + len // SOS: entropy data follows
          case _ => ()
        }
        off += 2 + len
      }
      if (scanStart < 0 || quant == null || dcTab == null || acTab == null) return None
      if (quant.exists(q => q < 1)) return None

      val bw = info.width / 8; val bh = info.height / 8
      val r = new BitReader(bytes, scanStart)
      val coef = new Array[Int](64)
      val pix = new Array[Int](64)
      var sum = 0L
      var pred = 0
      var blk = 0
      while (blk < bw * bh) {
        java.util.Arrays.fill(coef, 0)
        // DC: category symbol + EXTEND'ed amplitude, differentially coded
        val ssss = r.decodeSymbol(dcTab)
        if (ssss > 11) return None
        val diff = extend(r.bits(ssss), ssss)
        pred += diff
        coef(0) = pred * quant(0)
        // AC: run/size symbols until EOB or coefficient 63 (F.2.2.2)
        var k = 1
        var eob = false
        while (!eob && k < 64) {
          val rs = r.decodeSymbol(acTab)
          if (rs == 0x00) eob = true
          else if (rs == 0xf0) k += 16 // ZRL
          else {
            val run = rs >> 4; val size = rs & 0x0f
            k += run
            if (k > 63) return None
            coef(zigzag(k)) = extend(r.bits(size), size) * quant(zigzagQ(k))
            k += 1
          }
        }
        idct8x8(coef, pix)
        var i = 0
        while (i < 64) { sum += pix(i); i += 1 }
        blk += 1
      }
      Some(JpegStats(info.width, info.height, sum, sum, sum))
    } catch { case _: Throwable => None }

  /** Zigzag index k (scan order) → natural order index (row*8+col). */
  private val zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var k = 0
    var s = 0
    while (s < 15) {
      val xs = math.max(0, s - 7) to math.min(7, s)
      // even diagonals start bottom-left (x ascending), odd start top-right
      val diag = if (s % 2 == 0) xs else xs.reverse
      diag.foreach { x => z(k) = (s - x) * 8 + x; k += 1 }
      s += 1
    }
    z
  }
  /** Quant tables are STORED in zigzag order (B.2.4.1): the k-th scanned
    * coefficient dequantizes by the k-th stored entry. */
  private def zigzagQ(k: Int): Int = k

  /** Full 2-D inverse DCT (T.81 A.3.3), separably applied; fine at fixture
    * scale, and exact after rounding for the DC-only fixtures. */
  private val cosT: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / 16) * (if (u == 0) 1.0 / math.sqrt(2) else 1.0)
  }
  private def idct8x8(coef: Array[Int], out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) s += c * cosT(u)(x) * cosT(v)(y)
            u += 1
          }
          v += 1
        }
        val p = math.round(s / 4).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  // ---- fixture synthesizer ----

  /** Block-constant greyscale JPEG: block (bx, by) carries the even grey
    * level 2·((7·bx + 23·by + 13 + 5·seed) mod 128). With the flat
    * quant-16 table, DC = (g−128)/2 encodes and decodes EXACTLY, so the
    * full Huffman/dequant/IDCT path reproduces the formula bit-for-bit —
    * entropy decoding with a closed-form oracle. Spec/fixture use only. */
  def blockGray(bx: Int, by: Int, seed: Long): Int =
    (2 * ((7 * bx + 23 * by + 13 + 5 * seed) % 128)).toInt

  def synthJpeg(wBlocks: Int, hBlocks: Int, seed: Long): Array[Byte] =
    synthJpegBlocks(wBlocks, hBlocks, (bx, by) => blockGray(bx, by, seed))

  /** Same container, caller-chosen even block levels — lets specs steer
    * the DC differential sequence into specific bitstream shapes (e.g. a
    * byte-aligned run of eight 1-bits, which forces 0xFF00 stuffing). */
  def synthJpegBlocks(wBlocks: Int, hBlocks: Int,
      gray: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      out.write((payload.length + 2) >> 8); out.write((payload.length + 2) & 0xff)
      payload.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    m(0xdb, Array(0x00) ++ QuantAll16)
    val w = 8 * wBlocks; val h = 8 * hBlocks
    m(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0))
    m(0xc4, Array(0x00) ++ DcBits ++ DcVals)
    m(0xc4, Array(0x10) ++ AcBits ++ AcVals)
    m(0xda, Array(1, 1, 0x00, 0, 63, 0))
    val dcCodes = new HuffTable(DcBits, DcVals).encode
    val acCodes = new HuffTable(AcBits, AcVals).encode
    val bwr = new BitWriter
    var pred = 0
    var by = 0
    while (by < hBlocks) {
      var bx = 0
      while (bx < wBlocks) {
        val dc = (gray(bx, by) - 128) / 2
        var diff = dc - pred; pred = dc
        var ssss = 0
        var a = math.abs(diff)
        while (a > 0) { ssss += 1; a >>= 1 }
        val (c, l) = dcCodes(ssss)
        bwr.put(c, l)
        if (ssss > 0) {
          val amp = if (diff >= 0) diff else diff + (1 << ssss) - 1
          bwr.put(amp, ssss)
        }
        val (ec, el) = acCodes(0x00) // EOB
        bwr.put(ec, el)
        bx += 1
      }
      by += 1
    }
    val scan = bwr.finishBytes()
    out.write(scan, 0, scan.length)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  val synthSeededUdf = udf((wb: Int, hb: Int, seed: Long) => synthJpeg(wb, hb, seed))
  val statsUdf = udf((b: Array[Byte]) => stats(b))
}
