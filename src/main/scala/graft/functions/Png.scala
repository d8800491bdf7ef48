package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.functions.udf

/** REAL PNG decode — the third image container, and the first with true
  * ENTROPY DECODING: IHDR parse, IDAT chunk concatenation, zlib inflate
  * (`java.util.zip.Inflater`), and full scanline unfiltering (all five
  * W3C filter types: None/Sub/Up/Average/Paeth). BMP and PPM verify
  * fixed-layout container parsing; PNG verifies the decompress-then-
  * reconstruct pipeline every real-world image format requires.
  *
  * Supported content: 8-bit greyscale (colour type 0) and 8-bit truecolour
  * (colour type 2), non-interlaced — the canonical still-image lanes.
  * Anything else (16-bit, palette, interlace, corrupt zlib, truncated
  * chunks, oversized dims) returns None; the pixel loops never run on
  * unvalidated geometry (the Bmp width-overflow lesson: dims are bounds-
  * checked in Long and capped before any allocation).
  *
  * Decoder is CRC-lenient (checksums skipped — bounds checks, not CRCs,
  * guard every read); the synthesizer writes CRC-less placeholder words,
  * which the spec pins as accepted. Public format: PNG (ISO/IEC 15948),
  * zlib (RFC 1950), DEFLATE (RFC 1951).
  */
object Png {
  final case class PngInfo(width: Int, height: Int, bitDepth: Int, colorType: Int)
  /** Channel sums over reconstructed pixels; greyscale reports its single
    * channel in all three (a grey pixel IS (g, g, g)). */
  final case class PngStats(width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  private val Signature = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private val MaxPixels = 1 << 24 // 16M px cap: no allocation from crafted headers

  private def beInt(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.BIG_ENDIAN).getInt

  /** IHDR + chunk-walk validation (no decompression). None on anything
    * outside the supported lane. */
  def parse(bytes: Array[Byte]): Option[PngInfo] =
    try {
      if (bytes == null || bytes.length < 45) return None // sig+IHDR+IEND floor
      var i = 0
      while (i < 8) { if (bytes(i) != Signature(i)) return None; i += 1 }
      if (beInt(bytes, 8) != 13) return None
      if (!chunkTypeIs(bytes, 12, "IHDR")) return None
      val w = beInt(bytes, 16)
      val h = beInt(bytes, 20)
      val bitDepth = bytes(24) & 0xff
      val colorType = bytes(25) & 0xff
      val compression = bytes(26) & 0xff
      val filter = bytes(27) & 0xff
      val interlace = bytes(28) & 0xff
      if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
      if (bitDepth != 8 || (colorType != 0 && colorType != 2)) return None
      if (compression != 0 || filter != 0 || interlace != 0) return None
      Some(PngInfo(w, h, bitDepth, colorType))
    } catch { case _: Throwable => None }

  private def chunkTypeIs(b: Array[Byte], off: Int, t: String): Boolean =
    b(off) == t.charAt(0).toByte && b(off + 1) == t.charAt(1).toByte &&
      b(off + 2) == t.charAt(2).toByte && b(off + 3) == t.charAt(3).toByte

  /** Full pixel reconstruction: inflate the concatenated IDAT stream and
    * unfilter every scanline. None for anything parse() rejects, a broken
    * zlib stream, or a short raster. */
  def stats(bytes: Array[Byte]): Option[PngStats] =
    try {
      parse(bytes).flatMap { info =>
        val bpp = if (info.colorType == 2) 3 else 1
        val rowBytes = info.width * bpp
        val rawLen = (rowBytes + 1) * info.height
        // walk chunks, concatenating IDAT payloads
        val idat = new java.io.ByteArrayOutputStream()
        var off = 8
        var sawEnd = false
        while (!sawEnd && off + 8 <= bytes.length) {
          val len = beInt(bytes, off)
          if (len < 0 || off + 12L + len > bytes.length) return None
          if (chunkTypeIs(bytes, off + 4, "IDAT")) idat.write(bytes, off + 8, len)
          else if (chunkTypeIs(bytes, off + 4, "IEND")) sawEnd = true
          off += 12 + len
        }
        if (!sawEnd || idat.size() == 0) return None
        val raw = new Array[Byte](rawLen)
        val inf = new java.util.zip.Inflater()
        try {
          inf.setInput(idat.toByteArray)
          var got = 0
          while (got < rawLen && !inf.finished()) {
            val n = inf.inflate(raw, got, rawLen - got)
            if (n == 0 && inf.needsInput()) return None // truncated stream
            got += n
          }
          if (got < rawLen) return None
        } finally inf.end()
        // unfilter in place into `cur`, accumulating channel sums
        var sr = 0L; var sg = 0L; var sb = 0L
        val prev = new Array[Int](rowBytes)
        val cur = new Array[Int](rowBytes)
        var y = 0
        while (y < info.height) {
          val rowOff = y * (rowBytes + 1)
          val ft = raw(rowOff) & 0xff
          if (ft > 4) return None
          var i2 = 0
          while (i2 < rowBytes) {
            val x = raw(rowOff + 1 + i2) & 0xff
            val a = if (i2 >= bpp) cur(i2 - bpp) else 0
            val b = prev(i2)
            val c = if (i2 >= bpp) prev(i2 - bpp) else 0
            val recon = ft match {
              case 0 => x
              case 1 => x + a
              case 2 => x + b
              case 3 => x + (a + b) / 2
              case 4 =>
                val p = a + b - c
                val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
                x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            }
            cur(i2) = recon & 0xff
            i2 += 1
          }
          var px = 0
          while (px < info.width) {
            if (bpp == 3) { sr += cur(3 * px); sg += cur(3 * px + 1); sb += cur(3 * px + 2) }
            else { val g = cur(px); sr += g; sg += g; sb += g }
            px += 1
          }
          System.arraycopy(cur, 0, prev, 0, rowBytes)
          y += 1
        }
        Some(PngStats(info.width, info.height, sr, sg, sb))
      }
    } catch { case _: Throwable => None }

  /** Deterministic greyscale fixture: pixel (x, y) = (7x + 23y + 13 + 5·seed)
    * mod 256 — the BMP fixture's r-channel formula, so oracles reuse the
    * same SQL expressions. Scanlines carry filter type 0 and the raster is
    * zlib-compressed with STORED deflate blocks (level 0): byte-exact
    * reproducible, and the decoder still runs the full inflate+unfilter
    * path. CRC words are zeroed (decoder is CRC-lenient by design).
    * Spec/verification use only. */
  def synthPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val rowBytes = width + 1
    val raw = new Array[Byte](rowBytes * height)
    var y = 0
    while (y < height) {
      raw(y * rowBytes) = 0 // filter: None
      var x = 0
      while (x < width) {
        raw(y * rowBytes + 1 + x) = ((7 * x + 23 * y + 13 + 5 * seed) % 256).toByte
        x += 1
      }
      y += 1
    }
    wrapRaster(width, height, 0, raw)
  }

  /** Compress a raw (already-filtered) scanline stream and wrap it in
    * signature + IHDR + IDAT(s) + IEND. `splitIdat` emits the zlib stream
    * as two IDAT chunks to exercise the decoder's concatenation path.
    * Test/fixture plumbing — callers own raster validity. */
  private[graft] def wrapRaster(width: Int, height: Int, colorType: Int,
      raw: Array[Byte], splitIdat: Boolean = false): Array[Byte] = {
    val deflater = new java.util.zip.Deflater(0) // STORED blocks: deterministic
    deflater.setInput(raw); deflater.finish()
    val zBuf = new Array[Byte](raw.length + 64 + raw.length / 1000)
    val zLen = deflater.deflate(zBuf)
    deflater.end()
    val cut = if (splitIdat && zLen > 1) zLen / 2 else zLen
    val nIdat = if (cut < zLen) 2 else 1
    val out = ByteBuffer.allocate(8 + 25 + 12 * nIdat + zLen + 12)
      .order(ByteOrder.BIG_ENDIAN)
    out.put(Signature)
    out.putInt(13); out.put("IHDR".getBytes("US-ASCII"))
    out.putInt(width); out.putInt(height)
    out.put(8.toByte); out.put(colorType.toByte)
    out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
    out.putInt(0) // CRC placeholder
    out.putInt(cut); out.put("IDAT".getBytes("US-ASCII")); out.put(zBuf, 0, cut)
    out.putInt(0)
    if (cut < zLen) {
      out.putInt(zLen - cut); out.put("IDAT".getBytes("US-ASCII"))
      out.put(zBuf, cut, zLen - cut); out.putInt(0)
    }
    out.putInt(0); out.put("IEND".getBytes("US-ASCII")); out.putInt(0)
    out.array()
  }

  val synthSeededUdf = udf((w: Int, h: Int, seed: Long) => synthPng(w, h, seed))
  val statsUdf = udf((b: Array[Byte]) => stats(b))
}
