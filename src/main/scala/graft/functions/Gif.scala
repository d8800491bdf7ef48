package graft.functions

import org.apache.spark.sql.functions.udf

/** REAL GIF decode (GIF87a, CompuServe spec, public) — the fourth image
  * container and the third ENTROPY CODER on the surface: LSB-first
  * variable-width code unpacking, full LZW dictionary reconstruction
  * (root codes, growth to 12 bits, CLEAR resets, END, and the deferred
  * KwKwK case where a code references the entry being defined), sub-block
  * reassembly, and palette-indexed pixel expansion. Together with PNG
  * (zlib/DEFLATE) and JPEG (Huffman), every classic entropy-coding
  * discipline an image/data pipeline meets is implemented honestly.
  *
  * Supported lane: GIF87a/89a signature, global color table required,
  * single non-interlaced image, no local palette; 89a extension blocks
  * are skipped structurally (label + sub-blocks). Anything else —
  * truncated sub-blocks, codes past the dictionary, missing trailer,
  * oversized dims — returns None; dims are bounds-checked before any
  * allocation.
  *
  * The synthesizer runs a REAL greedy LZW compressor (longest-match
  * dictionary walk), so fixture streams contain multi-character
  * dictionary codes and — on pixel runs — the KwKwK pattern; the decoder
  * is not fed literal-only streams.
  */
object Gif {
  final case class GifInfo(width: Int, height: Int)
  final case class GifStats(width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  private val MaxPixels = 1 << 24

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Header + logical-screen validation (no LZW work). */
  def parse(bytes: Array[Byte]): Option[GifInfo] =
    try {
      if (bytes == null || bytes.length < 14) return None
      val sig = new String(bytes, 0, 6, "US-ASCII")
      if (sig != "GIF87a" && sig != "GIF89a") return None
      val w = u16le(bytes, 6); val h = u16le(bytes, 8)
      val flags = bytes(10) & 0xff
      if ((flags & 0x80) == 0) return None // global color table required
      if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
      Some(GifInfo(w, h))
    } catch { case _: Throwable => None }

  /** Full decode: walk to the image descriptor (skipping 89a extensions),
    * LZW-decode exactly width×height palette indices, sum channels through
    * the global palette. None on anything outside the lane or corrupt. */
  def stats(bytes: Array[Byte]): Option[GifStats] =
    try {
      val info = parse(bytes).getOrElse(return None)
      val gctSize = 2 << ((bytes(10) & 0x07) + 0) // 2^(N+1) entries
      val gctEntries = 2 << (bytes(10) & 0x07)
      val palOff = 13
      if (palOff + 3 * gctEntries > bytes.length) return None
      var off = palOff + 3 * gctEntries
      // block walk: extensions (0x21) skip, image descriptor (0x2C) decodes
      while (off < bytes.length) {
        (bytes(off) & 0xff) match {
          case 0x21 => // extension: label byte then sub-blocks
            off += 2
            while (off < bytes.length && (bytes(off) & 0xff) != 0) {
              off += 1 + (bytes(off) & 0xff)
            }
            if (off >= bytes.length) return None
            off += 1 // block terminator
          case 0x2c =>
            if (off + 10 > bytes.length) return None
            val iw = u16le(bytes, off + 5); val ih = u16le(bytes, off + 7)
            val iflags = bytes(off + 9) & 0xff
            if (iw != info.width || ih != info.height) return None
            if ((iflags & 0x80) != 0 || (iflags & 0x40) != 0) return None // local table / interlace
            val idx = lzwDecode(bytes, off + 10, iw.toLong * ih).getOrElse(return None)
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < idx.length) {
              val p = idx(i) & 0xff
              if (p >= gctEntries) return None
              sr += bytes(palOff + 3 * p) & 0xff
              sg += bytes(palOff + 3 * p + 1) & 0xff
              sb += bytes(palOff + 3 * p + 2) & 0xff
              i += 1
            }
            return Some(GifStats(info.width, info.height, sr, sg, sb))
          case 0x3b => return None // trailer before any image
          case _ => return None
        }
      }
      val _ = gctSize
      None
    } catch { case _: Throwable => None }

  /** All frames of an animated GIF: walk every image descriptor (skipping
    * 89a extensions) and decode each frame's full-geometry raster —
    * the VIDEO-modality shape (a GIF animation is the simplest real
    * multi-frame container). Frames must cover the logical screen at
    * (0,0) — the fixture contract; framed sub-rectangles are out of lane.
    * None on any corrupt frame (a video pipeline drops the whole asset,
    * not half an animation). */
  def frames(bytes: Array[Byte]): Option[Seq[GifStats]] =
    try {
      val info = parse(bytes).getOrElse(return None)
      val gctEntries = 2 << (bytes(10) & 0x07)
      val palOff = 13
      if (palOff + 3 * gctEntries > bytes.length) return None
      var off = palOff + 3 * gctEntries
      val out = Seq.newBuilder[GifStats]
      var done = false
      while (!done) {
        if (off >= bytes.length) return None
        (bytes(off) & 0xff) match {
          case 0x21 =>
            off += 2
            while (off < bytes.length && (bytes(off) & 0xff) != 0)
              off += 1 + (bytes(off) & 0xff)
            if (off >= bytes.length) return None
            off += 1
          case 0x2c =>
            if (off + 10 > bytes.length) return None
            val iw = u16le(bytes, off + 5); val ih = u16le(bytes, off + 7)
            val iflags = bytes(off + 9) & 0xff
            if (iw != info.width || ih != info.height) return None
            if ((iflags & 0x80) != 0 || (iflags & 0x40) != 0) return None
            val idx = lzwDecode(bytes, off + 10, iw.toLong * ih).getOrElse(return None)
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < idx.length) {
              val p = idx(i) & 0xff
              if (p >= gctEntries) return None
              sr += bytes(palOff + 3 * p) & 0xff
              sg += bytes(palOff + 3 * p + 1) & 0xff
              sb += bytes(palOff + 3 * p + 2) & 0xff
              i += 1
            }
            out += GifStats(iw, ih, sr, sg, sb)
            // skip past this frame's data: min-code byte + sub-blocks
            off += 10 + 1
            while (off < bytes.length && (bytes(off) & 0xff) != 0)
              off += 1 + (bytes(off) & 0xff)
            if (off >= bytes.length) return None
            off += 1
          case 0x3b => done = true
          case _ => return None
        }
      }
      val fr = out.result()
      if (fr.isEmpty) None else Some(fr)
    } catch { case _: Throwable => None }

  /** Animated fixture: GIF89a, `nFrames` full-screen frames, each behind a
    * graphic-control extension (realistic 89a animation layout); frame f
    * pixel (x, y) = (7x + 23y + 11f + 5·seed) mod 256. */
  def synthGifAnim(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(0x80 | 0x07); out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    var f = 0
    while (f < nFrames) {
      out.write(0x21); out.write(0xf9) // graphic control extension
      out.write(4); out.write(0); out.write(10); out.write(0); out.write(0)
      out.write(0) // terminator
      out.write(0x2c)
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(width & 0xff); out.write(width >> 8)
      out.write(height & 0xff); out.write(height >> 8)
      out.write(0)
      val px = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          px(y * width + x) = ((7 * x + 23 * y + 11 * f + 5 * seed) % 256).toByte
          x += 1
        }
        y += 1
      }
      out.write(8)
      out.write(lzwEncodeSubBlocks(px))
      out.write(0)
      f += 1
    }
    out.write(0x3b)
    out.toByteArray
  }

  val synthAnimUdf = udf((w: Int, h: Int, nf: Int, seed: Long) => synthGifAnim(w, h, nf, seed))
  val framesUdf = udf((b: Array[Byte]) =>
    frames(b).map(_.map(s => (s.width, s.height, s.sum_r))))

  /** LZW decode starting at the min-code-size byte; returns exactly
    * `nPixels` root indices or None. LSB-first bit order per the spec. */
  private def lzwDecode(b: Array[Byte], start: Int, nPixels: Long): Option[Array[Byte]] = {
    if (nPixels > MaxPixels) return None
    if (start >= b.length) return None
    val minCode = b(start) & 0xff
    if (minCode < 2 || minCode > 8) return None
    val clear = 1 << minCode
    val end = clear + 1
    // reassemble sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var off = start + 1
    var done = false
    while (!done) {
      if (off >= b.length) return None
      val len = b(off) & 0xff
      if (len == 0) done = true
      else {
        if (off + 1 + len > b.length) return None
        data.write(b, off + 1, len)
        off += 1 + len
      }
    }
    if (done) off += 1
    val d = data.toByteArray
    val out = new Array[Byte](nPixels.toInt)
    var outN = 0
    // dictionary as (prefixCode, appendedRoot); roots implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var dictN = end + 1
    var width = minCode + 1
    var acc = 0L; var nbits = 0; var pos = 0
    var prev = -1
    val stack = new Array[Byte](4096)
    def emit(code: Int): Boolean = { // expand code onto out; true on success
      var sp = 0
      var c = code
      while (c >= clear) { // walk the chain down to a root
        if (sp >= 4096 || c >= dictN) return false
        stack(sp) = append(c); sp += 1
        c = prefix(c)
      }
      if (outN + sp + 1 > out.length) return false
      out(outN) = c.toByte; outN += 1
      while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
      true
    }
    def firstRoot(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    while (outN < out.length) {
      while (nbits < width) {
        if (pos >= d.length) return None
        acc |= (d(pos) & 0xffL) << nbits
        nbits += 8; pos += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>= width; nbits -= width
      if (code == clear) {
        dictN = end + 1; width = minCode + 1; prev = -1
      } else if (code == end) {
        return if (outN == out.length) Some(out) else None
      } else if (code < clear || (code < dictN && code > end)) {
        // known code
        if (!emit(code)) return None
        if (prev >= 0 && dictN < 4096) {
          prefix(dictN) = prev; append(dictN) = firstRoot(code).toByte
          dictN += 1
          if (dictN == (1 << width) && width < 12) width += 1
        }
        prev = code
      } else if (code == dictN && prev >= 0 && dictN < 4096) {
        // KwKwK: the code being defined — entry = prev + firstRoot(prev)
        prefix(dictN) = prev; append(dictN) = firstRoot(prev).toByte
        dictN += 1
        if (!emit(dictN - 1)) return None
        if (dictN == (1 << width) && width < 12) width += 1
        prev = dictN - 1
      } else return None
    }
    // out full: require END (possibly after a final code boundary)
    while (nbits < width && pos < d.length) {
      acc |= (d(pos) & 0xffL) << nbits; nbits += 8; pos += 1
    }
    if (nbits >= width) {
      val code = (acc & ((1 << width) - 1)).toInt
      if (code == end) Some(out) else None
    } else None
  }

  // ---- fixture synthesizer (real greedy LZW compressor) ----

  /** Deterministic fixture: greyscale identity palette (index i → i,i,i),
    * pixel (x, y) = (7x + 23y + 13 + 5·seed) mod 256 — the Png fixture
    * formula, so both containers carry the same image and the oracle SQL
    * is shared. The encoder is a real greedy longest-match LZW. */
  def synthGif(width: Int, height: Int, seed: Long): Array[Byte] = {
    val px = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        px(y * width + x) = ((7 * x + 23 * y + 13 + 5 * seed) % 256).toByte
        x += 1
      }
      y += 1
    }
    synthGifRaster(width, height, px)
  }

  /** Same container over a caller-provided index raster — lets property
    * tests drive the LZW encoder/decoder with arbitrary content (random
    * pixels, long runs, all-equal planes) rather than one formula. */
  def synthGifRaster(width: Int, height: Int, px: Array[Byte]): Array[Byte] = {
    require(px.length == width * height)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(0x80 | 0x07) // global table, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(0)
    out.write(8) // LZW min code size
    out.write(lzwEncodeSubBlocks(px))
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private def lzwEncodeSubBlocks(px: Array[Byte]): Array[Byte] = {
    val clear = 256; val end = 257
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    var width = 9
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits; nbits += width
      while (nbits >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    // dictionary: map (prefixCode << 8 | root) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var dictN = end + 1
    put(clear)
    var prev = -1
    var i = 0
    while (i < px.length) {
      val root = px(i) & 0xff
      if (prev < 0) prev = root
      else {
        val key: Integer = (prev << 8) | root
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          if (dictN < 4096) {
            dict.put(key, dictN)
            dictN += 1
            // the decoder's dictionary lags the encoder's by ONE entry (it
            // adds after reading the next code), so it reaches 2^width one
            // code later than we do — widen on 2^width + 1, not 2^width
            if (dictN == (1 << width) + 1 && width < 12) width += 1
          } else {
            put(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            dictN = end + 1
            width = 9
          }
          prev = root
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev)
    // the decoder still ADDS an entry for that final code — if that add
    // lands exactly on 2^width it reads END one bit wider than us
    if (dictN == (1 << width) && width < 12) width += 1
    put(end)
    if (nbits > 0) bits.write((acc & 0xff).toInt)
    // wrap into ≤255-byte sub-blocks
    val raw = bits.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < raw.length) {
      val len = math.min(255, raw.length - off)
      out.write(len)
      out.write(raw, off, len)
      off += len
    }
    out.toByteArray
  }

  val synthSeededUdf = udf((w: Int, h: Int, seed: Long) => synthGif(w, h, seed))
  val statsUdf = udf((b: Array[Byte]) => stats(b))
}
