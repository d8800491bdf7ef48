package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.functions.udf

/** BMP (Windows DIB, BITMAPINFOHEADER + uncompressed 24-bpp) parsing — the
  * IMAGE twin of the audio codecs (Wav/Flac/Ogg/Mp3/Adts/Aiff): a fully
  * deterministic integer container parse, so image width/height and true
  * per-channel pixel statistics are oracle-checkable, no native codec
  * library required.
  *
  * Layout (public format): 14-byte BITMAPFILEHEADER ("BM", file size,
  * reserved, pixel-data offset) + 40-byte BITMAPINFOHEADER (header size 40,
  * width i32, height i32, planes, bpp, compression 0 = BI_RGB) + pixel
  * rows, stored BOTTOM-UP, each row `width*3` bytes of BGR padded to a
  * 4-byte boundary.
  *
  * Discrimination from text/audio payloads is structural, not just magic:
  * besides the "BM" magic the parse requires the little-endian u32 at
  * offset 14 to equal 40 — ASCII text has no NUL bytes, so no text payload
  * ≥ 54 bytes can satisfy it (cross-codec rejection is spec-pinned).
  */
object Bmp {
  final case class BmpInfo(width: Int, height: Int)

  /** Pixel-struct stats of a decoded image: dimensions + per-channel sums
    * (integer-exact, so an SQL oracle recomputes them from the synth
    * formula). */
  final case class BmpStats(width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  private def layout(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    try {
      if (bytes == null || bytes.length < 54) return None
      if (bytes(0) != 'B' || bytes(1) != 'M') return None
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (bb.getInt(14) != 40) return None            // BITMAPINFOHEADER only
      val dataOff = bb.getInt(10)
      val w = bb.getInt(18)
      val h = bb.getInt(22)
      val planes = bb.getShort(26) & 0xffff
      val bpp = bb.getShort(28) & 0xffff
      val compression = bb.getInt(30)
      if (w <= 0 || h <= 0 || planes != 1 || bpp != 24 || compression != 0)
        return None
      // rows pad to 4 bytes; compute in Long so a crafted w > ~715M can't
      // overflow Int (negative rowBytes would slip past the bounds check
      // and crash the pixel loops instead of returning None)
      val rowBytesL = (w.toLong * 3 + 3) & ~3L
      // rowBytesL must itself fit the buffer BEFORE multiplying by h:
      // with w AND h both near 2^31 the product rowBytesL·h would overflow
      // even Long (≈1.4e19 > 2^63); capping rowBytesL at bytes.length
      // (< 2^31) bounds the product under 2^62
      if (dataOff < 54 || rowBytesL > bytes.length ||
          dataOff.toLong + rowBytesL * h > bytes.length)
        return None
      Some((dataOff, w, h))
    } catch { case _: Throwable => None }
  }

  /** Header parse only — feeds [[graft.operators.Multimodal.decodeKernel]]'s
    * width/height fields. None for non-BMP / corrupt bytes. */
  def parse(bytes: Array[Byte]): Option[BmpInfo] =
    layout(bytes).map { case (_, w, h) => BmpInfo(w, h) }

  /** REAL pixel decode: per-channel sums over every pixel (bottom-up rows
    * unwound to logical top-down order — the sums are order-invariant, the
    * unwinding matters for [[resampleStats]]). None for non-BMP bytes. */
  def stats(bytes: Array[Byte]): Option[BmpStats] =
    layout(bytes).map { case (dataOff, w, h) =>
      val rowBytes = (w * 3 + 3) & ~3
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        val rowOff = dataOff + (h - 1 - y) * rowBytes  // stored bottom-up
        var x = 0
        while (x < w) {
          val p = rowOff + 3 * x
          sb += bytes(p) & 0xff
          sg += bytes(p + 1) & 0xff
          sr += bytes(p + 2) & 0xff
          x += 1
        }
        y += 1
      }
      BmpStats(w, h, sr, sg, sb)
    }

  /** Nearest-neighbor downsample by integer `factor` (the multimodal
    * "resize" transform): output pixel (x, y) = source pixel (x·f, y·f),
    * output dims = ceil(dim / f). Returns the stats of the RESIZED image —
    * integer-exact for the oracle. None for non-BMP bytes or factor < 1. */
  def resampleStats(bytes: Array[Byte], factor: Int): Option[BmpStats] =
    if (factor < 1) None
    else layout(bytes).map { case (dataOff, w, h) =>
      val rowBytes = (w * 3 + 3) & ~3
      val ow = (w + factor - 1) / factor
      val oh = (h + factor - 1) / factor
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < oh) {
        val rowOff = dataOff + (h - 1 - y * factor) * rowBytes
        var x = 0
        while (x < ow) {
          val p = rowOff + 3 * (x * factor)
          sb += bytes(p) & 0xff
          sg += bytes(p + 1) & 0xff
          sr += bytes(p + 2) & 0xff
          x += 1
        }
        y += 1
      }
      BmpStats(ow, oh, sr, sg, sb)
    }

  /** 63-bit average-hash perceptual fingerprint (the aHash shape every
    * image-dedup pipeline starts from): sample an 8×8 grid of pixels
    * (nearest-neighbor, source (gx·w/8, gy·h/8)), take each sample's
    * channel SUM as its brightness, and set bit gy·8+gx when
    * brightness·64 > Σ(all 64 samples) — i.e. the sample is brighter than
    * the grid mean, in pure integer cross-multiplied form. Bits 0..62 only
    * (bit 63 stays clear so the print never collides with the −1 non-image
    * marker, and an SQL oracle can rebuild it without BIGINT sign wrap —
    * same cap discipline as [[Wav.pcm16Fingerprint]]). The comparison is
    * invariant under a uniform brightness shift of all channels
    * (brightness·64 > total ⟺ (brightness+3c)·64 > total+192c), which is
    * what makes it a DEDUP key rather than a byte hash — spec-pinned.
    * −1 for non-BMP bytes. */
  def ahash63(bytes: Array[Byte]): Long =
    layout(bytes) match {
      case None => -1L
      case Some((dataOff, w, h)) =>
        val rowBytes = (w * 3 + 3) & ~3
        val s = new Array[Long](64)
        var total = 0L
        var k = 0
        while (k < 64) {
          val sx = (k % 8) * w / 8
          val sy = (k / 8) * h / 8
          val p = dataOff + (h - 1 - sy) * rowBytes + 3 * sx
          s(k) = (bytes(p) & 0xff).toLong + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)
          total += s(k)
          k += 1
        }
        var fp = 0L
        k = 0
        while (k < 63) {
          if (s(k) * 64 > total) fp |= 1L << k
          k += 1
        }
        fp
    }

  val ahashUdf = udf((b: Array[Byte]) => ahash63(b))

  /** Deterministic 24-bpp BMP fixture: logical top-down pixel (x, y) has
    *   b = (31x + 17y + 7)  mod 256
    *   g = (13x + 29y + 11) mod 256
    *   r = (7x  + 23y + 13) mod 256
    * — pure integer arithmetic, so an SQL oracle recomputes every channel
    * sum exactly. Rows are stored bottom-up with 4-byte padding, as the
    * format mandates. Spec/verification use only. */
  def synthBmp(width: Int, height: Int): Array[Byte] =
    synthBmpSeeded(width, height, 0L)

  val synthUdf = udf((w: Int, h: Int) => synthBmp(w, h))

  /** Seeded variant of [[synthBmp]] (and its single implementation —
    * seed 0 IS the unseeded fixture): the seed offsets every channel
    * formula, so fixtures model DISTINCT images (same structure, shifted
    * content) — same-seed payloads are byte-identical, different seeds
    * produce different perceptual prints. Spec/verification use only. */
  def synthBmpSeeded(width: Int, height: Int, seed: Long): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val dataSize = rowBytes * height
    val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte)
    bb.putInt(54 + dataSize); bb.putInt(0); bb.putInt(54)
    bb.putInt(40); bb.putInt(width); bb.putInt(height)
    bb.putShort(1); bb.putShort(24)
    bb.putInt(0); bb.putInt(dataSize)
    bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
    val arr = bb.array()
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rowBytes   // bottom-up
      var x = 0
      while (x < width) {
        val p = rowOff + 3 * x
        arr(p) = ((31 * x + 17 * y + 7 + 5 * seed) % 256).toByte
        arr(p + 1) = ((13 * x + 29 * y + 11 + 5 * seed) % 256).toByte
        arr(p + 2) = ((7 * x + 23 * y + 13 + 5 * seed) % 256).toByte
        x += 1
      }
      y += 1
    }
    arr
  }

  val synthSeededUdf = udf((w: Int, h: Int, seed: Long) => synthBmpSeeded(w, h, seed))
  val statsUdf = udf((b: Array[Byte]) => stats(b))
  val resampleStatsUdf = udf((b: Array[Byte], f: Int) => resampleStats(b, f))
}
