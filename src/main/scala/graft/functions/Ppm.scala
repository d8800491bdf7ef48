package graft.functions

import org.apache.spark.sql.functions.udf

/** PPM (portable pixmap, binary `P6`) parsing — the second honest image
  * container next to [[Bmp]], the way FLAC/OGG/MP3/ADTS/AIFF stand next to
  * WAV on the audio side: a fully deterministic parse of a public format,
  * no codec library.
  *
  * STRICT-CANONICAL header only: `"P6\n<w> <h>\n255\n"` followed by
  * exactly w·h RGB byte triplets, top-down rows. The canonical form is
  * what every writer emits; restricting to it keeps discrimination
  * structural — document TEXT payloads flow through the same decode
  * kernel, and a prose string that happens to start with "P6" cannot
  * carry the `\n<digits> <digits>\n255\n` spine plus a correctly-sized
  * binary body (cross-codec rejection is spec-pinned, both directions).
  */
object Ppm {
  final case class PpmInfo(width: Int, height: Int)

  /** (pixelOff, w, h) for a strict-canonical P6 payload, else None. */
  private def layout(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    try {
      if (bytes == null || bytes.length < 11) return None
      if (bytes(0) != 'P' || bytes(1) != '6' || bytes(2) != '\n') return None
      var pos = 3
      def readInt(stop: Byte): Int = {
        var v = 0L
        var digits = 0
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0')
          digits += 1
          pos += 1
          if (v > Int.MaxValue) return -1
        }
        if (digits == 0 || pos >= bytes.length || bytes(pos) != stop) return -1
        pos += 1
        v.toInt
      }
      val w = readInt(' ')
      val h = readInt('\n')
      if (w <= 0 || h <= 0) return None
      // maxval must be literally "255\n"
      if (pos + 4 > bytes.length || bytes(pos) != '2' || bytes(pos + 1) != '5' ||
          bytes(pos + 2) != '5' || bytes(pos + 3) != '\n') return None
      pos += 4
      if (pos.toLong + 3L * w * h > bytes.length) return None
      Some((pos, w, h))
    } catch { case _: Throwable => None }
  }

  def parse(bytes: Array[Byte]): Option[PpmInfo] =
    layout(bytes).map { case (_, w, h) => PpmInfo(w, h) }

  /** REAL pixel decode: per-channel sums (rows are top-down RGB — no
    * bottom-up unwinding or padding, unlike BMP). Reuses [[Bmp.BmpStats]]
    * as the common image-stats shape. */
  def stats(bytes: Array[Byte]): Option[Bmp.BmpStats] =
    layout(bytes).map { case (off, w, h) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      val n = w * h
      while (i < n) {
        val p = off + 3 * i
        sr += bytes(p) & 0xff
        sg += bytes(p + 1) & 0xff
        sb += bytes(p + 2) & 0xff
        i += 1
      }
      Bmp.BmpStats(w, h, sr, sg, sb)
    }

  /** Deterministic P6 fixture with the SAME pixel formulas as
    * [[Bmp.synthBmp]] (r = 7x+23y+13, g = 13x+29y+11, b = 31x+17y+7, all
    * mod 256) — so a BMP and a PPM of the same dims carry the same image,
    * letting specs pin that the two container parses agree on content
    * statistics. Spec/verification use only. */
  def synthPpm(width: Int, height: Int): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = header.length + 3 * (y * width + x)
        out(p) = ((7 * x + 23 * y + 13) % 256).toByte
        out(p + 1) = ((13 * x + 29 * y + 11) % 256).toByte
        out(p + 2) = ((31 * x + 17 * y + 7) % 256).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  val synthUdf = udf((w: Int, h: Int) => synthPpm(w, h))
  val statsUdf = udf((b: Array[Byte]) => stats(b))
}
