package graft.functions

import org.apache.spark.sql.functions.udf

/** AIFF COMM-chunk parse — header-only, deterministic integer math.
  *
  * The reference's MIME allow-list admits `audio/aiff` / `audio/x-aiff`
  * (reference: src/main.rs:97-110) but its decoder (`hound`) is WAV-only
  * (src/main.rs:760-769), so AIFF bytes flow through with duration 0.0.
  * AIFF is an IFF container: a FORM/AIFF header followed by chunks; the
  * COMM chunk carries channels, numSampleFrames, sampleSize, and the
  * sample rate as an 80-bit IEEE 754 extended float (1 sign + 15 exponent
  * + 64 explicit-integer-bit mantissa). All big-endian. Duration =
  * numSampleFrames / rate — recovered by a chunk walk + one extended-float
  * decode, the same header-only discipline as WAV/FLAC/OGG/MP3.
  */
object Aiff {
  final case class AiffInfo(sampleRate: Int, channels: Int, totalFrames: Long)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Long =
    ((be16(b, o).toLong) << 16) | be16(b, o + 2)
  private def id(b: Array[Byte], o: Int, s: String): Boolean =
    s.indices.forall(i => b(o + i) == s.charAt(i))

  /** 80-bit extended float at `o` → Double (positive normals only — a
    * sample rate; anything else returns NaN and fails validation). */
  private def ext80(b: Array[Byte], o: Int): Double = {
    val se = be16(b, o)
    if ((se & 0x8000) != 0) return Double.NaN // negative rate: invalid
    val exp = se & 0x7fff
    if (exp == 0 || exp == 0x7fff) return Double.NaN // zero/denorm/inf/nan
    var mant = 0L
    var i = 0
    while (i < 8) { mant = (mant << 8) | (b(o + 2 + i) & 0xff).toLong; i += 1 }
    if (mant >= 0) java.lang.Math.scalb(mant.toDouble, exp - 16383 - 63)
    else // top bit set: split to keep the unsigned 64-bit mantissa exact
      java.lang.Math.scalb((mant >>> 1).toDouble * 2.0 + (mant & 1L), exp - 16383 - 63)
  }

  /** `None` for non-AIFF / corrupt bytes. Strict FORM/AIFF magic + an even
    * chunk walk to a COMM chunk of the spec's exact 18-byte size. */
  def parse(bytes: Array[Byte]): Option[AiffInfo] = {
    try {
      if (bytes == null || bytes.length < 12 + 8 + 18) return None
      if (!id(bytes, 0, "FORM") || !id(bytes, 8, "AIFF")) return None
      var o = 12
      while (o + 8 <= bytes.length) {
        val size = be32(bytes, o + 4)
        if (id(bytes, o, "COMM")) {
          if (size < 18 || o + 8 + 18 > bytes.length) return None
          val ch = be16(bytes, o + 8)
          val frames = be32(bytes, o + 10)
          val rate = ext80(bytes, o + 16)
          if (ch <= 0 || rate.isNaN || rate <= 0 || rate != math.rint(rate) ||
            rate > Int.MaxValue) return None
          return Some(AiffInfo(rate.toInt, ch, frames))
        }
        o += 8 + size.toInt + (size.toInt & 1) // chunks are even-padded
        if (size < 0 || size > bytes.length) return None
      }
      None
    } catch { case _: Throwable => None }
  }

  /** Deterministic header-only AIFF fixture: FORM/AIFF + one 18-byte COMM
    * chunk (mono, 16-bit, integer `sampleRate`, `totalFrames`). 38 bytes.
    * Spec/verification use. */
  def synthAiff(sampleRate: Int, totalFrames: Long): Array[Byte] = {
    require(sampleRate > 0, s"rate must be positive: $sampleRate")
    val out = new Array[Byte](38)
    def put(o: Int, s: String): Unit = s.indices.foreach(i => out(o + i) = s.charAt(i).toByte)
    def wbe16(o: Int, v: Int): Unit = { out(o) = (v >> 8).toByte; out(o + 1) = v.toByte }
    def wbe32(o: Int, v: Long): Unit = { wbe16(o, (v >> 16).toInt & 0xffff); wbe16(o + 2, v.toInt & 0xffff) }
    put(0, "FORM"); wbe32(4, 30); put(8, "AIFF")
    put(12, "COMM"); wbe32(16, 18)
    wbe16(20, 1) // channels
    wbe32(22, totalFrames)
    wbe16(26, 16) // sample size bits
    // 80-bit extended float encode of the integer rate
    val h = 63 - java.lang.Long.numberOfLeadingZeros(sampleRate.toLong)
    wbe16(28, (16383 + h).toInt)
    val mant = sampleRate.toLong << (63 - h)
    (0 until 8).foreach(i => out(30 + i) = ((mant >>> (8 * (7 - i))) & 0xff).toByte)
    out
  }

  val synthUdf = udf((sr: Int, frames: Long) => synthAiff(sr, frames))
}
