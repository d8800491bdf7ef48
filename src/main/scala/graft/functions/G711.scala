package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.functions.udf

/** REAL G.711 companded-audio decode (ITU-T G.711, public — the telephony
  * codec pair): µ-law and A-law 8-bit code expansion to linear PCM, read
  * from their native WAV containers (format tags 7 and 6). This is the
  * seventh audio family on the surface and the first COMPANDED one — the
  * decode is a true nonlinear segment/mantissa expansion (the classic Sun
  * `ulaw2linear`/`alaw2linear` formulation of the ITU tables), not a
  * container parse. Entirely integer arithmetic, so every decoded sample
  * — and any statistic over them — is exactly recomputable by an SQL
  * oracle.
  *
  * Lane: mono, 8 bits/sample, format tag 6 (A-law) or 7 (µ-law); anything
  * else (PCM WAVs included — those belong to [[Wav]]) returns None.
  */
object G711 {
  final case class G711Info(format: Int, sampleRate: Int, nSamples: Int)

  val MuLaw = 7 // WAVE_FORMAT_MULAW
  val ALaw = 6  // WAVE_FORMAT_ALAW

  /** µ-law byte → linear (Sun ulaw2linear: BIAS 0x84, 14-bit magnitudes). */
  def ulawToLinear(code: Int): Int = {
    val u = ~code & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law byte → linear (Sun alaw2linear: XOR 0x55, 13-bit magnitudes). */
  def alawToLinear(code: Int): Int = {
    val a = code ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    t = seg match {
      case 0 => t + 8
      case 1 => t + 0x108
      case _ => (t + 0x108) << (seg - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  /** Layout: (dataOff, nSamples, sampleRate, format) for a mono 8-bit
    * G.711 WAV; None otherwise. */
  private def layout(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] =
    try {
      if (bytes == null || bytes.length < 44) return None
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (bb.getInt(0) != 0x46464952 || bb.getInt(8) != 0x45564157) return None
      var pos = 12
      var format = 0; var channels = 0; var sampleRate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0L; var haveFmt = false
      while (pos + 8 <= bytes.length && (dataOff < 0 || !haveFmt)) {
        val id = bb.getInt(pos)
        val size = bb.getInt(pos + 4).toLong & 0xffffffffL
        if (id == 0x20746d66 && pos + 24 <= bytes.length) {
          format = bb.getShort(pos + 8) & 0xffff
          channels = bb.getShort(pos + 10) & 0xffff
          sampleRate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22) & 0xffff
          haveFmt = true
        } else if (id == 0x61746164) {
          dataOff = pos + 8
          dataLen = math.min(size, math.max(0L, bytes.length.toLong - (pos + 8)))
        }
        if (size > Int.MaxValue) return None
        pos += 8 + size.toInt + (size.toInt & 1)
      }
      if (!haveFmt || dataOff < 0 || (format != MuLaw && format != ALaw) ||
          channels != 1 || bits != 8 || sampleRate <= 0) return None
      Some((dataOff, dataLen.toInt, sampleRate, format))
    } catch { case _: Throwable => None }

  def parse(bytes: Array[Byte]): Option[G711Info] =
    layout(bytes).map { case (_, n, sr, f) => G711Info(f, sr, n) }

  /** Decode every sample through the matching expander; returns
    * (format, sampleRate, nSamples, sumAbs, sumLinear) — all integer,
    * all oracle-recomputable. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Long, Long)] =
    layout(bytes).map { case (dataOff, n, sr, f) =>
      var sumAbs = 0L; var sum = 0L
      var i = 0
      while (i < n) {
        val v = if (f == MuLaw) ulawToLinear(bytes(dataOff + i) & 0xff)
                else alawToLinear(bytes(dataOff + i) & 0xff)
        sumAbs += math.abs(v); sum += v
        i += 1
      }
      (f, sr, n, sumAbs, sum)
    }

  /** Deterministic fixture: code byte i = (37·i + 11 + 5·seed) mod 256,
    * wrapped in the native container for `format`. Codes-first synthesis:
    * no encoder needed, and the decode side still runs the full ITU
    * expansion. Spec/verification use only. */
  def synthG711(format: Int, sampleRate: Int, n: Int, seed: Long): Array[Byte] = {
    require(format == MuLaw || format == ALaw)
    val bb = ByteBuffer.allocate(44 + n).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952); bb.putInt(36 + n); bb.putInt(0x45564157)
    bb.putInt(0x20746d66); bb.putInt(16)
    bb.putShort(format.toShort); bb.putShort(1)
    bb.putInt(sampleRate); bb.putInt(sampleRate) // 1 byte/sample
    bb.putShort(1); bb.putShort(8)
    bb.putInt(0x61746164); bb.putInt(n)
    var i = 0
    while (i < n) { bb.put(((37L * i + 11 + 5 * seed) % 256).toByte); i += 1 }
    bb.array()
  }

  val synthUdf = udf((f: Int, sr: Int, n: Int, seed: Long) => synthG711(f, sr, n, seed))
  val decodeUdf = udf((b: Array[Byte]) => decode(b))

  /** The decoders as DuckDB SQL over a bound code expression `C` — the
    * oracle twin of [[ulawToLinear]]/[[alawToLinear]], kept adjacent so
    * the formulations cannot drift. */
  def ulawSql(c: String): String =
    s"(CASE WHEN (255 - ($c)) >= 128 THEN 132 - @T@ ELSE @T@ - 132 END)"
      .replace("@T@", s"((((255 - ($c)) % 16) * 8 + 132) * (1 << (((255 - ($c)) // 16) % 8)))")
  def alawSql(c: String): String = {
    val a = s"xor(($c), 85)"
    val seg = s"(($a // 16) % 8)"
    val t = s"(CASE WHEN $seg = 0 THEN ($a % 16) * 16 + 8 " +
      s"WHEN $seg = 1 THEN ($a % 16) * 16 + 264 " +
      s"ELSE (($a % 16) * 16 + 264) * (1 << ($seg - 1)) END)"
    s"(CASE WHEN $a >= 128 THEN $t ELSE -$t END)"
  }
}
