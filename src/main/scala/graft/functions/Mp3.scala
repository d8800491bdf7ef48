package graft.functions

import org.apache.spark.sql.functions.udf

/** MP3 (MPEG-1 Layer III) frame-header parse — header-only, deterministic
  * integer math.
  *
  * The reference's MIME allow-list admits `audio/mpeg` (reference:
  * src/main.rs:97-110) but its decoder (`hound`) is WAV-only
  * (src/main.rs:760-769), so MP3 bytes flow through with duration 0.0.
  * An MPEG-1 Layer III stream is a sequence of self-describing frames:
  * each 4-byte header carries the bitrate and sample-rate indices, from
  * which the frame's byte length follows (144·bitrate/rate + padding) and
  * each frame decodes to exactly 1152 PCM samples. Walking the frame chain
  * yields the frame count — hence the exact duration — without touching a
  * codec: the same header-only discipline as the WAV/FLAC/OGG parses.
  */
object Mp3 {
  final case class Mp3Info(sampleRate: Int, channels: Int, frames: Long)

  /** MPEG-1 Layer III bitrates (kbps) by header index; 0 = free, 15 = bad. */
  private val BitrateKbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  /** MPEG-1 sample rates by header index; index 3 reserved. */
  private val SampleRate = Array(44100, 48000, 32000, -1)

  /** Parse ONE frame header at `o`: Some((frameLenBytes, sampleRate,
    * channels)) or None if not a valid MPEG-1 Layer III header. */
  private def frame(b: Array[Byte], o: Int): Option[(Int, Int, Int)] = {
    if (o + 4 > b.length) return None
    if ((b(o) & 0xff) != 0xff || (b(o + 1) & 0xe0) != 0xe0) return None
    if (((b(o + 1) >> 3) & 0x3) != 0x3) return None // version: MPEG-1 only
    if (((b(o + 1) >> 1) & 0x3) != 0x1) return None // layer: III only
    val bi = (b(o + 2) >> 4) & 0xf
    val si = (b(o + 2) >> 2) & 0x3
    val pad = (b(o + 2) >> 1) & 0x1
    val br = BitrateKbps(bi); val sr = SampleRate(si)
    if (br <= 0 || sr <= 0) return None
    val len = 144 * br * 1000 / sr + pad
    val ch = if (((b(o + 3) >> 6) & 0x3) == 3) 1 else 2
    Some((len, sr, ch))
  }

  /** Walk the frame chain from byte 0. `None` unless the bytes start with a
    * valid frame and every frame's declared length lands exactly on the
    * next header (or end-of-stream) with a consistent sample rate — the
    * strictness that keeps WAV/FLAC/OGG/random bytes from misparsing. */
  def parse(bytes: Array[Byte]): Option[Mp3Info] = {
    try {
      if (bytes == null || bytes.length < 4) return None
      var o = 0
      var n = 0L
      var sr = 0
      var ch = 0
      while (o < bytes.length) {
        frame(bytes, o) match {
          case Some((len, s, c)) =>
            if (sr == 0) { sr = s; ch = c }
            else if (s != sr) return None
            n += 1; o += len
          case None => return None
        }
      }
      if (n == 0 || o != bytes.length) None else Some(Mp3Info(sr, ch, n))
    } catch { case _: Throwable => None }
  }

  /** Deterministic MP3 fixture: `nFrames` mono 128 kbps MPEG-1 Layer III
    * frames at `sampleRate` (must be 44100/48000/32000), zero payload
    * bytes. Frame length = 144·128000/rate, no padding. Spec use. */
  def synthMp3(sampleRate: Int, nFrames: Int): Array[Byte] = {
    val si = SampleRate.indexOf(sampleRate)
    require(si >= 0 && si < 3, s"unsupported MPEG-1 rate: $sampleRate")
    val len = 144 * 128000 / sampleRate
    val out = new Array[Byte](len * nFrames)
    (0 until nFrames).foreach { f =>
      val o = f * len
      out(o) = 0xff.toByte
      out(o + 1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
      out(o + 2) = ((9 << 4) | (si << 2)).toByte // 128 kbps, no padding
      out(o + 3) = 0xc0.toByte // mono
    }
    out
  }

  val synthUdf = udf((sr: Int, n: Int) => synthMp3(sr, n))
}
