package graft.functions

import org.apache.spark.sql.functions.udf

/** AAC ADTS frame-header parse — header-only, deterministic integer math.
  *
  * The reference's MIME allow-list admits `audio/aac` / `audio/x-aac`
  * (reference: src/main.rs:97-110) but its decoder (`hound`) is WAV-only
  * (src/main.rs:760-769), so AAC bytes flow through with duration 0.0.
  * An ADTS stream is a chain of self-describing frames: each 7-byte header
  * (9 with CRC) carries the sampling-frequency index and its own byte
  * length, and each raw data block decodes to 1024 PCM samples. Walking
  * the chain yields the sample count — hence the exact duration — without
  * a codec: the same discipline as the MP3 frame-chain walk, with the
  * layer field (00 here, 01 for MPEG Layer III) keeping the two
  * 0xFFF-sync parsers mutually exclusive.
  */
object Adts {
  final case class AdtsInfo(sampleRate: Int, channels: Int, totalSamples: Long)

  /** MPEG-4 sampling frequencies by index; 13+ reserved/forbidden. */
  private val SampleRate = Array(
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350, -1, -1, -1)

  /** Parse ONE frame header at `o`: Some((frameLenBytes, sampleRate,
    * channels, samples)) or None if not a valid ADTS header. */
  private def frame(b: Array[Byte], o: Int): Option[(Int, Int, Int, Int)] = {
    if (o + 7 > b.length) return None
    if ((b(o) & 0xff) != 0xff || (b(o + 1) & 0xf0) != 0xf0) return None
    if (((b(o + 1) >> 1) & 0x3) != 0x0) return None // layer: always 00 in ADTS
    val sfi = (b(o + 2) >> 2) & 0xf
    val sr = SampleRate(sfi)
    if (sr <= 0) return None
    val ch = (((b(o + 2) & 0x1) << 2) | ((b(o + 3) >> 6) & 0x3))
    val len = ((b(o + 3) & 0x3) << 11) | ((b(o + 4) & 0xff) << 3) | ((b(o + 5) >> 5) & 0x7)
    val headerLen = if ((b(o + 1) & 0x1) == 1) 7 else 9 // protection_absent
    if (len < headerLen) return None
    val blocks = (b(o + 6) & 0x3) + 1 // raw data blocks per frame
    Some((len, sr, ch, 1024 * blocks))
  }

  /** Walk the frame chain from byte 0. `None` unless the bytes start with a
    * valid frame and every frame's declared length lands exactly on the
    * next header (or end-of-stream) with a consistent sample rate. */
  def parse(bytes: Array[Byte]): Option[AdtsInfo] = {
    try {
      if (bytes == null || bytes.length < 7) return None
      var o = 0
      var samples = 0L
      var sr = 0
      var ch = 0
      while (o < bytes.length) {
        frame(bytes, o) match {
          case Some((len, s, c, smp)) =>
            if (sr == 0) { sr = s; ch = c }
            else if (s != sr) return None
            samples += smp; o += len
          case None => return None
        }
      }
      if (sr == 0 || o != bytes.length) None else Some(AdtsInfo(sr, ch, samples))
    } catch { case _: Throwable => None }
  }

  /** Deterministic ADTS fixture: `nFrames` header-only 7-byte frames
    * (AAC LC, mono, one 1024-sample block each) at `sampleRate` (must be
    * in the MPEG-4 table). Spec/verification use. */
  def synthAdts(sampleRate: Int, nFrames: Int): Array[Byte] = {
    val sfi = SampleRate.indexOf(sampleRate)
    require(sfi >= 0 && sfi < 13, s"unsupported MPEG-4 rate: $sampleRate")
    val out = new Array[Byte](7 * nFrames)
    (0 until nFrames).foreach { f =>
      val o = f * 7
      out(o) = 0xff.toByte
      out(o + 1) = 0xf1.toByte // MPEG-4, layer 00, protection absent
      out(o + 2) = ((1 << 6) | (sfi << 2)).toByte // AAC LC, channel cfg high bit 0
      out(o + 3) = ((1 << 6)).toByte // channel cfg 1 (mono); frame len bits 12-11 = 0
      out(o + 4) = 0 // frame len bits 10-3 = 0
      out(o + 5) = ((7 << 5) | 0x1f).toByte // frame len low bits = 7; fullness hi
      out(o + 6) = 0xfc.toByte // fullness lo; 1 raw data block
    }
    out
  }

  val synthUdf = udf((sr: Int, n: Int) => synthAdts(sr, n))
}
