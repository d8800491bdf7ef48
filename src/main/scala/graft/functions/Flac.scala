package graft.functions

import org.apache.spark.sql.functions.udf

/** FLAC STREAMINFO header parse — header-only, deterministic integer math.
  *
  * The reference's MIME allow-list admits `audio/flac`
  * (reference: src/main.rs:97-110) but its decoder (`hound`) is WAV-only
  * (src/main.rs:760-769), so FLAC bytes flow through with duration 0.0.
  * Parsing the mandatory first metadata block (STREAMINFO, 34 bytes)
  * recovers sample rate, channels, bit depth, and total samples — hence
  * duration — without any codec: pure bit-shifting over the first ~42
  * bytes, as cheap and scan-safe as the WAV header parse.
  */
object Flac {
  final case class FlacInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int, totalSamples: Long)

  /** `None` for non-FLAC / corrupt / missing-STREAMINFO bytes (STREAMINFO
    * is required to be the FIRST metadata block by the format spec). */
  def parse(bytes: Array[Byte]): Option[FlacInfo] = {
    try {
      if (bytes == null || bytes.length < 4 + 4 + 34) return None
      if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' || bytes(3) != 'C')
        return None
      val btype = bytes(4) & 0x7f // bit 7 = last-block flag
      val blen = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
      if (btype != 0 || blen < 34) return None
      val o = 8
      def u(i: Int): Int = bytes(o + i) & 0xff
      // 20-bit sample rate | 3-bit channels-1 | 5-bit bps-1 | 36-bit total
      val sr = (u(10) << 12) | (u(11) << 4) | (u(12) >>> 4)
      val ch = ((u(12) >>> 1) & 0x7) + 1
      val bps = (((u(12) & 1) << 4) | (u(13) >>> 4)) + 1
      val total = ((u(13) & 0xfL) << 32) | (u(14).toLong << 24) |
        (u(15).toLong << 16) | (u(16).toLong << 8) | u(17).toLong
      if (sr <= 0) None else Some(FlacInfo(sr, ch, bps, total))
    } catch { case _: Throwable => None }
  }

  /** Deterministic header-only FLAC fixture: `fLaC` magic + one last-block
    * STREAMINFO carrying (sampleRate, totalSamples), mono 16-bit, frame
    * payload omitted (the parse is header-only). Spec/verification use. */
  def synthFlacHeader(sampleRate: Int, totalSamples: Long): Array[Byte] = {
    val out = new Array[Byte](8 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last block, type 0 = STREAMINFO
    out(7) = 34
    val o = 8
    out(o) = (4096 >> 8).toByte; out(o + 1) = (4096 & 0xff).toByte // min block
    out(o + 2) = (4096 >> 8).toByte; out(o + 3) = (4096 & 0xff).toByte // max block
    // bytes 4..9: min/max frame size left 0 (unknown)
    out(o + 10) = ((sampleRate >> 12) & 0xff).toByte
    out(o + 11) = ((sampleRate >> 4) & 0xff).toByte
    out(o + 12) = (((sampleRate & 0xf) << 4) | /* ch-1=0 */ ((16 - 1) >> 4)).toByte
    out(o + 13) = ((((16 - 1) & 0xf) << 4) | ((totalSamples >> 32) & 0xf).toInt).toByte
    out(o + 14) = ((totalSamples >> 24) & 0xff).toByte
    out(o + 15) = ((totalSamples >> 16) & 0xff).toByte
    out(o + 16) = ((totalSamples >> 8) & 0xff).toByte
    out(o + 17) = (totalSamples & 0xff).toByte
    // bytes 18..33: MD5 left zero
    out
  }

  val synthUdf = udf((sr: Int, total: Long) => synthFlacHeader(sr, total))
}
