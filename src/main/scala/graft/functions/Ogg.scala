package graft.functions

import org.apache.spark.sql.functions.udf

/** OGG/Vorbis header parse — header-only, deterministic integer math.
  *
  * The reference's MIME allow-list admits `audio/ogg` (reference:
  * src/main.rs:97-110) but its decoder (`hound`) is WAV-only
  * (src/main.rs:760-769), so OGG bytes flow through with duration 0.0.
  * Parsing the first Ogg page's Vorbis identification header recovers the
  * sample rate and channel count; the granule position of the LAST page in
  * the byte stream is, for Vorbis, the total PCM sample count — hence the
  * duration — all without any codec: pure byte scanning + little-endian
  * integer reads, as cheap and scan-safe as the WAV/FLAC header parses.
  */
object Ogg {
  final case class OggInfo(sampleRate: Int, channels: Int, totalSamples: Long)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)

  private def le64(b: Array[Byte], o: Int): Long =
    (le32(b, o) & 0xffffffffL) | ((le32(b, o + 4) & 0xffffffffL) << 32)

  private def isCapture(b: Array[Byte], o: Int): Boolean =
    b(o) == 'O' && b(o + 1) == 'g' && b(o + 2) == 'g' && b(o + 3) == 'S'

  /** `None` for non-OGG / corrupt / non-Vorbis bytes. Requires a
    * beginning-of-stream page whose first packet is the Vorbis
    * identification header (0x01 "vorbis"), as the Vorbis I spec mandates. */
  def parse(bytes: Array[Byte]): Option[OggInfo] = {
    try {
      if (bytes == null || bytes.length < 27 + 1 + 30) return None
      if (!isCapture(bytes, 0)) return None
      if (bytes(4) != 0) return None // stream structure version
      if ((bytes(5) & 0x02) == 0) return None // must be beginning-of-stream
      val nsegs = bytes(26) & 0xff
      val payload = 27 + nsegs
      if (bytes.length < payload + 30) return None
      // Vorbis identification header: 0x01 "vorbis" ver(4) ch(1) rate(4le)
      if (bytes(payload) != 0x01) return None
      if (!(bytes(payload + 1) == 'v' && bytes(payload + 2) == 'o' &&
            bytes(payload + 3) == 'r' && bytes(payload + 4) == 'b' &&
            bytes(payload + 5) == 'i' && bytes(payload + 6) == 's')) return None
      if (le32(bytes, payload + 7) != 0) return None // vorbis_version
      val ch = bytes(payload + 11) & 0xff
      val sr = le32(bytes, payload + 12)
      if (sr <= 0 || ch <= 0) return None
      // total samples = granule position of the LAST page in the stream
      // (Vorbis I: granule counts decoded PCM samples). Scan from the end
      // for the final capture pattern; a granule of -1 (no finished
      // packets) or the BOS page's own 0 both mean "unknown" → 0.
      var i = bytes.length - 27
      var total = 0L
      var found = false
      while (i >= 0 && !found) {
        if (isCapture(bytes, i)) { total = le64(bytes, i + 6); found = true }
        i -= 1
      }
      if (total < 0) total = 0L
      Some(OggInfo(sr, ch, total))
    } catch { case _: Throwable => None }
  }

  /** Deterministic header-only OGG fixture: a BOS page carrying a mono
    * Vorbis identification header at `sampleRate`, then an empty EOS page
    * whose granule position is `totalSamples`. CRCs are zero (the parse
    * does not checksum). 85 bytes total. Spec/verification use. */
  def synthOggHeader(sampleRate: Int, totalSamples: Long): Array[Byte] = {
    val out = new Array[Byte](27 + 1 + 30 + 27)
    def cap(o: Int): Unit = { out(o) = 'O'; out(o + 1) = 'g'; out(o + 2) = 'g'; out(o + 3) = 'S' }
    def wle32(o: Int, v: Int): Unit = (0 until 4).foreach(i => out(o + i) = ((v >>> (8 * i)) & 0xff).toByte)
    def wle64(o: Int, v: Long): Unit = (0 until 8).foreach(i => out(o + i) = ((v >>> (8 * i)) & 0xff).toByte)
    // --- page 0: beginning-of-stream, one 30-byte segment ---
    cap(0)
    out(5) = 0x02 // header type: BOS
    wle64(6, 0L) // granule
    wle32(14, 1) // serial
    wle32(18, 0) // page sequence
    out(26) = 1 // one segment
    out(27) = 30 // segment length
    val p = 28
    out(p) = 0x01
    "vorbis".getBytes.zipWithIndex.foreach { case (b, i) => out(p + 1 + i) = b }
    // vorbis_version = 0 (bytes p+7..p+10 already zero)
    out(p + 11) = 1 // channels
    wle32(p + 12, sampleRate)
    // bitrates (12 bytes) zero; blocksizes 2^8|2^8; framing flag
    out(p + 28) = 0x88.toByte
    out(p + 29) = 0x01
    // --- page 1: end-of-stream, zero segments, granule = total samples ---
    val q = 27 + 1 + 30
    cap(q)
    out(q + 5) = 0x04 // header type: EOS
    wle64(q + 6, totalSamples)
    wle32(q + 14, 1) // serial
    wle32(q + 18, 1) // page sequence
    out(q + 26) = 0 // no segments
    out
  }

  val synthUdf = udf((sr: Int, total: Long) => synthOggHeader(sr, total))
}
