package graft.functions

import org.apache.spark.sql.functions.udf

/** RIFF/AVI container support — the VIDEO container lane: a real chunked
  * container (RIFF lists, stream headers, an MJPEG `movi` payload train and
  * the `idx1` index) whose frames are baseline JPEGs decoded by the full
  * [[Jpeg]] entropy pipeline. Complements the reference's audio-only RIFF
  * handling (WAV is RIFF too — `/root/reference/src/main.rs:586-607` parses
  * the same fourcc/chunk discipline for `fmt `): same container family, the
  * multi-frame variant.
  *
  * Writer and walker are both integer/bounds-checked byte code over the
  * public AVI 1.0 layout (MainAVIHeader 56 bytes, AVIStreamHeader 56 bytes,
  * BITMAPINFOHEADER 40 bytes); corrupt or out-of-lane input yields None,
  * never a throw — the codec contract shared by every decoder here.
  */
object Avi {

  private val MaxFrames = 4096

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)), "US-ASCII")

  /** Walk the container and return the MJPEG frame payloads (chunk ids
    * `00dc`/`00db`) from the first `movi` list, in stream order. None on
    * malformed RIFF structure, missing `movi`, or absurd frame counts. */
  def frames(bytes: Array[Byte]): Option[Array[Array[Byte]]] =
    try {
      if (bytes == null || bytes.length < 24) return None
      if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") return None
      val riffEnd = {
        val sz = u32(bytes, 4)
        if (sz < 4 || 8 + sz > bytes.length) return None
        (8 + sz).toInt
      }
      var off = 12
      while (off + 8 <= riffEnd) {
        val id = fourcc(bytes, off)
        val sz = u32(bytes, off + 4)
        if (sz < 0 || off + 8 + sz > riffEnd) return None
        if (id == "LIST" && sz >= 4 && fourcc(bytes, off + 8) == "movi") {
          val end = off + 8 + sz.toInt
          var p = off + 12
          val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          while (p + 8 <= end) {
            val cid = fourcc(bytes, p)
            val csz = u32(bytes, p + 4)
            if (csz < 0 || p + 8 + csz > end) return None
            if (cid.endsWith("dc") || cid.endsWith("db")) {
              if (out.length >= MaxFrames) return None
              out += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + csz.toInt)
            }
            p += 8 + csz.toInt
            if ((csz & 1L) == 1L) p += 1 // RIFF chunks are 2-byte aligned
          }
          return Some(out.toArray)
        }
        off += 8 + sz.toInt
        if ((sz & 1L) == 1L) off += 1
      }
      None
    } catch { case _: Throwable => None }

  // ---- fixture synthesizer ----

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Real AVI 1.0 file: `hdrl` (avih + one `vids`/`MJPG` stream), `movi`
    * with one `00dc` JPEG per frame (frame f carries [[Jpeg.synthJpeg]]
    * with seed `seed + f` → block-constant grays with the shared
    * closed-form oracle), and a flat `idx1`. Spec/fixture use only. */
  def synthAvi(wBlocks: Int, hBlocks: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val w = 8 * wBlocks; val h = 8 * hBlocks
    val frames = (0 until nFrames).map(f => Jpeg.synthJpeg(wBlocks, hBlocks, seed + f))
    val maxBuf = frames.map(_.length).maxOption.getOrElse(0) // 0-frame AVI is legal
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc(id) ++ le32(payload.length) ++ payload ++ pad
    }
    def list(kind: String, payload: Array[Byte]): Array[Byte] =
      cc("LIST") ++ le32(payload.length + 4) ++ cc(kind) ++ payload
    val avih = chunk("avih",
      le32(40000) ++ le32(maxBuf.toLong * 25) ++ le32(0) ++ le32(0x10) ++ // usec/frame, bytes/s, pad, HASINDEX
        le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(maxBuf) ++            // frames, initial, streams, bufsize
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))   // dims + reserved[4]
    val strh = chunk("strh",
      cc("vids") ++ cc("MJPG") ++ le32(0) ++ le32(0) ++ le32(0) ++        // type, handler, flags, prio/lang, initial
        le32(1) ++ le32(25) ++ le32(0) ++ le32(nFrames) ++                // scale, rate, start, length
        le32(maxBuf) ++ le32(0xffffffffL) ++ le32(0) ++                   // bufsize, quality, samplesize
        Array(0, 0, 0, 0).flatMap(_ => Array(0.toByte, 0.toByte)))        // rcFrame
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++
        Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++                 // planes=1, bitcount=24
        cc("MJPG") ++ le32(w.toLong * h * 3) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val moviChunks = frames.map(f => chunk("00dc", f))
    val movi = list("movi", moviChunks.toArray.flatten)
    // idx1 offsets are relative to the start of the `movi` list's payload
    // fourcc (the common convention readers accept)
    val idx = {
      var rel = 4L
      val rows = moviChunks.map { c =>
        val row = cc("00dc") ++ le32(0x10) ++ le32(rel) ++ le32(u32(c, 4))
        rel += c.length
        row
      }
      chunk("idx1", rows.toArray.flatten)
    }
    val body = cc("AVI ") ++ hdrl ++ movi ++ idx
    cc("RIFF") ++ le32(body.length) ++ body
  }

  val synthUdf = udf((wb: Int, hb: Int, nf: Int, seed: Long) => synthAvi(wb, hb, nf, seed))
  val framesUdf = udf((b: Array[Byte]) => frames(b))

  /** Per-sampled-frame decode stats (frame index, dims, gray sum). */
  final case class AviFrameStat(idx: Int, width: Int, height: Int, sumGray: Long)

  /** Container walk + every-`stride`-th-frame JPEG decode in ONE kernel
    * pass — frame sampling never materializes the unsampled frames in the
    * plan, and the whole video row reduces to a few stat structs before
    * any exchange. None if the container or ANY sampled frame is corrupt. */
  def frameStats(bytes: Array[Byte], stride: Int): Option[Array[AviFrameStat]] = {
    if (stride <= 0) return None
    frames(bytes).flatMap { fs =>
      val out = new Array[AviFrameStat]((fs.length + stride - 1) / stride)
      var i = 0
      while (i * stride < fs.length) {
        Jpeg.stats(fs(i * stride)) match {
          case Some(st) =>
            out(i) = AviFrameStat(i * stride, st.width, st.height, st.sum_r)
          case None => return None
        }
        i += 1
      }
      Some(out)
    }
  }

  val frameStatsUdf = udf((b: Array[Byte], stride: Int) => frameStats(b, stride))

  /** Single-pass count-and-sample kernel: TOTAL frame count plus the
    * sampled-frame stats, one container walk — the video-curation access
    * pattern (report coverage AND score samples without re-walking the
    * RIFF train). None on corrupt container, bad stride, or any corrupt
    * sampled frame. */
  def sampleStats(bytes: Array[Byte], stride: Int): Option[(Int, Array[AviFrameStat])] =
    if (stride <= 0) None
    else frames(bytes).flatMap { fs =>
      val out = new Array[AviFrameStat]((fs.length + stride - 1) / stride)
      var i = 0
      while (i * stride < fs.length) {
        Jpeg.stats(fs(i * stride)) match {
          case Some(st) =>
            out(i) = AviFrameStat(i * stride, st.width, st.height, st.sum_r)
          case None => return None
        }
        i += 1
      }
      Some((fs.length, out))
    }

  val sampleUdf = udf((b: Array[Byte], stride: Int) => sampleStats(b, stride))
}
