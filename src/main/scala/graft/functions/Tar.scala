package graft.functions

/** Minimal POSIX ustar reader/writer (public format, IEEE 1003.1) — the
  * transport under WebDataset-style training-data shards: a tar of sample
  * files where co-sampled components share a basename stem
  * (`00042.wav` + `00042.json` = one sample). Read side walks 512-byte
  * headers (octal size fields, checksum verified, regular files only,
  * long-name extensions out of lane); write side emits spec-conformant
  * ustar with correct checksums, so the shards are readable by stock
  * `tar`/WebDataset loaders.
  *
  * Implemented from the public spec rather than a JDK class because the
  * JDK has no tar support; the arithmetic is header-offset reads, no
  * compression (WebDataset convention is uncompressed tar — the member
  * files carry their own codecs).
  */
object Tar {
  final case class Entry(name: String, bytes: Array[Byte])

  private val Block = 512

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end) {
      val c = b(i) & 0xff
      if (c >= '0' && c <= '7') v = (v << 3) + (c - '0')
      else if (c != ' ' && c != 0) return -1L
      i += 1
    }
    v
  }

  private def headerChecksum(h: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < Block) {
      s += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xff)
      i += 1
    }
    s
  }

  /** All regular-file entries, or None on any malformed header (bad
    * checksum, non-octal size, truncated data). Directories and other
    * typeflags are skipped structurally. */
  def entries(bytes: Array[Byte]): Option[Seq[Entry]] =
    try {
      if (bytes == null || bytes.length < 2 * Block) return None
      val out = Seq.newBuilder[Entry]
      var off = 0
      var done = false
      while (!done) {
        if (off + Block > bytes.length) return None
        val hdr = java.util.Arrays.copyOfRange(bytes, off, off + Block)
        if (hdr.forall(_ == 0)) { done = true } // end-of-archive block
        else {
          val stored = octal(hdr, 148, 8)
          if (stored < 0 || stored != headerChecksum(hdr)) return None
          val size = octal(hdr, 124, 12)
          if (size < 0 || off + Block + size > bytes.length) return None
          val nameEnd0 = hdr.indexOf(0.toByte)
          val nameEnd = if (nameEnd0 < 0 || nameEnd0 > 100) 100 else nameEnd0
          val name = new String(hdr, 0, nameEnd, "US-ASCII")
          val tf = hdr(156) & 0xff
          if (tf == '0' || tf == 0) // regular file
            out += Entry(name,
              java.util.Arrays.copyOfRange(bytes, off + Block, off + Block + size.toInt))
          off += Block + ((size.toInt + Block - 1) / Block) * Block
        }
      }
      Some(out.result())
    } catch { case _: Throwable => None }

  /** Stream one entry (header + data + padding) to `out` — the streaming
    * form sinks use so a shard never buffers whole archives. */
  def writeEntryTo(out: java.io.OutputStream, e: Entry): Unit = {
    require(e.name.length <= 100, s"name too long for plain ustar: ${e.name}")
    val h = new Array[Byte](Block)
    val nm = e.name.getBytes("US-ASCII")
    System.arraycopy(nm, 0, h, 0, nm.length)
    def putOctal(off: Int, len: Int, v: Long): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      val b = padded.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
      h(off + len - 1) = 0
    }
    putOctal(100, 8, 420 /* 0644 */)
    putOctal(108, 8, 0); putOctal(116, 8, 0)
    putOctal(124, 12, e.bytes.length.toLong)
    putOctal(136, 12, 0)
    h(156) = '0'
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
    h(262) = 0; h(263) = '0'; h(264) = '0'
    val ck = headerChecksum(h)
    val cks = java.lang.Long.toOctalString(ck)
    val ckPadded = ("0" * (6 - cks.length)) + cks
    System.arraycopy(ckPadded.getBytes("US-ASCII"), 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    out.write(h)
    out.write(e.bytes)
    val pad = (Block - e.bytes.length % Block) % Block
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** The two end-of-archive zero blocks. */
  def finishTo(out: java.io.OutputStream): Unit =
    out.write(new Array[Byte](2 * Block))

  /** Spec-conformant ustar bytes for the given entries (names ≤ 100 chars,
    * mode 0644, epoch mtime — deterministic output for identical input). */
  def archive(es: Seq[Entry]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    es.foreach(writeEntryTo(bos, _))
    finishTo(bos)
    bos.toByteArray
  }
}
