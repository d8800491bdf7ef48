package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bmp, Wav}
import graft.queries.TextOps

/** Semantics pins for the image-modality codec (BMP parse / pixel stats /
  * nearest-neighbor resize), the PCM transforms (resample, VAD trim), and
  * the corpus-wide MinHash-LSH→CC dedup pipeline. Cross-engine value
  * equality is the oracle gate's job; these pin kernel-level invariants and
  * the corrupt-input / cross-codec discrimination contracts. */
class ImageAudioOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // ---- BMP container ----

  test("bmp: synth roundtrips dims; pixel sums match the direct formula") {
    val (w, h) = (5, 3)
    val bytes = Bmp.synthBmp(w, h)
    assert(Bmp.parse(bytes).contains(Bmp.BmpInfo(w, h)))
    val st = Bmp.stats(bytes).get
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      sb += (31 * x + 17 * y + 7) % 256
      sg += (13 * x + 29 * y + 11) % 256
      sr += (7 * x + 23 * y + 13) % 256
    }
    assert((st.sum_r, st.sum_g, st.sum_b) == ((sr, sg, sb)))
    // row padding: file size = 54 + ((w*3+3) & ~3) * h
    assert(bytes.length == 54 + ((w * 3 + 3) & ~3) * h)
  }

  test("bmp: corrupt and cross-codec payloads are rejected, and vice versa") {
    assert(Bmp.parse(null).isEmpty)
    assert(Bmp.parse(Array[Byte]()).isEmpty)
    assert(Bmp.parse("BM but not a bitmap, just text that is long enough......"
      .getBytes("UTF-8")).isEmpty)          // ASCII can't fake headerSize=40
    val truncated = Bmp.synthBmp(8, 8).take(60)  // header claims more pixels
    assert(Bmp.parse(truncated).isEmpty)
    // audio payloads must not parse as images, nor images as audio
    assert(Bmp.parse(Wav.synthPcmWav(8000, 100)).isEmpty)
    assert(Wav.pcm16Rms(Bmp.synthBmp(8, 8)).isEmpty)
    assert(graft.functions.Flac.parse(Bmp.synthBmp(8, 8)).isEmpty)
    // the shared kernel routes BMP to real width/height
    val dec = graft.operators.Multimodal.decodeKernel(Bmp.synthBmp(9, 4))
    assert(dec._3 == 9 && dec._4 == 4 && dec._6 == 0)
    // crafted width > ~715M used to overflow Int in rowBytes (w*3 negative),
    // slipping past the bounds check and crashing the pixel loops
    val huge = Bmp.synthBmp(4, 2).clone()
    java.nio.ByteBuffer.wrap(huge).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 800000000)
    assert(Bmp.parse(huge).isEmpty)
    assert(Bmp.stats(huge).isEmpty)
    assert(Bmp.ahash63(huge) == -1L)
    // w AND h both near 2^31: rowBytes·h overflows even LONG (≈1.4e19);
    // the rowBytes≤length pre-guard must reject before the product is formed
    val huge2 = Bmp.synthBmp(4, 2).clone()
    java.nio.ByteBuffer.wrap(huge2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, Int.MaxValue).putInt(22, Int.MaxValue)
    assert(Bmp.parse(huge2).isEmpty)
    assert(Bmp.stats(huge2).isEmpty)
    assert(Bmp.ahash63(huge2) == -1L)
  }

  test("bmp resize: ceil dims, sampled grid, factor 1 = identity") {
    val bytes = Bmp.synthBmp(5, 3)
    val st = Bmp.resampleStats(bytes, 2).get
    assert(st.width == 3 && st.height == 2)
    var sr = 0L
    for (y <- 0 until 2; x <- 0 until 3)
      sr += (7 * (2 * x) + 23 * (2 * y) + 13) % 256
    assert(st.sum_r == sr)
    assert(Bmp.resampleStats(bytes, 1).contains(Bmp.stats(bytes).get))
    assert(Bmp.resampleStats(bytes, 0).isEmpty)
  }

  test("ppm: strict-canonical parse, container-independent content stats") {
    val ppm = graft.functions.Ppm.synthPpm(5, 3)
    assert(graft.functions.Ppm.parse(ppm).contains(graft.functions.Ppm.PpmInfo(5, 3)))
    // same dims + same pixel formulas ⇒ BMP and PPM carry the SAME image:
    // both containers must report identical channel sums
    assert(graft.functions.Ppm.stats(ppm).get == Bmp.stats(Bmp.synthBmp(5, 3)).get)
    // strict canonical form only: space after magic, truncated body, wrong
    // maxval are all rejected
    assert(graft.functions.Ppm.parse("P6 5 3 255 xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx".getBytes).isEmpty)
    assert(graft.functions.Ppm.parse(ppm.take(ppm.length - 1)).isEmpty)
    assert(graft.functions.Ppm.parse("P6\n5 3\n254\n".getBytes ++ Array.fill[Byte](45)(1)).isEmpty)
    // cross-codec rejection, both directions
    assert(graft.functions.Ppm.parse(Bmp.synthBmp(5, 3)).isEmpty)
    assert(Bmp.parse(ppm).isEmpty)
    assert(graft.functions.Ppm.parse(Wav.synthPcmWav(8000, 50)).isEmpty)
    // the shared kernel routes PPM to real width/height
    val dec = graft.operators.Multimodal.decodeKernel(graft.functions.Ppm.synthPpm(9, 4))
    assert(dec._3 == 9 && dec._4 == 4 && dec._6 == 0)
  }

  // ---- PNG container (entropy-coded: zlib inflate + unfiltering) ----

  test("png: synth roundtrips dims; sums match the formula; IDAT may split") {
    import graft.functions.Png
    val bytes = Png.synthPng(5, 3, seed = 2)
    assert(Png.parse(bytes).contains(Png.PngInfo(5, 3, 8, 0)))
    var s = 0L
    for (y <- 0 until 3; x <- 0 until 5) s += (7 * x + 23 * y + 13 + 10) % 256
    val st = Png.stats(bytes).get
    assert((st.sum_r, st.sum_g, st.sum_b) == ((s, s, s))) // grey = (g,g,g)
    // the shared kernel routes PNG to real width/height
    val dec = graft.operators.Multimodal.decodeKernel(Png.synthPng(9, 4, 0))
    assert(dec._3 == 9 && dec._4 == 4 && dec._6 == 0)
    // the zlib stream split across two IDAT chunks decodes identically
    val raw = new Array[Byte](3 * 6)
    for (y <- 0 until 3) { raw(y * 6) = 0
      for (x <- 0 until 5) raw(y * 6 + 1 + x) = ((7 * x + 23 * y + 23) % 256).toByte }
    val one = Png.wrapRaster(5, 3, 0, raw)
    val two = Png.wrapRaster(5, 3, 0, raw, splitIdat = true)
    assert(Png.stats(two).contains(Png.stats(one).get))
  }

  test("png: all five W3C filter types reconstruct the same pixels") {
    import graft.functions.Png
    val (w, h) = (6, 5)
    val px = Array.tabulate(h, w)((y, x) => (47 * x + 91 * y + 3) % 256)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    // encode row y with filter type y (0..4), inverting each reconstruction
    val raw = new Array[Byte](h * (w + 1))
    for (y <- 0 until h) {
      raw(y * (w + 1)) = y.toByte
      for (x <- 0 until w) {
        val cur = px(y)(x)
        val a = if (x > 0) px(y)(x - 1) else 0
        val b = if (y > 0) px(y - 1)(x) else 0
        val c = if (x > 0 && y > 0) px(y - 1)(x - 1) else 0
        val f = y match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 => cur - paeth(a, b, c)
        }
        raw(y * (w + 1) + 1 + x) = f.toByte
      }
    }
    val st = Png.stats(Png.wrapRaster(w, h, 0, raw)).get
    assert(st.sum_r == px.map(_.map(_.toLong).sum).sum)
  }

  test("png: truecolour carries the same image as BMP/PPM; rejects align") {
    import graft.functions.Png
    val (w, h) = (5, 3)
    // raster with the BMP channel formulas in PNG's r,g,b order
    val raw = new Array[Byte](h * (3 * w + 1))
    for (y <- 0 until h) {
      raw(y * (3 * w + 1)) = 0
      for (x <- 0 until w) {
        val o = y * (3 * w + 1) + 1 + 3 * x
        raw(o) = ((7 * x + 23 * y + 13) % 256).toByte
        raw(o + 1) = ((13 * x + 29 * y + 11) % 256).toByte
        raw(o + 2) = ((31 * x + 17 * y + 7) % 256).toByte
      }
    }
    val png = Png.wrapRaster(w, h, 2, raw)
    val st = Png.stats(png).get
    val bm = Bmp.stats(Bmp.synthBmp(w, h)).get
    assert((st.sum_r, st.sum_g, st.sum_b) == ((bm.sum_r, bm.sum_g, bm.sum_b)))
    // cross-codec rejection, both directions; corrupt-input contract
    assert(Png.parse(Bmp.synthBmp(5, 3)).isEmpty)
    assert(Png.parse(graft.functions.Ppm.synthPpm(5, 3)).isEmpty)
    assert(Png.parse(Wav.synthPcmWav(8000, 50)).isEmpty)
    assert(Bmp.parse(png).isEmpty)
    assert(graft.functions.Ppm.parse(png).isEmpty)
    assert(Png.parse(null).isEmpty)
    assert(Png.parse(png.take(40)).isEmpty)           // truncated IHDR
    assert(Png.stats(png.take(png.length - 13)).isEmpty) // IEND gone
    val badZlib = png.clone()
    badZlib(8 + 25 + 8) = 0xff.toByte                 // wreck the zlib header
    assert(Png.stats(badZlib).isEmpty)
    val palette = png.clone(); palette(25) = 3        // colour type 3: out of lane
    assert(Png.parse(palette).isEmpty)
    val deep = png.clone(); deep(24) = 16             // 16-bit: out of lane
    assert(Png.parse(deep).isEmpty)
    val huge = png.clone()
    java.nio.ByteBuffer.wrap(huge).putInt(16, 0x40000000)
    assert(Png.parse(huge).isEmpty && Png.stats(huge).isEmpty)
  }

  // ---- JPEG container (Huffman entropy decode + dequant + IDCT) ----

  test("jpeg: synth battery decodes exactly through the full pipeline") {
    import graft.functions.Jpeg
    for (seed <- 0L to 5L; wb <- 1 to 4; hb <- 1 to 3) {
      val b = Jpeg.synthJpeg(wb, hb, seed)
      assert(Jpeg.parse(b).contains(Jpeg.JpegInfo(8 * wb, 8 * hb)))
      val st = Jpeg.stats(b).getOrElse(fail(s"stats None at $wb,$hb,$seed"))
      var exp = 0L
      for (by <- 0 until hb; bx <- 0 until wb) exp += 64L * Jpeg.blockGray(bx, by, seed)
      assert(st.sum_g == exp && st.sum_r == exp && st.sum_b == exp,
        s"block-constant DCT round-trip broke at $wb,$hb,$seed")
    }
  }

  test("jpeg: byte stuffing round-trips (engineered 0xFF scan byte)") {
    import graft.functions.Jpeg
    // DC walk −9,−9,−9,−9,−9,−19 then +127: 5·11 + 12 = 67 prefix bits
    // ≡ 3 (mod 8), so the final block's 8-run of 1-bits (7 amplitude ones
    // + EOB's leading 1) starts at bit 72 — byte-aligned → an 0xFF scan
    // byte the writer must stuff and the reader must unstuff
    val dcs = Seq(-9, -18, -27, -36, -45, -64, 63)
    val grays = dcs.map(dc => (dc + 64) * 2)
    val b = Jpeg.synthJpegBlocks(7, 1, (bx, _) => grays(bx))
    val stuffed = (2 until b.length - 3).exists(i =>
      (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0x00)
    assert(stuffed, "engineered fixture failed to produce an 0xFF00 pair")
    val st = Jpeg.stats(b).getOrElse(fail("stuffed fixture did not decode"))
    assert(st.sum_g == grays.map(64L * _).sum, "unstuffed decode wrong")
  }

  test("jpeg: corrupt and out-of-lane payloads reject; cross-codec disjoint") {
    import graft.functions.{Jpeg, Png, Ppm}
    val good = Jpeg.synthJpeg(3, 2, 9)
    assert(Jpeg.parse(null).isEmpty)
    assert(Jpeg.parse(Array[Byte]()).isEmpty)
    assert(Jpeg.parse(good.take(20)).isEmpty)               // truncated headers
    assert(Jpeg.stats(good.take(good.length - 20)).isEmpty) // truncated scan
    val prog = good.clone()
    // SOF0 -> SOF2 (progressive): find the FFC0 marker and rewrite it
    val sof = (2 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.parse(prog).isEmpty)
    val oddDims = good.clone()
    oddDims(sof + 7) = 0; oddDims(sof + 8) = 12 // width 12: not a block multiple
    assert(Jpeg.parse(oddDims).isEmpty)
    // a marker surfacing mid-scan must reject, not crash: overwrite the
    // first two entropy bytes with a premature EOI
    val sos = (2 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda).get
    val markerInScan = good.clone()
    markerInScan(sos + 10) = 0xff.toByte // SOS header is 10 bytes incl. marker
    markerInScan(sos + 11) = 0xd9.toByte
    assert(Jpeg.stats(markerInScan).isEmpty)
    // cross-codec: every other container rejects JPEG and vice versa
    assert(Jpeg.parse(Bmp.synthBmp(8, 8)).isEmpty)
    assert(Jpeg.parse(Png.synthPng(8, 8, 1)).isEmpty)
    assert(Jpeg.parse(Ppm.synthPpm(8, 8)).isEmpty)
    assert(Jpeg.parse(Wav.synthPcmWav(8000, 64)).isEmpty)
    assert(Bmp.parse(good).isEmpty && Png.parse(good).isEmpty && Ppm.parse(good).isEmpty)
    // crafted giant dims must be rejected before any allocation
    val huge = good.clone()
    huge(sof + 5) = 0x7f.toByte; huge(sof + 6) = 0xf8.toByte // height 32760
    huge(sof + 7) = 0x7f.toByte; huge(sof + 8) = 0xf8.toByte // width 32760
    assert(Jpeg.parse(huge).isEmpty && Jpeg.stats(huge).isEmpty)
    // the shared kernel routes JPEG to real width/height
    val dec = graft.operators.Multimodal.decodeKernel(Jpeg.synthJpeg(2, 3, 1))
    assert(dec._3 == 16 && dec._4 == 24 && dec._6 == 0)
  }

  // ---- GIF container (LZW entropy decode) ----

  test("gif: synth battery decodes exactly, across LZW width boundaries") {
    import graft.functions.Gif
    def expected(w: Int, h: Int, seed: Long): Long = {
      var s = 0L
      for (y <- 0 until h; x <- 0 until w) s += (7 * x + 23 * y + 13 + 5 * seed) % 256
      s
    }
    // small battery + sizes that force 9→10→11-bit codes and (at 18k px of
    // high-entropy pixels) a full-dictionary CLEAR reset mid-stream
    val cases = Seq((5, 3, 2L), (9, 4, 0L), (17, 11, 7L), (64, 64, 3L), (300, 60, 1L))
    cases.foreach { case (w, h, seed) =>
      val b = Gif.synthGif(w, h, seed)
      assert(Gif.parse(b).contains(Gif.GifInfo(w, h)), s"parse $w x $h")
      val st = Gif.stats(b).getOrElse(fail(s"stats None at $w x $h seed=$seed"))
      val e = expected(w, h, seed)
      assert((st.sum_r, st.sum_g, st.sum_b) == ((e, e, e)),
        s"LZW round-trip broke at $w x $h seed=$seed")
    }
    // the compressor must emit real dictionary codes, not literals: the
    // stream for a 64x64 image must be well under 9/8 byte-per-pixel
    val b = Gif.synthGif(64, 64, 3)
    assert(b.length - (13 + 768 + 10 + 1) < 64 * 64 * 9 / 8,
      "LZW stream is literal-sized — compressor not compressing")
    // same image as PNG: both containers must report identical sums
    assert(Gif.stats(Gif.synthGif(5, 3, 2)).get.sum_g ==
      graft.functions.Png.stats(graft.functions.Png.synthPng(5, 3, 2)).get.sum_g)
  }

  test("gif: corrupt and cross-codec payloads reject; kernel routes dims") {
    import graft.functions.{Gif, Jpeg, Png, Ppm}
    val good = Gif.synthGif(9, 4, 1)
    assert(Gif.parse(null).isEmpty)
    assert(Gif.parse("GIF89a but not really a gif".getBytes).isEmpty) // no GCT flag
    assert(Gif.parse(good.take(12)).isEmpty)
    assert(Gif.stats(good.take(good.length / 2)).isEmpty) // truncated sub-blocks
    // decode completes at the END code, so a missing trailer is tolerated
    assert(Gif.stats(good.take(good.length - 1)).isDefined)
    val badMin = good.clone()
    badMin(13 + 768 + 10) = 1 // LZW min code size below the legal floor
    assert(Gif.stats(badMin).isEmpty)
    val huge = good.clone()
    huge(6) = 0xff.toByte; huge(7) = 0x7f.toByte
    huge(8) = 0xff.toByte; huge(9) = 0x7f.toByte // 32767 x 32767 > MaxPixels
    assert(Gif.parse(huge).isEmpty && Gif.stats(huge).isEmpty)
    // cross-codec disjointness, both directions
    assert(Gif.parse(Bmp.synthBmp(5, 3)).isEmpty)
    assert(Gif.parse(Png.synthPng(5, 3, 0)).isEmpty)
    assert(Gif.parse(Jpeg.synthJpeg(2, 2, 0)).isEmpty)
    assert(Gif.parse(Wav.synthPcmWav(8000, 64)).isEmpty)
    assert(Bmp.parse(good).isEmpty && Png.parse(good).isEmpty &&
      Ppm.parse(good).isEmpty && Jpeg.parse(good).isEmpty)
    // the shared kernel routes GIF to real width/height
    val dec = graft.operators.Multimodal.decodeKernel(Gif.synthGif(9, 4, 0))
    assert(dec._3 == 9 && dec._4 == 4 && dec._6 == 0)
  }

  // ---- animated GIF (multi-frame / video shape) ----

  test("gif frames: every frame decodes to its formula; corrupt anim rejects") {
    import graft.functions.Gif
    val (w, h, nf, seed) = (7, 5, 4, 3L)
    val b = Gif.synthGifAnim(w, h, nf, seed)
    val fr = Gif.frames(b).getOrElse(fail("frames None on a valid animation"))
    assert(fr.length == nf)
    for (f <- 0 until nf) {
      var e = 0L
      for (y <- 0 until h; x <- 0 until w) e += (7 * x + 23 * y + 11 * f + 5 * seed) % 256
      assert(fr(f) == Gif.GifStats(w, h, e, e, e), s"frame $f mismatch")
    }
    // a single-image GIF yields exactly its stats() as the one frame
    val single = Gif.synthGif(5, 3, 2)
    assert(Gif.frames(single).contains(Seq(Gif.stats(single).get)))
    // truncation inside the SECOND frame kills the whole asset
    assert(Gif.frames(b.take(b.length - w * h / 2)).isEmpty)
    assert(Gif.frames("not a gif at all, truly not".getBytes).isEmpty)
  }

  // ---- RIFF/AVI container (MJPEG multi-frame / video shape) ----

  test("avi: container walk + sampled JPEG decode match the closed form") {
    import graft.functions.{Avi, Jpeg}
    def blockSum(wb: Int, hb: Int, seed: Long): Long = {
      var s = 0L
      for (by <- 0 until hb; bx <- 0 until wb)
        s += 2 * ((7 * bx + 23 * by + 13 + 5 * seed) % 128)
      64L * s
    }
    val (wb, hb, nf, seed) = (3, 2, 5, 4L)
    val b = Avi.synthAvi(wb, hb, nf, seed)
    // the walker recovers every MJPEG payload byte-exactly, in order
    val fr = Avi.frames(b).getOrElse(fail("frames None on a valid AVI"))
    assert(fr.length == nf)
    for (f <- 0 until nf)
      assert(fr(f).sameElements(Jpeg.synthJpeg(wb, hb, seed + f)), s"frame $f payload")
    // strided decode: every 2nd frame, exact block-grid sums
    val (total, st) = Avi.sampleStats(b, 2).getOrElse(fail("sampleStats None"))
    assert(total == nf && st.length == (nf + 1) / 2)
    st.zipWithIndex.foreach { case (s0, i) =>
      assert(s0 == Avi.AviFrameStat(2 * i, 8 * wb, 8 * hb, blockSum(wb, hb, seed + 2 * i)),
        s"sampled frame $i stats")
    }
    // stride 1 == full decode; frameStats agrees with sampleStats
    assert(Avi.frameStats(b, 1).get.length == nf)
    assert(Avi.frameStats(b, 2).get.toSeq == st.toSeq)
    // odd-length JPEG payloads exercise RIFF 2-byte chunk padding: walk a
    // battery of shapes and require exact recovery regardless of parity
    for (s2 <- 0L until 4L) {
      val v = Avi.synthAvi(1 + (s2 % 3).toInt, 1 + (s2 % 2).toInt, 3, s2)
      val fs = Avi.frames(v).getOrElse(fail(s"battery seed=$s2"))
      assert(fs.length == 3)
    }
    // a zero-frame AVI is a legal container: empty movi, empty sample set
    val empty = Avi.synthAvi(2, 2, 0, 1L)
    assert(Avi.frames(empty).exists(_.isEmpty))
    assert(Avi.sampleStats(empty, 2).contains((0, Array.empty[Avi.AviFrameStat])) ||
      Avi.sampleStats(empty, 2).exists { case (n, st) => n == 0 && st.isEmpty })
  }

  test("avi: corrupt and cross-container payloads reject") {
    import graft.functions.{Avi, Gif, Jpeg, Png}
    val good = Avi.synthAvi(2, 2, 3, 1L)
    assert(Avi.frames(null).isEmpty)
    assert(Avi.frames(good.take(20)).isEmpty)            // below min header
    assert(Avi.frames(good.take(good.length / 2)).isEmpty) // truncated movi
    val wav = Wav.synthPcmWav(8000, 64)
    assert(Avi.frames(wav).isEmpty)                      // RIFF but "WAVE " form
    val lyingSize = good.clone()
    lyingSize(4) = 0xff.toByte; lyingSize(5) = 0xff.toByte
    lyingSize(6) = 0xff.toByte; lyingSize(7) = 0x7f.toByte // riff size > file
    assert(Avi.frames(lyingSize).isEmpty)
    // a corrupt SAMPLED frame kills the asset; stride<=0 is rejected
    val badFrame = good.clone()
    // smash bytes inside the movi payload region (first frame's JPEG SOI)
    val moviAt = {
      var i = 12; var found = -1
      while (found < 0 && i + 12 < badFrame.length) {
        if (new String(badFrame.slice(i, i + 4), "US-ASCII") == "LIST" &&
            new String(badFrame.slice(i + 8, i + 12), "US-ASCII") == "movi") found = i
        i += 1
      }
      found
    }
    assert(moviAt > 0)
    badFrame(moviAt + 20) = 0x77 // inside first 00dc payload
    assert(Avi.sampleStats(badFrame, 1).isEmpty)
    assert(Avi.sampleStats(good, 0).isEmpty && Avi.sampleStats(good, -2).isEmpty)
    // cross-container disjointness, both directions
    assert(Avi.frames(Gif.synthGif(5, 3, 0)).isEmpty)
    assert(Avi.frames(Png.synthPng(5, 3, 0)).isEmpty)
    assert(Avi.frames(Jpeg.synthJpeg(2, 2, 0)).isEmpty)
    assert(Gif.parse(good).isEmpty && Png.parse(good).isEmpty &&
      Jpeg.parse(good).isEmpty && Bmp.parse(good).isEmpty)
    // WAV parser must not claim the AVI (same RIFF family, different form
    // fourcc) — it reports the reference's 0.0/0 fallback
    assert(Wav.parse(good) == Wav.WavInfo(0.0, 0))
  }

  // ---- ustar / WebDataset transport ----

  test("tar: round-trips; stock tar reads our archives; corrupt rejects") {
    import graft.functions.Tar
    val es = Seq(
      Tar.Entry("0001.wav", Wav.synthPcmWav(8000, 100)),
      Tar.Entry("0001.json", """{"label": 3}""".getBytes("UTF-8")),
      Tar.Entry("dir/0002.wav", Array.tabulate(700)(_.toByte))) // >1 block
    val b = Tar.archive(es)
    assert(b.length % 512 == 0)
    val back = Tar.entries(b).getOrElse(fail("own archive did not parse"))
    assert(back.map(_.name) == es.map(_.name))
    back.zip(es).foreach { case (g, w) => assert(g.bytes.sameElements(w.bytes)) }
    // STOCK tar must list and extract identical content (spec conformance)
    val d = tmpDir("graft-tar")
    val f = writeFile(d, "t.tar", b)
    import scala.sys.process._
    val listed = Seq("tar", "-tf", f.getAbsolutePath).!!.trim.split("\n").toSeq
    assert(listed == es.map(_.name), s"stock tar saw: $listed")
    assert(Seq("tar", "-xf", f.getAbsolutePath, "-C", d.getAbsolutePath).! == 0)
    val extracted = java.nio.file.Files.readAllBytes(
      new java.io.File(d, "0001.wav").toPath)
    assert(extracted.sameElements(es.head.bytes))
    // corrupt: bad checksum, truncated data, non-octal size
    val badCk = b.clone(); badCk(148) = '9'
    assert(Tar.entries(badCk).isEmpty)
    assert(Tar.entries(b.take(b.length - 1200)).isEmpty)
    val badSize = b.clone(); badSize(124) = 'x'
    assert(Tar.entries(badSize).isEmpty)
    assert(Tar.entries("definitely not a tar".getBytes).isEmpty)
  }

  // ---- G.711 companded audio ----

  test("g711: expanders hit the published extremes; container round-trips") {
    import graft.functions.G711
    // published anchor values of the ITU tables (Sun formulation):
    assert(G711.ulawToLinear(0xff) == 0)      // positive silence
    assert(G711.ulawToLinear(0x7f) == 0)      // negative silence
    assert(G711.ulawToLinear(0x80) == 32124)  // µ-law max magnitude
    assert(G711.ulawToLinear(0x00) == -32124)
    assert(G711.alawToLinear(0xd5) == 8)      // A-law smallest positive
    assert(G711.alawToLinear(0x55) == -8)
    assert(G711.alawToLinear(0xaa) == 32256)  // A-law max magnitude
    assert(G711.alawToLinear(0x2a) == -32256)
    // µ-law is symmetric through code complement-of-sign-bit
    for (c <- 0 to 127) assert(G711.ulawToLinear(c) == -G711.ulawToLinear(c | 0x80))
    // container: parse + decode agree with a direct reimplementation
    val b = G711.synthG711(G711.MuLaw, 8000, 100, 3)
    assert(G711.parse(b).contains(G711.G711Info(G711.MuLaw, 8000, 100)))
    val Some((f, sr, n, sumAbs, sum)) = G711.decode(b)
    assert(f == G711.MuLaw && sr == 8000 && n == 100)
    val vals = (0 until 100).map(i => G711.ulawToLinear(((37 * i + 11 + 15) % 256).toInt))
    assert(sumAbs == vals.map(v => math.abs(v).toLong).sum && sum == vals.map(_.toLong).sum)
    // cross-codec: PCM16 WAVs are NOT G.711, and G.711 WAVs are not PCM16
    assert(G711.parse(Wav.synthPcmWav(8000, 50)).isEmpty)
    assert(Wav.pcm16Rms(b).isEmpty)
    assert(G711.parse(b.take(40)).isEmpty)
    assert(G711.parse(graft.functions.Gif.synthGif(5, 3, 0)).isEmpty)
  }

  // ---- IMA ADPCM (predictive) ----

  test("adpcm: battery round-trips against a direct reimplementation") {
    import graft.functions.Adpcm
    // step table authenticity: 89 entries, 16 → 32767, monotone, ~1.1×
    assert(Adpcm.StepTable.length == 89)
    assert(Adpcm.StepTable.head == 7 && Adpcm.StepTable.last == 32767)
    Adpcm.StepTable.sliding(2).foreach { case Array(a, b) =>
      assert(b > a && b <= a * 1.15 + 1 && b >= a * 1.05 - 1, s"$a -> $b")
    }
    for (doc <- 0L until 150L) {
      val nb = 1 + (doc % 3).toInt
      val bytes = Adpcm.synthAdpcm(8000, nb, doc)
      assert(Adpcm.parse(bytes).contains(Adpcm.AdpcmInfo(8000, nb, 17)), s"parse doc=$doc")
      val got = Adpcm.decode(bytes)
      assert(got.isDefined, s"decode None at doc=$doc")
      // independent fold straight from the formulas
      var sum = 0L; var sumAbs = 0L; var n = 0
      for (b <- 0 until nb) {
        var p = (((31 * doc + 17 * b) % 4096) - 2048).toInt
        var s = ((doc + 3 * b) % 89).toInt
        sum += p; sumAbs += math.abs(p); n += 1
        for (j <- 0 until 16) {
          val code = ((7 * j + 5 * b + doc) % 16).toInt
          val (p2, s2) = Adpcm.step(p, s, code)
          p = p2; s = s2
          sum += p; sumAbs += math.abs(p); n += 1
        }
      }
      assert(got.contains((8000, n, sumAbs, sum)), s"doc=$doc got=$got want=($n,$sumAbs,$sum)")
    }
    // cross-codec: PCM16 / G.711 WAVs are not ADPCM and vice versa
    val b = Adpcm.synthAdpcm(8000, 2, 1)
    assert(Adpcm.parse(Wav.synthPcmWav(8000, 50)).isEmpty)
    assert(Adpcm.parse(graft.functions.G711.synthG711(7, 8000, 50, 1)).isEmpty)
    assert(Wav.pcm16Rms(b).isEmpty && graft.functions.G711.parse(b).isEmpty)
    assert(Adpcm.parse(b.take(40)).isEmpty)
  }

  test("adpcm chunks: segment sums partition the full decode; bounds honest") {
    import graft.functions.Adpcm
    for (doc <- 0L until 40L; bpc <- 1 to 4) {
      val nb = 2 + (doc % 5).toInt
      val bytes = Adpcm.synthAdpcm(8000, nb, doc)
      val full = Adpcm.decode(bytes).get
      val ch = Adpcm.chunkStats(bytes, bpc).getOrElse(fail(s"None doc=$doc bpc=$bpc"))
      // chunk grid: count, contiguous global sample positions, sizes
      assert(ch.length == (nb + bpc - 1) / bpc)
      ch.zipWithIndex.foreach { case (c, i) =>
        assert(c.chunk_id == i && c.start_sample == i.toLong * bpc * 17)
        val blocks = math.min(bpc, nb - i * bpc)
        assert(c.n_samples == blocks * 17)
      }
      // segmentation is LOSSLESS: chunk stats partition the full decode
      assert(ch.map(_.n_samples.toLong).sum == full._2)
      assert(ch.map(_.sum_abs).sum == full._3)
      assert(ch.map(_.sum_linear).sum == full._4)
      // a chunk-size of >= nb degenerates to the whole-file decode
      val one = Adpcm.chunkStats(bytes, nb + 3).get
      assert(one.length == 1 && one(0).sum_linear == full._4)
    }
    // bad chunk size / corrupt container reject
    val b = Adpcm.synthAdpcm(8000, 3, 1)
    assert(Adpcm.chunkStats(b, 0).isEmpty && Adpcm.chunkStats(b, -1).isEmpty)
    assert(Adpcm.chunkStats(b.take(40), 2).isEmpty)
    assert(Adpcm.chunkStats(Wav.synthPcmWav(8000, 50), 2).isEmpty)
  }

  // ---- PCM transforms ----

  test("pcm resample: identity at source rate, exact decimation, corrupt-safe") {
    val wav = Wav.synthPcmWav(16000, 120)
    val (nIn, nOut, rms) = Wav.pcm16Resample(wav, 16000)
    assert(nIn == 120 && nOut == 120)
    val Some((fullRms, _, _)) = Wav.pcm16Rms(wav)
    assert(rms == fullRms)                   // same samples, same order
    val (_, nOut4k, _) = Wav.pcm16Resample(wav, 4000)
    assert(nOut4k == 30)                     // 120 * 4000 / 16000
    assert(Wav.pcm16Resample("not audio at all".getBytes, 4000) == ((0, 0, 0.0)))
  }

  test("pcm vad trim: silent payload trims to nothing, loud payload keeps all") {
    val wav = Wav.synthPcmWav(16000, 64)
    // zero the data section → every frame silent
    val silent = wav.clone()
    java.util.Arrays.fill(silent, 44, silent.length, 0.toByte)
    assert(Wav.pcm16VadTrim(silent) == ((4, 0, -1, -1)))
    // max-amplitude payload → every frame voiced
    val loud = wav.clone()
    var i = 44
    while (i < loud.length) { loud(i) = 0xff.toByte; loud(i + 1) = 0x7f.toByte; i += 2 }
    assert(Wav.pcm16VadTrim(loud) == ((4, 4, 0, 3)))
    assert(Wav.pcm16VadTrim("not audio".getBytes) == ((0, 0, -1, -1)))
    // voiced test is the exact complement of the frame-stats silence test
    val (nf, nSilent, _) = Wav.pcm16FrameStats(wav)
    val (nf2, nVoiced, _, _) = Wav.pcm16VadTrim(wav)
    assert(nf == nf2 && nSilent + nVoiced == nf)
  }

  test("pcm curate: agrees with vad-trim, degenerates to resample when all voiced") {
    val wav = Wav.synthPcmWav(16000, 120)
    val (nf, nv, kept, nOut, rms) = Wav.pcm16Curate(wav, 4000)
    val (nf2, nv2, first, last) = Wav.pcm16VadTrim(wav)
    assert(nf == nf2 && nv == nv2)
    assert(kept == (if (nv == 0) 0 else (last - first + 1) * 16))
    // max-amplitude payload sized to a whole number of frames: trim keeps
    // everything, so the curate chain degenerates to the plain resample
    val loud = Wav.synthPcmWav(16000, 112)
    var i = 44
    while (i < loud.length) { loud(i) = 0xff.toByte; loud(i + 1) = 0x7f.toByte; i += 2 }
    val (_, _, keptAll, nOutAll, rmsAll) = Wav.pcm16Curate(loud, 4000)
    val (_, nOutPlain, rmsPlain) = Wav.pcm16Resample(loud, 4000)
    assert(keptAll == 112 && nOutAll == nOutPlain && rmsAll == rmsPlain)
    // silent payload: nothing kept, zero output
    val silent = wav.clone()
    java.util.Arrays.fill(silent, 44, silent.length, 0.toByte)
    assert(Wav.pcm16Curate(silent, 4000) == ((7, 0, 0, 0, 0.0)))
    assert(Wav.pcm16Curate("not audio".getBytes, 4000) == ((0, 0, 0, 0, 0.0)))
    assert(nOut == (kept.toLong * 4000 / 16000).toInt)
    assert(rms >= 0.0)
  }

  test("image phash: brightness-shift invariant, content-sensitive, -1 for non-images") {
    // hand-rolled image with headroom so +40 on every channel never wraps
    def img(shift: Int): Array[Byte] = {
      val base = Bmp.synthBmp(16, 12)
      val rowBytes = (16 * 3 + 3) & ~3
      for (y <- 0 until 12; x <- 0 until 16; c <- 0 until 3)
        base(54 + (12 - 1 - y) * rowBytes + 3 * x + c) =
          ((x * 7 + y * 5 + c * 11) % 180 + shift).toByte
      base
    }
    val fp = Bmp.ahash63(img(0))
    assert(fp == Bmp.ahash63(img(40)), "uniform brightness shift must not change the print")
    assert(fp != Bmp.ahash63(Bmp.synthBmpSeeded(16, 12, 3)), "different content must differ")
    assert((fp & (1L << 63)) == 0 && fp >= 0, "bit 63 must stay clear")
    assert(Bmp.ahash63("definitely not a bitmap, just filler text long enough".getBytes) == -1L)
    assert(Bmp.ahash63(Wav.synthPcmWav(8000, 100)) == -1L)
    // same seed -> byte-identical fixture -> identical print
    assert(Bmp.ahash63(Bmp.synthBmpSeeded(16, 12, 7)) == Bmp.ahash63(Bmp.synthBmpSeeded(16, 12, 7)))
  }

  // ---- corpus-wide LSH→CC dedup ----

  test("dedup_minhash_cc: total map, canonical ≤ id, LSH pairs co-clustered") {
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val cc = TextOps.dedupMinhashCc(spark, dir).cache()
    assert(cc.count() == nDocs, "every document must get a canonical id")
    assert(cc.select(countDistinct(col("doc_id"))).head.getLong(0) == nDocs)
    assert(cc.filter(col("canonical_id") > col("doc_id")).count() == 0)
    // every LSH candidate pair must land in the same cluster
    val pairs = TextOps.dedupMinhashLsh(spark, dir)
      .select(col("a_id"), col("b_id"))
    val broken = pairs
      .join(cc.withColumnRenamed("doc_id", "a_id").withColumnRenamed("canonical_id", "ca"), Seq("a_id"))
      .join(cc.withColumnRenamed("doc_id", "b_id").withColumnRenamed("canonical_id", "cb"), Seq("b_id"))
      .filter(col("ca") =!= col("cb")).count()
    assert(broken == 0, "an LSH pair crossed clusters")
    cc.unpersist()
  }
}
