package graft.core

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8

/** Content-fingerprinted, cross-process cache of expensive storage LAYOUTS
  * (bucketed+sorted tables written once, then joined/carried many times).
  *
  * The recurring-join operators (`join_bucketed`, `join_asof_bucketed`)
  * exist to demonstrate write-once-carry-many: the join's exchange (+sort)
  * is paid at layout-write time and every later query runs shuffle-free
  * off the published files. Re-paying the write per invocation measured
  * gate overhead instead of the carry (r13: `join_asof_bucketed` at
  * 48.8 s of a sf10 battery vs a 2.2 s warm carry), so the layout is
  * published under a content fingerprint and rebuilt only when the source
  * data actually changes.
  *
  * Contract (round 18 — the round-15 contract made content-exact):
  *   - the fingerprint covers the source file trees (relative path and
  *     length — sorted walk, NO mtimes: a bit-identical corpus restored
  *     with fresh timestamps must stay warm, the same content-not-mtime
  *     principle the r17 `-stale` fix applied to the bench series key;
  *     before r18 a restore cost a spurious ~108 s sf100 layout rebuild)
  *     PLUS a per-file content witness (first, last, and, for files
  *     ≥ 24 KB, two length-derived interior 4 KB samples disjoint from
  *     head and tail; for parquet the tail spans the footer: schema, row
  *     counts, column stats), the layout spec string, the caller's
  *     version tag, AND an internal walk-algorithm version — so a change
  *     to the witness algorithm itself (which bytes are sampled, which
  *     attrs are fed) invalidates EXPLICITLY instead of silently
  *     orphaning published layouts. The witness is a strong HEURISTIC,
  *     not a full-content hash: a same-length regeneration differing
  *     ONLY outside the ~16 KB sampled per file would still fingerprint
  *     identically. In practice any parquet rewrite moves the footer
  *     (row-group offsets, stats); the marker `require` below bounds
  *     what a collision could corrupt to a stale-data read, never a
  *     mixed layout;
  *   - a COLD call builds into a private tmp dir and atomically renames it
  *     into place; `cold` in the return means THIS CALL PUBLISHED — the
  *     loser of a concurrent race deletes its tmp, reads the winner's
  *     files, and reports warm, so build counters and cold-only gates
  *     count actual publishes;
  *   - every use (cold or warm) touches the entry dir's mtime, so the
  *     stale prune's 6h clock measures time-since-last-READ, not
  *     time-since-build: a layout another scale's sibling JVM is actively
  *     carrying never looks stale (the rounds-4/5 shared-warehouse flake
  *     is the cautionary tale; multi-scale sessions share one cacheRoot);
  *   - a marker file carries the fingerprint and is `require`d to match on
  *     every use, cold or warm.
  */
object LayoutCache {

  def rmTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
    f.delete(): Unit
  }

  /** Internal walk-algorithm version, fed into every fingerprint: when the
    * witness algorithm changes (sampled offsets, fed attributes — e.g. the
    * r18 mtime drop, or the r17 16 KB → 24 KB interior-sample guard),
    * bumping THIS string is what moves the keys, so invalidation of
    * previously published layouts is an explicit, reviewable act rather
    * than an incidental byproduct of the edit. */
  private val WalkVersion = "walk-v2-content-exact"

  /** SHA-256 over source trees (relative path and length — sorted walk, NO
    * mtimes: content decides warmth, so a bit-identical restore with fresh
    * timestamps stays warm — plus a content witness per regular file: the
    * first 4 KB, the last 4 KB, and — for files of 24 KB or more, where
    * disjointness from head/tail is guaranteed — 4 KB samples at len/3 and
    * 2·len/3, so an in-place regeneration whose differences lie strictly
    * in the middle of a big file is still caught unless it threads between
    * four probes) + the layout spec string + the caller's version tag +
    * [[WalkVersion]]; 24 hex chars is plenty for a cache key that is
    * validated structurally (marker file) on use. The witness read is
    * bounded at 16 KB/file — footer-speed for parquet trees of any row
    * count. Heuristic, not a full hash: see the contract note in the
    * class doc. */
  def fingerprint(version: String, dir: String, tables: Seq[String], spec: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def feed(x: String): Unit = md.update((x + "\n").getBytes(UTF_8))
    feed(WalkVersion)
    feed(version)
    feed(new File(dir).getAbsolutePath)
    feed(spec)
    tables.foreach { t =>
      val root = new File(dir, t)
      def walk(f: File): Unit = {
        feed(s"${f.getPath.stripPrefix(root.getPath)}:${f.length}")
        if (f.isDirectory)
          Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).foreach(walk)
        else if (f.isFile && f.length > 0) {
          val raf = new java.io.RandomAccessFile(f, "r")
          try {
            val len = raf.length
            val buf = new Array[Byte](math.min(4096L, len).toInt)
            raf.readFully(buf); md.update(buf)
            if (len > buf.length) {
              // interior samples only when disjointness from head/tail is
              // GUARANTEED: the 2·len/3 sample ends at 2·len/3 + 4096 and
              // the tail starts at len − 4096, so non-overlap needs
              // len ≥ 6·4096 (the pre-r17 guard of len > 4·4096 admitted
              // 16–24 KB files whose interior sample overlapped the tail —
              // harmless to determinism, but the invariant was misstated)
              if (len >= 6L * buf.length) Seq(len / 3, 2 * len / 3).foreach { off =>
                raf.seek(off); raf.readFully(buf); md.update(buf)
              }
              raf.seek(len - buf.length)
              raf.readFully(buf); md.update(buf)
            }
          } finally raf.close()
        }
      }
      walk(root)
    }
    md.digest().map("%02x".format(_)).mkString.take(24)
  }

  /** Returns (published data dir, cold). `build` receives the tmp dir to
    * write the layout into; it runs only on the cold path. The published
    * dir contains whatever `build` wrote plus the `_GRAFT_LAYOUT` marker.
    * `cold` = this call PUBLISHED the layout (a concurrent race's loser
    * builds but fails the atomic rename, discards its tmp, and reports
    * warm — it reads the winner's identical files). */
  def getOrBuild(cacheRoot: File, fp: String)(build: File => Unit): (File, Boolean) = {
    val dataDir = new File(cacheRoot, s"u_$fp")
    val marker = new File(dataDir, "_GRAFT_LAYOUT")
    var published = false
    if (!marker.isFile) {
      cacheRoot.mkdirs()
      // stale-entry hygiene: superseded fingerprints (regenerated testdata)
      // and crashed-build tmp dirs. "Stale" = UNREAD for hours — the touch
      // below refreshes the entry's mtime on every use, so a layout a
      // sibling JVM is actively carrying (another scale sharing this
      // cacheRoot) never qualifies, only genuinely abandoned entries do.
      val staleMs = 6L * 3600 * 1000
      Option(cacheRoot.listFiles()).toSeq.flatten
        .filter(d => d.isDirectory && d.getName != dataDir.getName &&
          System.currentTimeMillis() - d.lastModified() > staleMs)
        .foreach(rmTree)
      // re-check after the prune: a concurrent winner may have published
      // while this process walked the source trees — skipping the
      // duplicate build here narrows the cold race to the walk window
      if (!marker.isFile) {
        val nonce = java.util.UUID.randomUUID().toString.replace("-", "")
        val tmpDir = new File(cacheRoot, s"tmp_$nonce")
        build(tmpDir)
        java.nio.file.Files.write(new File(tmpDir, "_GRAFT_LAYOUT").toPath,
          fp.getBytes(UTF_8))
        try {
          java.nio.file.Files.move(tmpDir.toPath, dataDir.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          published = true
        } catch { case _: java.io.IOException if marker.isFile => rmTree(tmpDir) }
      }
    }
    require(new String(java.nio.file.Files.readAllBytes(marker.toPath), UTF_8) == fp,
      s"layout marker/fingerprint mismatch at $dataDir")
    // touch on EVERY use so the prune's clock above measures
    // time-since-last-read; the entry DIR's mtime is what the prune filter
    // inspects, and touching it leaves the published files untouched
    // (warm-path file-snapshot invariants pin name/mtime/length per file)
    try java.nio.file.Files.setLastModifiedTime(dataDir.toPath,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: java.io.IOException => () }
    (dataDir, published)
  }
}
