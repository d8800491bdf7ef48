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
  * Contract (extracted verbatim from the round-14 `join_asof_bucketed`
  * implementation, now shared):
  *   - the fingerprint covers the source file trees (relative path, mtime,
  *     length — sorted walk), the layout spec string (buckets, sort, the
  *     written schema), and a version tag; any testdata regeneration moves
  *     an mtime → new fingerprint → rebuild;
  *   - a COLD call builds into a private tmp dir and atomically renames it
  *     into place; a concurrent loser deletes its tmp and reads the
  *     winner's files;
  *   - superseded fingerprints are pruned only once they are hours-stale,
  *     never while a sibling process could plausibly still read them (the
  *     rounds-4/5 shared-warehouse flake is the cautionary tale);
  *   - a marker file carries the fingerprint and is `require`d to match on
  *     every use, cold or warm.
  */
object LayoutCache {

  def rmTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
    f.delete(): Unit
  }

  /** SHA-256 over source trees (relative path, mtime, length — sorted walk)
    * + the layout spec string + a version tag; 24 hex chars is plenty for a
    * cache key that is validated structurally (marker file) on use. */
  def fingerprint(version: String, dir: String, tables: Seq[String], spec: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def feed(x: String): Unit = md.update((x + "\n").getBytes(UTF_8))
    feed(version)
    feed(new File(dir).getAbsolutePath)
    feed(spec)
    tables.foreach { t =>
      val root = new File(dir, t)
      def walk(f: File): Unit = {
        feed(s"${f.getPath.stripPrefix(root.getPath)}:${f.lastModified}:${f.length}")
        if (f.isDirectory)
          Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).foreach(walk)
      }
      walk(root)
    }
    md.digest().map("%02x".format(_)).mkString.take(24)
  }

  /** Returns (published data dir, cold). `build` receives the tmp dir to
    * write the layout into; it runs only on the cold path. The published
    * dir contains whatever `build` wrote plus the `_GRAFT_LAYOUT` marker. */
  def getOrBuild(cacheRoot: File, fp: String)(build: File => Unit): (File, Boolean) = {
    val dataDir = new File(cacheRoot, s"u_$fp")
    val marker = new File(dataDir, "_GRAFT_LAYOUT")
    val cold = !marker.isFile
    if (cold) {
      cacheRoot.mkdirs()
      // stale-entry hygiene: superseded fingerprints (regenerated testdata)
      // and crashed-build tmp dirs, pruned only once hours-old — a sibling
      // JVM mid-read of a freshly-superseded layout must never lose files
      val staleMs = 6L * 3600 * 1000
      Option(cacheRoot.listFiles()).toSeq.flatten
        .filter(d => d.isDirectory && d.getName != dataDir.getName &&
          System.currentTimeMillis() - d.lastModified() > staleMs)
        .foreach(rmTree)
      val nonce = java.util.UUID.randomUUID().toString.replace("-", "")
      val tmpDir = new File(cacheRoot, s"tmp_$nonce")
      build(tmpDir)
      java.nio.file.Files.write(new File(tmpDir, "_GRAFT_LAYOUT").toPath,
        fp.getBytes(UTF_8))
      try java.nio.file.Files.move(tmpDir.toPath, dataDir.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.io.IOException if marker.isFile => rmTree(tmpDir) }
    }
    require(new String(java.nio.file.Files.readAllBytes(marker.toPath), UTF_8) == fp,
      s"layout marker/fingerprint mismatch at $dataDir")
    (dataDir, cold)
  }
}
