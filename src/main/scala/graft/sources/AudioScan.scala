package graft.sources

import graft.core.PathNorm
import graft.functions.Magic
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — recursive directory scan of audio files
  * (reference: src/main.rs:662-712, `recv-dir` + NoSymlink.and(MaxDepth)).
  *
  * Spark's `binaryFile` source lists files distributed (driver only holds the
  * listing metadata, not contents), yields `path, modificationTime, length,
  * content`, and prunes `content` reads when a plan only touches metadata —
  * the listing scales to 100 TB corpora where the reference's `Vec<PathBuf>`
  * would not.
  *
  * Filters mirrored:
  *   F1 directories — implicit (binaryFile yields only files);
  *   F2 symlinks   — rows reached through a symlink below the input root are
  *                   dropped (reference walks with NoSymlink, src/main.rs:664):
  *                   per-row canonical-path check, executor-side, local-fs
  *                   only (object stores have no symlinks — the filter is
  *                   skipped for non-file schemes);
  *   F3 depth      — relative-path component count <= maxDepth (src/main.rs:664-666);
  *   F4 sidecar exclusion — drop the metadata file itself (src/main.rs:650-659);
  *   F5 MIME allow-list (opt-in) — magic-byte sniff (src/main.rs:695-707).
  */
object AudioScan {
  val DefaultMaxDepth = 50 // reference: src/main.rs:71-73

  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // Executor-side cache of canonicalized directories (files share parents;
  // one getCanonicalPath per directory instead of per file). Entries can go
  // stale if a directory is REPLACED by a symlink mid-JVM — the same race
  // an uncached getCanonicalPath has within one listing, since the scan
  // itself snapshots the tree — and the cache is size-bounded so long-lived
  // executors scanning many trees don't accrete entries forever.
  private val CanonCacheMax = 100000
  private val canonCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def canonicalParent(dir: java.io.File): String = {
    if (canonCache.size() > CanonCacheMax) canonCache.clear()
    canonCache.computeIfAbsent(dir.getPath, p => new java.io.File(p).getCanonicalPath)
  }

  /** @param excludeSymlinks F2 — per-row canonical-path check, LOCAL
    *   FILESYSTEM ONLY (skipped automatically for non-`file:` schemes:
    *   object stores have no symlinks). Cluster users scanning shared
    *   storage who want name-based pruning instead should pass
    *   `pathGlobFilter` — it is applied at LISTING time by the data source
    *   on any scheme, so excluded files are never opened at all.
    * @param pathGlobFilter binaryFile `pathGlobFilter` option (e.g.
    *   `*.wav`) — the scheme-independent escape hatch for pruning by name. */
  def scan(
      spark: SparkSession,
      input: String,
      maxDepth: Int = DefaultMaxDepth,
      metadataFile: Option[String] = None,
      checkMimeType: Boolean = false,
      excludeSymlinks: Boolean = true,
      pathGlobFilter: Option[String] = None,
      expandArchives: Boolean = false): DataFrame = {
    // Hadoop Path form (unencoded) — File.toURI percent-encodes spaces and
    // would never match binaryFile's raw `path` column
    val inputHPath = new org.apache.hadoop.fs.Path(new java.io.File(input).toURI)
    val inputUri = inputHPath.toString.stripSuffix("/")
    val reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    pathGlobFilter.foreach(reader.option("pathGlobFilter", _))
    val raw = reader.load(input)
    // relative path: strip the input prefix; empty → bare file name
    // (reference: src/main.rs:743-758)
    val rel0 = regexp_replace(col("path"), java.util.regex.Pattern.quote(inputUri + "/"), "")
    var df = raw
      .withColumn("relative_path", PathNorm.normalizeCol(rel0))
      .withColumn("file_name", PathNorm.fileNameCol(col("relative_path")))
      .withColumn("relative_path",
        when(length(col("relative_path")) === 0, col("file_name")).otherwise(col("relative_path")))
      .filter(PathNorm.depthCol(col("relative_path")) <= lit(maxDepth)) // F3
    // F2: a row whose canonical path differs from canonical(root)/relpath was
    // reached through a symlink (file or directory) — drop it. The real copy,
    // if under the root, is still listed via its real path. Local fs only.
    if (excludeSymlinks && inputHPath.toUri.getScheme == "file") {
      val rootAbs = new java.io.File(input).getAbsolutePath
      val rootCanon = new java.io.File(input).getCanonicalPath
      // below-root suffix unchanged under canonicalization ⇔ no symlink
      // between the root and the file (symlinks ABOVE the root are fine).
      // Hadoop Path, not java.net.URI: binaryFile paths are UNencoded, so
      // URI.create throws on spaces.
      val isRealPath = udf { (path: String) =>
        try {
          val f = new java.io.File(new org.apache.hadoop.fs.Path(path).toUri.getPath)
          val abs = f.getAbsolutePath
          !abs.startsWith(rootAbs + "/") || {
            // canonical(file) == canonical(parent)/name unless the leaf itself
            // is a symlink — caching canonical parents turns N syscalls per
            // directory into 1 on large listings
            !java.nio.file.Files.isSymbolicLink(f.toPath) &&
              canonicalParent(f.getParentFile) + "/" + f.getName ==
                rootCanon + abs.substring(rootAbs.length)
          }
        } catch {
          case e: Exception =>
            // fail CLOSED: a row this filter cannot verify must not slip
            // through the symlink exclusion it exists to enforce
            log.warn(s"symlink check failed for $path; dropping row", e)
            false
        }
      }
      df = df.filter(isRealPath(col("path")))
    }
    metadataFile.foreach { mf => // F4: match by normalized relpath AND absolute path
      // Hadoop Path form, not File.toURI: binaryFile's `path` is unencoded,
      // so a percent-encoding comparison misses paths with spaces
      val abs = new org.apache.hadoop.fs.Path(
        new java.io.File(mf).getAbsoluteFile.toURI).toString
      val relToInput = {
        val f = new java.io.File(mf).getAbsolutePath
        val in = new java.io.File(input).getAbsolutePath
        if (f.startsWith(in + "/")) Some(PathNorm.normalize(f.substring(in.length + 1))) else None
      }
      df = df.filter(col("path") =!= lit(abs))
      relToInput.foreach(rp => df = df.filter(col("relative_path") =!= lit(rp)))
    }
    // Engine extension (--expand-archives): zip bundles explode into their
    // entries IN THE EXECUTOR — archives are transport, so the expansion
    // happens before the MIME gate and the per-entry rows flow through the
    // same parse/join/shard pipeline as plain files. Entry paths use jar-URL
    // bang notation `bundle.zip!inner/name.wav`; a corrupt archive yields
    // zero rows (fail-closed, like the symlink gate). Local decompression
    // of one archive is the bounded unit of work — the 100 TB shape is many
    // archives, not one giant one.
    if (expandArchives) {
      val entriesUdf = udf { (bytes: Array[Byte]) =>
        try {
          val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
          val out = Seq.newBuilder[(String, Array[Byte])]
          var e = zin.getNextEntry
          while (e != null) {
            if (!e.isDirectory) out += ((e.getName, zin.readAllBytes()))
            e = zin.getNextEntry
          }
          zin.close()
          out.result()
        } catch { case _: Exception => Seq.empty[(String, Array[Byte])] }
      }
      val isZip = lower(col("file_name")).endsWith(".zip")
      val plain = df.filter(!isZip)
      val fromZip = df.filter(isZip)
        .withColumn("_e", explode(entriesUdf(col("content"))))
        .withColumn("relative_path",
          concat(col("relative_path"), lit("!"), PathNorm.normalizeCol(col("_e._1"))))
        .withColumn("file_name", PathNorm.fileNameCol(col("relative_path")))
        .withColumn("content", col("_e._2"))
        .withColumn("length", length(col("content")).cast("long"))
        .drop("_e")
      df = plain.unionByName(fromZip.select(plain.columns.map(col).toSeq: _*))
    }
    if (checkMimeType) df = df.filter(Magic.isAudioCol(col("content"))) // F5
    df
  }
}
