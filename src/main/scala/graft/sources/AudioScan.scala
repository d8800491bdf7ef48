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
  *   F2 symlinks   — Hadoop listing resolves links; divergence documented;
  *   F3 depth      — relative-path component count <= maxDepth (src/main.rs:664-666);
  *   F4 sidecar exclusion — drop the metadata file itself (src/main.rs:650-659);
  *   F5 MIME allow-list (opt-in) — magic-byte sniff (src/main.rs:695-707).
  */
object AudioScan {
  val DefaultMaxDepth = 50 // reference: src/main.rs:71-73

  def scan(
      spark: SparkSession,
      input: String,
      maxDepth: Int = DefaultMaxDepth,
      metadataFile: Option[String] = None,
      checkMimeType: Boolean = false): DataFrame = {
    val inputUri = new java.io.File(input).toURI.toString.stripSuffix("/")
    val raw = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(input)
    // relative path: strip the input prefix; empty → bare file name
    // (reference: src/main.rs:743-758)
    val rel0 = regexp_replace(col("path"), java.util.regex.Pattern.quote(inputUri + "/"), "")
    var df = raw
      .withColumn("relative_path", PathNorm.normalizeCol(rel0))
      .withColumn("file_name", PathNorm.fileNameCol(col("relative_path")))
      .withColumn("relative_path",
        when(length(col("relative_path")) === 0, col("file_name")).otherwise(col("relative_path")))
      .filter(PathNorm.depthCol(col("relative_path")) <= lit(maxDepth)) // F3
    metadataFile.foreach { mf => // F4: match by normalized relpath AND absolute path
      val abs = new java.io.File(mf).getAbsoluteFile.toURI.toString
      val relToInput = {
        val f = new java.io.File(mf).getAbsolutePath
        val in = new java.io.File(input).getAbsolutePath
        if (f.startsWith(in + "/")) Some(PathNorm.normalize(f.substring(in.length + 1))) else None
      }
      df = df.filter(col("path") =!= lit(abs))
      relToInput.foreach(rp => df = df.filter(col("relative_path") =!= lit(rp)))
    }
    if (checkMimeType) df = df.filter(Magic.isAudioCol(col("content"))) // F5
    df
  }
}
