package graft.operators

import graft.core.PathNorm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The csv_path_rewriter companion tool as a DataFrame transform
  * (reference: scripts/csv_path_rewriter.py).
  *
  * Input: a metadata frame with absolute paths in `file_name`. Output columns:
  *   - `file_name` → basename (scripts/csv_path_rewriter.py:105-111)
  *   - `relative_path` → path relative to `--base-dir`, or to the longest
  *     common DIRECTORY prefix when no base dir is given
  *     (scripts/csv_path_rewriter.py:72-102)
  * All other columns pass through unchanged.
  *
  * The LCP is computed distributed with the min/max trick: the common prefix
  * of the lexicographic MIN and MAX of the parent dirs equals the common
  * prefix of the whole set — two cheap aggregates, no collect of paths.
  */
object PathRewriter {

  /** Longest common directory prefix (ends at a '/' boundary) of two paths. */
  def commonDirPrefix(a: String, b: String): String = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    val p = a.substring(0, i)
    val cut = p.lastIndexOf('/')
    if (cut < 0) "" else p.substring(0, cut + 1)
  }

  def rewrite(df: DataFrame, baseDir: Option[String] = None): DataFrame = {
    val norm = PathNorm.normalizeCol(col("file_name"))
    val withDir = df.withColumn("_norm", norm)
      .withColumn("_dir", regexp_replace(col("_norm"), "/[^/]*$", ""))
    val prefix = baseDir match {
      case Some(b) =>
        val nb = PathNorm.normalize(b)
        if (nb.endsWith("/")) nb else nb + "/"
      case None =>
        val r = withDir.agg(min(col("_dir")).as("mn"), max(col("_dir")).as("mx")).head()
        commonDirPrefix(r.getString(0) + "/", r.getString(1) + "/")
    }
    val others = df.columns.filterNot(_ == "file_name")
    withDir
      .withColumn("relative_path",
        when(col("_norm").startsWith(prefix),
          expr(s"substring(_norm, ${prefix.length + 1})")).otherwise(col("_norm")))
      .withColumn("file_name", element_at(split(col("_norm"), "/"), -1))
      .select(("file_name" +: "relative_path" +: others.toSeq).map(col): _*)
  }
}
