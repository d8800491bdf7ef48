package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row}

/** The inverse of the pipeline: explode a dataset's `audio` struct back into
  * files on disk — `outDir/<audio.path>` with the original bytes. The
  * reference's CI does this with its sibling `extract-audio` tool to turn a
  * HF parquet shard back into a WAV tree
  * (reference: .github/workflows/test-linux-x86_64-unknown-linux-gnu.yml:33-40).
  *
  * Executor tasks write their partitions' files directly (Hadoop FileSystem,
  * so HDFS/S3A work); nothing is collected to the driver.
  */
object AudioExploder {
  def explode(df: DataFrame, outDir: String): Unit = {
    df.select("audio.path", "audio.bytes").foreachPartition { rows: Iterator[Row] =>
      val conf = new Configuration()
      val base = new HPath(outDir)
      val fs = base.getFileSystem(conf)
      fs.setWriteChecksum(false)
      rows.foreach { r =>
        val rel = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (rel != null && bytes != null) {
          val target = new HPath(base, rel)
          val out = fs.create(target, true)
          try out.write(bytes) finally out.close()
        }
      }
    }
  }
}
