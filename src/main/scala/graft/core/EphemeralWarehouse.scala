package graft.core

/** Per-process `spark.sql.warehouse.dir` under the system tmpdir.
  *
  * Every graft JVM (Verify, Bench, sbt test) builds its session with
  * `config("spark.sql.warehouse.dir", EphemeralWarehouse.dir)` so managed
  * tables (the bucketed-join layout, spec fixtures) are process-private.
  * Sharing a CWD `spark-warehouse/` across concurrently-running JVMs is how
  * the `join_bucketed` oracle row flaked in rounds 4–5: any sweep or
  * overwrite in one process could delete a sibling's live table files
  * mid-read, yielding a plausible row count with a wrong hash. A unique
  * tmpdir per process makes that interference structurally impossible — no
  * prefix sweep needed.
  *
  * The directory is deleted on JVM exit; tables never need to outlive the
  * process (each run recreates its layout, nonce-named).
  */
object EphemeralWarehouse {
  lazy val dir: String = {
    val root = java.nio.file.Files.createTempDirectory("graft-wh-").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(): Unit
      }
      rm(root)
    }))
    root.getAbsolutePath
  }
}
