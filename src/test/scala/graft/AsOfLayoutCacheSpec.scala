package graft

/** Pins the `join_asof_bucketed` layout-cache contract (round-14 verdict
  * task 3): a COLD call builds the bucketed layout once (paying the
  * exchange+sort and running the in-process losslessness checksum gate),
  * a WARM call registers over the published files with ZERO builds and
  * zero layout writes — and both paths emit exactly `join_asof`'s rows
  * and run the carry exchange-free (`graft.assertPlans` is enabled for
  * the duration, so the operator's own zero-exchange require() executes
  * on both paths, including the new warm-path external-table
  * registration). */
class AsOfLayoutCacheSpec extends SparkSpec {
  private val Sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("cold build once + checksum gate, warm reuse with zero builds, rows = join_asof") {
    val root = tmpDir("asof-layout-spec")
    val prevRoot = sys.props.put("graft.asofLayoutRoot", root.getAbsolutePath)
    val prevAssert = sys.props.put("graft.assertPlans", "true")
    try {
      val oracle = rows(SparkEntry.queries("join_asof")(spark, Sf))
      assert(oracle.nonEmpty, "fixture must produce rows")

      val before = graft.queries.Analytics.asofLayoutBuilds.get()
      val cold = rows(SparkEntry.queries("join_asof_bucketed")(spark, Sf))
      assert(cold == oracle, "cold bucketed carry diverged from join_asof")
      assert(graft.queries.Analytics.asofLayoutBuilds.get() == before + 1,
        "cold call must build the layout exactly once")

      // the published layout: one fingerprint dir with a marker, no tmp residue
      val entries = Option(root.listFiles()).toSeq.flatten.map(_.getName).sorted
      assert(entries.size == 1 && entries.head.startsWith("u_"),
        s"unexpected cache contents: $entries")
      val dataDir = new java.io.File(root, entries.head)
      val fileSet = Option(dataDir.listFiles()).toSeq.flatten
        .map(f => (f.getName, f.lastModified(), f.length())).sorted

      val warm = rows(SparkEntry.queries("join_asof_bucketed")(spark, Sf))
      assert(warm == oracle, "warm bucketed carry diverged from join_asof")
      assert(graft.queries.Analytics.asofLayoutBuilds.get() == before + 1,
        "warm call must not rebuild the layout")
      val fileSet2 = Option(dataDir.listFiles()).toSeq.flatten
        .map(f => (f.getName, f.lastModified(), f.length())).sorted
      assert(fileSet2 == fileSet, "warm call must not touch the published files")
      // the published layout must carry the checksum sidecar (written into
      // the build tmp dir BEFORE the atomic rename — round-15 verdict
      // task 2, the warm-path in-process gate's reference quad)
      assert(new java.io.File(dataDir, "_GRAFT_ASOF_CHECKSUM").isFile,
        "published layout must include the checksum sidecar")
    } finally {
      prevRoot match {
        case Some(v) => sys.props.update("graft.asofLayoutRoot", v)
        case None => sys.props.remove("graft.asofLayoutRoot")
      }
      prevAssert match {
        case Some(v) => sys.props.update("graft.assertPlans", v)
        case None => sys.props.remove("graft.assertPlans")
      }
    }
  }

  test("warm checksum gate catches a silently corrupted published file") {
    // Corruption parquet itself tolerates: one bucket file's BYTES copied
    // over another bucket's file (names — and so bucket-id assignment —
    // unchanged). The scan succeeds, bucket clustering still "holds" from
    // the reader's viewpoint, but one bucket's rows are duplicated and
    // another's are lost — exactly the class of silent layout damage the
    // round-14 warm path (fingerprint-only) could not see in-process.
    val root = tmpDir("asof-layout-corrupt-spec")
    val prevRoot = sys.props.put("graft.asofLayoutRoot", root.getAbsolutePath)
    try {
      SparkEntry.queries("join_asof_bucketed")(spark, Sf).collect(): Unit // cold build
      val dataDir = Option(root.listFiles()).toSeq.flatten
        .find(_.getName.startsWith("u_")).get
      val parts = Option(dataDir.listFiles()).toSeq.flatten
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .sortBy(_.getName)
      assert(parts.size >= 2, s"need two bucket files to corrupt, got ${parts.size}")
      java.nio.file.Files.copy(parts(0).toPath, parts(1).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // Hadoop's local ChecksumFileSystem keeps a hidden `.<name>.crc`
      // sidecar per file — carry it along or the CRC layer (not the layer
      // under test) rejects the read
      val (crc0, crc1) = (new java.io.File(dataDir, s".${parts(0).getName}.crc"),
        new java.io.File(dataDir, s".${parts(1).getName}.crc"))
      if (crc0.isFile)
        java.nio.file.Files.copy(crc0.toPath, crc1.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
      // the JVM-wide file-status cache still holds the file's OLD length —
      // drop it so the scan reads the corrupted file instead of seeking
      // past EOF (which would fail loudly but in the wrong layer)
      org.apache.spark.sql.GraftBridge.resetFileStatusCache()
      spark.catalog.clearCache()
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("join_asof_bucketed")(spark, Sf).collect()
      }
      assert(e.getMessage.contains("checksum"),
        s"warm gate must name the checksum mismatch, got: ${e.getMessage}")
    } finally {
      prevRoot match {
        case Some(v) => sys.props.update("graft.asofLayoutRoot", v)
        case None => sys.props.remove("graft.asofLayoutRoot")
      }
    }
  }
}
