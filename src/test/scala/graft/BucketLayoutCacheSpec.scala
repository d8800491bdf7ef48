package graft

/** Pins the `join_bucketed` layout-cache contract (round 14, the
  * `join_asof_bucketed` machinery generalized through
  * [[graft.core.LayoutCache]]): a COLD call writes both bucketed tables
  * once, a WARM call registers external bucketed tables over the published
  * files with ZERO builds — and BOTH paths run the in-query losslessness
  * gate (bucketed aggregate bit-equal to the from-source aggregate) and
  * the zero-input-shuffle plan require (`graft.assertPlans` is enabled for
  * the duration, covering the new warm-path external-table registration). */
class BucketLayoutCacheSpec extends SparkSpec {
  private val Sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("cold build once + losslessness gate, warm reuse with zero builds") {
    val root = tmpDir("bucket-layout-spec")
    val prevRoot = sys.props.put("graft.bucketLayoutRoot", root.getAbsolutePath)
    val prevAssert = sys.props.put("graft.assertPlans", "true")
    try {
      val before = graft.queries.LakeOps.bucketLayoutBuilds.get()
      val cold = rows(SparkEntry.queries("join_bucketed")(spark, Sf))
      assert(cold.nonEmpty, "fixture must produce rows")
      assert(graft.queries.LakeOps.bucketLayoutBuilds.get() == before + 1,
        "cold call must build the layout exactly once")

      // the published layout: one fingerprint dir with a marker + both
      // table subdirs, no tmp residue
      val entries = Option(root.listFiles()).toSeq.flatten.map(_.getName).sorted
      assert(entries.size == 1 && entries.head.startsWith("u_"),
        s"unexpected cache contents: $entries")
      val dataDir = new java.io.File(root, entries.head)
      val subs = Option(dataDir.listFiles()).toSeq.flatten.map(_.getName).sorted
      assert(subs == Seq("_GRAFT_LAYOUT", "lineitem", "orders"),
        s"unexpected layout contents: $subs")
      def snapshot(): Seq[(String, Long, Long)] =
        Seq("orders", "lineitem").flatMap { t =>
          Option(new java.io.File(dataDir, t).listFiles()).toSeq.flatten
            .map(f => (f.getName, f.lastModified(), f.length()))
        }.sorted
      val fileSet = snapshot()

      val warm = rows(SparkEntry.queries("join_bucketed")(spark, Sf))
      assert(warm == cold, "warm run diverged from cold run")
      assert(graft.queries.LakeOps.bucketLayoutBuilds.get() == before + 1,
        "warm call must not rebuild the layout")
      assert(snapshot() == fileSet, "warm call must not touch the published files")
    } finally {
      prevRoot match {
        case Some(v) => sys.props.update("graft.bucketLayoutRoot", v)
        case None => sys.props.remove("graft.bucketLayoutRoot")
      }
      prevAssert match {
        case Some(v) => sys.props.update("graft.assertPlans", v)
        case None => sys.props.remove("graft.assertPlans")
      }
    }
  }
}
