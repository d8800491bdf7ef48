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
}
