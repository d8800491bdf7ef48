package graft

import org.apache.spark.sql.functions._
import graft.queries.{LakeOps, TextOps}

/** Semantics pins for the nearest as-of join, asymmetric shingle
  * containment, and URL-canonicalization dedup. */
class NearestContainmentSpec extends SparkSpec {

  /** Final plan nodes, descending AQE stages and reused exchanges (one
    * definition for every plan pin in this spec — same walk as
    * PlanPropertySpec). */
  private def planNodes(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case n => n }.flatMap {
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => s +: all(s.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r +: all(r.child)
        case n => Seq(n)
      }.distinct
    all(plan)
  }

  private def shuffleCount(nodes: Seq[org.apache.spark.sql.execution.SparkPlan]): Int =
    nodes.count(_.getClass.getSimpleName.startsWith("ShuffleExchange"))

  test("asOfNearest: direction choice, backward tie, exact match, no-match nulls") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 1L, 10L),    // prev 0 (d=10) vs next 50 (d=40) -> 0
      (2L, 1L, 100L),   // prev 50 (d=50) vs next 120 (d=20) -> 120
      (3L, 1L, 60L),    // prev 50 (d=10) vs next 70 (d=10) -> tie -> 50
      (4L, 1L, 50L),    // exact-time match -> itself, d=0
      (5L, 2L, 30L)     // user 2 has no right rows -> nulls
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (1L, 0L, 100L), (1L, 50L, 101L), (1L, 70L, 102L), (1L, 120L, 103L)
    ).toDF("user_id", "rt", "pid")
    val out = graft.operators.AsOfJoin
      .asOfNearest(left, right, "user_id", "t", "rt", Seq("pid"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
         Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    assert(out(1L) == ((Some(0L), Some(100L))))
    assert(out(2L) == ((Some(120L), Some(103L))))
    assert(out(3L) == ((Some(50L), Some(101L))), "equal distances must break backward")
    assert(out(4L) == ((Some(50L), Some(101L))))
    assert(out(5L) == ((None, None)))
  }

  test("asOfNearest: right-frame columns named like scratch names survive") {
    val s = spark
    import s.implicits._
    // `_t` and `_side` are the internal scratch bases; a right frame that
    // already owns them (and carries one) must keep its own values
    val left = Seq((1L, 1L, 10L)).toDF("event_id", "user_id", "t")
    val right = Seq((1L, 0L, 7L, 9L)).toDF("user_id", "rt", "_t", "_side")
    val out = graft.operators.AsOfJoin
      .asOfNearest(left, right, "user_id", "t", "rt", Seq("_t", "_side"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("asof__t") == 7L, "carried _t must be the user's column")
    assert(r.getAs[Long]("asof__side") == 9L, "carried _side must be the user's column")
  }

  test("join_asof_nearest plan: ONE window exchange (second sort is local)") {
    val nodes = planNodes(LakeOps.joinAsofNearest(spark, "/root/testdata/sf0.001"))
    val windows = nodes.filter(_.getClass.getSimpleName.startsWith("Window"))
    // purchases-dedup agg = 1 exchange, the dual-carry window = 1 exchange;
    // the second directional pass must NOT add a third
    assert(shuffleCount(nodes) <= 2, s"expected <=2 exchanges, got ${shuffleCount(nodes)}")
    assert(windows.size >= 2, "both directional carries must be window passes")
  }

  test("events_ohlc_bars plan: one exchange serves both numberings AND the agg") {
    val nodes = planNodes(graft.queries.Analytics.eventsOhlcBars(spark, "/root/testdata/sf0.001"))
    // window partitioning == groupBy keys, so the final agg re-uses the
    // window exchange; the desc numbering adds only a partition-local sort
    assert(shuffleCount(nodes) == 1, s"expected exactly 1 exchange, got ${shuffleCount(nodes)}")
  }

  test("dedup_clusters_keepbest: kept doc is the longest member, ties to min id") {
    val dir = "/root/testdata/sf0.001"
    val clusters = TextOps.dedupClusters(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 400).select(col("doc_id"), col("n_chars"))
    val members = clusters.join(docs, Seq("doc_id")).cache()
    val kept = TextOps.dedupClustersKeepbest(spark, dir).cache()
    // every cluster appears exactly once, and the member count reconciles
    assert(kept.count() == members.select(col("canonical_id")).distinct().count())
    // the kept doc IS a member of its cluster with the cluster-max length
    val bad = kept.join(members,
        kept("canonical_id") === members("canonical_id") &&
        kept("kept_doc") === members("doc_id"), "left")
      .filter(members("doc_id").isNull || members("n_chars") =!= kept("max_len"))
      .count()
    assert(bad == 0, "kept_doc must be a member holding the max length")
    // no member beats (max_len, min id) — the deterministic argmax
    val beaten = kept.join(members, Seq("canonical_id"))
      .filter(members("n_chars") > kept("max_len") ||
        (members("n_chars") === kept("max_len") && members("doc_id") < kept("kept_doc")))
      .count()
    assert(beaten == 0, "a member outranks the kept doc")
    members.unpersist(); kept.unpersist()
  }

  test("dedup_recall_eval: counts are consistent and ppms derive from them") {
    val r = TextOps.dedupRecallEval(spark, "/root/testdata/sf0.001").head()
    val (nT, nP, tp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(tp <= math.min(nT, nP) && tp >= 0)
    assert(r.getLong(3) == (if (nP > 0) tp * 1000000L / nP else 0L))
    assert(r.getLong(4) == (if (nT > 0) tp * 1000000L / nT else 0L))
    // LSH at sig_agree>=6 must not miss exact-Jaccard>=0.75 pairs wholesale
    assert(nT == 0 || tp * 2 >= nT, s"recall collapsed: tp=$tp of $nT")
  }

  test("containment is ASYMMETRIC: contained doc scores 1e6, container scores lower") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft_containment").getAbsolutePath
    // doc 1 is verbatim inside doc 2; doc 2 has as much again of its own
    // tail; docs 3/4 duplicate the pair to push every shingle's df to 2..10
    val core = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val tail = "kilo lima mike november oscar papa quebec romeo sierra tango"
    Seq(
      (1L, core, "en", "w", 1L), (2L, s"$core $tail", "en", "w", 2L),
      (3L, core, "en", "w", 3L), (4L, s"$core $tail", "en", "w", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.dedupContainment(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    // 1 ⊂ 2: every rare shingle of doc 1 appears in doc 2 -> exactly 1e6
    assert(rows((1L, 2L)) == 1000000L)
    // 2 ⊅ 1: doc 2's tail shingles are absent from doc 1 -> below threshold
    assert(!rows.contains((2L, 1L)), "container must not pass the 0.8 gate")
  }

  test("dedup_url: canonical groups equal the (host, path-id) partition of the corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val expected = docs
      .groupBy(lower(col("source")).as("h"), (col("doc_id") % 300).as("p"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("m"))
      .filter(col("n") >= 2)
      .select(col("h"), col("p"), col("n"), col("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val got = TextOps.dedupUrl(spark, dir).collect().map { r =>
      val url = r.getString(0)
      val host = url.stripPrefix("https://").takeWhile(_ != '.')
      val pid = url.substring(url.lastIndexOf('/') + 1).toLong
      (host, pid) -> (r.getLong(1), r.getLong(2))
    }.toMap
    assert(got == expected, "canonicalization must collapse exactly the dressed-up variants")
  }
}
