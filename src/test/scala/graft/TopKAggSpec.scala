package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** `TopKByValueDesc` / `GroupTopK.topKByValueDesc` — the bounded-state
  * top-k aggregate. Pins (a) exact agreement with the salted-window
  * formulation on real data (same oracle contract); (b) the order edge
  * cases a window gets free but an aggregate must implement: NULLS LAST,
  * value ties broken by id ASC, groups smaller than k, k-boundary merges
  * across many partitions; (c) the plan claim: no WindowExec, partial+final
  * ObjectHashAggregate — the input never crosses the wire unreduced.
  */
class TopKAggSpec extends SparkSpec {

  test("agg form == salted window form on sf0.01 events (same result contract)") {
    val dir = "/root/testdata/sf0.01"
    val a = SparkEntry.queries("topk_events_agg")(spark, dir)
      .orderBy("event_type", "rank").collect().map(_.toSeq)
    val b = SparkEntry.queries("topk_events_salted")(spark, dir)
      .orderBy("event_type", "rank").collect().map(_.toSeq)
    assert(a.length == 25 && a.toSeq == b.toSeq)
  }

  test("NULLS LAST, id-asc ties, short groups, and the cross-partition merge path") {
    import spark.implicits._
    // group g1: ties at 9.0 (ids 3,4), a null (id 9), and filler — top-5 of 8
    // group g2: only 2 rows, one null — short group keeps both, null last
    val rows = Seq[(String, Long, Option[Double])](
      ("g1", 1L, Some(5.0)), ("g1", 2L, Some(7.0)), ("g1", 4L, Some(9.0)),
      ("g1", 3L, Some(9.0)), ("g1", 9L, None), ("g1", 5L, Some(1.0)),
      ("g1", 6L, Some(8.0)), ("g1", 7L, Some(6.0)),
      ("g2", 11L, Some(2.0)), ("g2", 12L, None))
    val df = rows.toDF("event_type", "event_id", "value").repartition(7)
    val got = graft.operators.GroupTopK
      .topKByValueDesc(df, Seq("event_type"), "value", "event_id", k = 5)
      .orderBy("event_type", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val want = Seq(
      ("g1", 1L, 3L, Some(9.0)), ("g1", 2L, 4L, Some(9.0)), ("g1", 3L, 6L, Some(8.0)),
      ("g1", 4L, 2L, Some(7.0)), ("g1", 5L, 7L, Some(6.0)),
      ("g2", 1L, 11L, Some(2.0)), ("g2", 2L, 12L, None))
    assert(got.toSeq == want, s"got ${got.toSeq}")
  }

  test("merge is exercised hard: 64 partitions of interleaved ranks reproduce the window answer") {
    import spark.implicits._
    // 10k rows, 3 groups, values collide every 50 — k-boundary merges in
    // every partial state; reference = the plain window on the same frame
    val df = (0 until 10000).map { i =>
      (s"t${i % 3}", i.toLong, Some((i % 50).toDouble))
    }.toDF("event_type", "event_id", "value").repartition(64)
    val got = graft.operators.GroupTopK
      .topKByValueDesc(df, Seq("event_type"), "value", "event_id", k = 5)
      .orderBy("event_type", "rank").collect().map(_.toSeq)
    val want = df.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
          .orderBy(col("value").desc_nulls_last, col("event_id"))))
      .filter(col("rank") <= 5)
      .select(col("event_type"), col("rank").cast("long"), col("event_id"), col("value"))
      .orderBy("event_type", "rank").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("property: random data (nulls, heavy ties, random k) matches a driver-side reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val gen = for {
      k <- Gen.chooseNum(1, 8)
      n <- Gen.chooseNum(0, 300)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        id <- Gen.chooseNum(0L, 10000L)
        v <- Gen.frequency(6 -> Gen.chooseNum(0, 9).map(d => Some(d.toDouble)), 1 -> Gen.const(None))
      } yield (g, id, v))
    } yield (k, rows.distinctBy(r => (r._1, r._2))) // unique (group, id): the total-order contract
    (0 until 12).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { case (k, rows) =>
        val got = graft.operators.GroupTopK
          .topKByValueDesc(rows.toDF("event_type", "event_id", "value").repartition(9),
            Seq("event_type"), "value", "event_id", k)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3))))
          .sortBy(t => (t._1, t._2)).toSeq
        val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
          rs.sortWith { (a, b) =>
            (a._3, b._3) match {
              case (Some(x), Some(y)) => x > y || (x == y && a._2 < b._2)
              case (Some(_), None)    => true
              case (None, Some(_))    => false
              case (None, None)       => a._2 < b._2
            }
          }.take(k).zipWithIndex.map { case ((_, id, v), j) => (g, (j + 1).toLong, id, v) }
        }.sortBy(t => (t._1, t._2))
        assert(got == want, s"seed $i (k=$k, n=${rows.size}): $got != $want")
      }
    }
  }

  test("NaN sorts greatest (first under DESC) and -0.0 ties 0.0 — exactly the window order") {
    import spark.implicits._
    // NaN breaks `x > y`/`x == y` total ordering: under the naive comparator
    // the insert position of a NaN row is partition-dependent. Spark's
    // window sort treats NaN as the LARGEST double and normalizes -0.0 to
    // 0.0 (NormalizeFloatingNumbers); the aggregate must match both.
    val rows = Seq[(String, Long, Option[Double])](
      ("g", 1L, Some(Double.NaN)), ("g", 2L, Some(Double.PositiveInfinity)),
      ("g", 3L, Some(0.0)), ("g", 4L, Some(-0.0)), ("g", 5L, Some(1.0)),
      ("g", 6L, Some(Double.NaN)), ("g", 7L, None),
      ("g", 8L, Some(Double.NegativeInfinity)))
    val df = rows.toDF("event_type", "event_id", "value").repartition(5)
    def canon(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else java.lang.Double.doubleToLongBits(r.getDouble(3)))
    val got = graft.operators.GroupTopK
      .topKByValueDesc(df, Seq("event_type"), "value", "event_id", k = 8)
      .orderBy("rank").collect().map(canon)
    val want = df.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
          .orderBy(col("value").desc_nulls_last, col("event_id"))))
      .filter(col("rank") <= 8)
      .select(col("event_type"), col("rank").cast("long"), col("event_id"), col("value"))
      .orderBy("rank").collect().map(canon)
    // doubleToLongBits canonicalizes every NaN to one bit pattern but keeps
    // -0.0 distinct from 0.0 — the ORIGINAL value must survive into the
    // output even though the two compare equal (ids break the tie)
    assert(got.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("g", 1L, 1L), ("g", 2L, 6L), ("g", 3L, 2L), ("g", 4L, 5L),
        ("g", 5L, 3L), ("g", 6L, 4L), ("g", 7L, 8L), ("g", 8L, 7L)), got.toSeq.toString)
    assert(got.toSeq == want.toSeq, s"agg ${got.toSeq} != window ${want.toSeq}")
  }

  test("plan: no WindowExec; partial+final ObjectHashAggregate reduce before the exchange") {
    val df = SparkEntry.queries("topk_events_agg")(spark, "/root/testdata/sf0.001")
    df.collect()
    def all(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => n }.flatMap {
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => s +: all(s.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r +: all(r.child)
        case n => Seq(n)
      }.distinct
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val nodes = all(plan).map(_.getClass.getSimpleName)
    assert(!nodes.exists(_.startsWith("Window")), s"window leaked into the agg plan: $nodes")
    assert(nodes.count(_.startsWith("ObjectHashAggregate")) >= 2,
      s"expected partial+final object aggregation: $nodes")
  }
}
