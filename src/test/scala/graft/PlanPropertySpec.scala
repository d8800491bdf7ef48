package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.FileSourceScanExec

/** Pins the PLAN properties the 100 TB design claims rest on (PLANS.md) as
  * executable assertions, so a regression that silently un-pushes a filter,
  * widens a scan, or adds a shuffle fails the suite instead of only
  * degrading a bench number. Queries run at sf0.001 through the same
  * registry entries the oracle gate uses.
  */
class PlanPropertySpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  /** Final (post-AQE) physical plan, fully materialized. */
  private def executed(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
  }

  /** All nodes in the final plan, descending into AQE query stages and
    * reused exchanges (their sub-plans are not `children`). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val direct = p.collect { case n => n }
    direct.flatMap {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        s +: allNodes(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        r +: allNodes(r.child)
      case n => Seq(n)
    }.distinct
  }

  private def shuffles(p: SparkPlan): Seq[SparkPlan] =
    allNodes(p).filter(_.getClass.getSimpleName.startsWith("ShuffleExchange"))

  private def query(name: String): DataFrame =
    SparkEntry.queries(name)(spark, Sf)

  test("q6: every predicate reaches the parquet scan; only 4 columns read") {
    val scans = allNodes(executed(query("q6_filter_agg")))
      .collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val li = scans.find(_.metadata.getOrElse("Location", "").contains("lineitem")).get
    val pushed = li.metadata("PushedFilters")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"), s"missing pushdown: $pushed")
    assert(li.requiredSchema.fieldNames.toSet ==
      Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"),
      s"scan not pruned: ${li.requiredSchema.fieldNames.mkString(",")}")
  }

  test("topk_per_group: bounded-state aggregate — no WindowExec, partial+final object agg") {
    // Rewritten round 12 onto TopKByValueDesc: the window form (even with
    // WindowGroupLimit's partial rank limit) still map-side SORTS every
    // join-output row; the aggregate shuffles only k-entry states per
    // (segment, task). Measured at sf100: 43.7 s -> scan floor (SCALING.md).
    val plan = executed(query("topk_per_group"))
    val nodes = allNodes(plan).map(_.getClass.getSimpleName)
    assert(!nodes.exists(_.startsWith("Window")),
      s"window machinery leaked back into topk_per_group:\n$plan")
    assert(nodes.count(_.startsWith("ObjectHashAggregate")) >= 2,
      s"expected partial+final ObjectHashAggregate, got: $nodes\n$plan")
  }

  test("window_ntile: selection not sorting — the full-corpus range exchange stays gone") {
    // Round 12 replaced the prefix-count composition (one range-partitioned
    // sort of every event row) with RankSelect.valueAtRanks histogram
    // probing: counting aggregates + a bucket-local window over ~n/1024
    // survivors. The old plan's signature was a RangePartitioning exchange
    // over the corpus; its absence IS the scale claim (28.6 s vs 47.4 s at
    // sf100, and nothing corpus-sized crosses the wire on a cluster).
    Seq("window_ntile", "agg_percentiles_dist").foreach { q0 =>
      val plan = executed(query(q0))
      val rangeEx = shuffles(plan).filter(_.outputPartitioning
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning])
      assert(rangeEx.isEmpty, s"$q0: the full-corpus range sort leaked back:\n$plan")
    }
  }

  test("tpch dim joins: AQE picks broadcast WITHOUT forced hints (growth-safe plans)") {
    // Round 12 removed explicit broadcast() hints from every sf-proportional
    // dimension build (customer/part/supplier and their filtered
    // projections): a forced hint pins the build side in executor memory at
    // EVERY scale, which at the fourth decade is an OOM, and it disables
    // AQE's demote-to-SMJ escape. The expectation moves HERE: at test scale
    // the runtime sizes are tiny, so the planner must still choose
    // BroadcastHashJoin on its own — and at a scale where the build side
    // outgrows the threshold it may demote, which is the point.
    Seq("q3_top_revenue", "q5_region_revenue", "q8_market_share",
        "q9_nation_profit", "q10_returned_revenue", "q14_promo_share").foreach { q0 =>
      val names = allNodes(executed(query(q0))).map(_.getClass.getSimpleName)
      assert(names.exists(_.startsWith("BroadcastHashJoin")),
        s"$q0: planner stopped broadcasting the (tiny here) dim side")
      assert(!names.exists(n => n.startsWith("CartesianProduct") ||
        n.startsWith("BroadcastNestedLoopJoin")),
        s"$q0: dim join degraded to a product shape")
    }
  }

  test("text_repetition: narrow scan, zero shuffles") {
    val plan = executed(query("text_repetition"))
    assert(shuffles(plan).isEmpty, s"expected no exchange:\n$plan")
  }

  test("dedup_minhash: fused signature = pure narrow scan, zero exchanges") {
    val plan = executed(query("dedup_minhash"))
    assert(shuffles(plan).isEmpty,
      s"expected scan-only plan (MinHashSig fuses the signature):\n$plan")
  }

  test("pipeline_quality_filter: all pre-dedup stages fuse; exactly one exchange") {
    val plan = executed(query("pipeline_quality_filter"))
    assert(shuffles(plan).size == 1,
      s"language+quality+sample must fuse around ONE dedup exchange:\n$plan")
  }

  test("events_correlate: interval join is hash-keyed (user, bucket), never nested-loop") {
    val plan = executed(query("events_correlate"))
    val nodes = allNodes(plan).map(_.getClass.getSimpleName)
    assert(!nodes.exists(n => n.startsWith("BroadcastNestedLoopJoin") ||
      n.startsWith("CartesianProduct")),
      s"interval join fell back to a product shape:\n$plan")
    val joins = allNodes(plan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.size
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.size
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.size
    }
    assert(joins.exists(_ >= 2),
      s"expected an equi-join keyed on (user_id, time-bucket):\n$plan")
  }

  test("domain_stats: the domain table broadcasts back; no sort-merge join") {
    val plan = executed(query("domain_stats"))
    val names = allNodes(plan).map(_.getClass.getSimpleName)
    assert(names.exists(_.startsWith("BroadcastHashJoin")),
      s"domain blocklist must broadcast onto the corpus scan:\n$plan")
    assert(!names.exists(_.startsWith("SortMergeJoin")),
      s"corpus must not shuffle-sort against the tiny domain table:\n$plan")
  }

  test("bpe/rank_fusion/recall: broadcast arms never degrade to a cartesian product") {
    Seq("bpe_train_merges", "rank_fusion", "ann_recall_eval").foreach { q0 =>
      val plan = executed(query(q0))
      val names = allNodes(plan).map(_.getClass.getSimpleName)
      assert(!names.exists(_.startsWith("CartesianProduct")),
        s"$q0: a broadcast arm fell back to CartesianProduct:\n$plan")
    }
  }

  test("rank_fusion: both arms end in TakeOrdered, fusion never global-sorts the corpus") {
    val plan = executed(query("rank_fusion"))
    val takes = allNodes(plan)
      .count(_.getClass.getSimpleName.startsWith("TakeOrderedAndProject"))
    assert(takes >= 2, s"expected TakeOrdered top-k in both arms + fusion:\n$plan")
  }

  test("join_bloom_prefilter: probe filter sits on the fact scan below the join") {
    val plan = executed(query("join_bloom_prefilter"))
    val joins = allNodes(plan).filter(n =>
      n.getClass.getSimpleName.contains("HashJoin") ||
        n.getClass.getSimpleName.startsWith("SortMergeJoin"))
    assert(joins.nonEmpty, s"expected the exact equi-join:\n$plan")
    // the bloom probe (shiftright mask) must sit INSIDE the equi-join's
    // subtree — pruning before the exchange, not after the join. Catalyst
    // fuses it into the broadcast-bloom join's condition, so check node
    // strings, not only FilterExec conditions.
    val probeInsideJoin = joins.exists(j =>
      allNodes(j).drop(1).exists(_.simpleString(10000).contains("shiftright")))
    assert(probeInsideJoin, s"bloom probe not pushed below the join:\n$plan")
    assert(!allNodes(plan).map(_.getClass.getSimpleName)
      .exists(_.startsWith("CartesianProduct")),
      s"bloom broadcast fell back to CartesianProduct:\n$plan")
  }

  test("j1 metadata join: all three levels broadcast, corpus side never shuffles") {
    val plan = executed(query("j1_priority_join"))
    assert(shuffles(plan).isEmpty,
      s"metadata join must be broadcast-only:\n$plan")
    val bcasts = allNodes(plan)
      .filter(_.getClass.getSimpleName.startsWith("BroadcastHashJoin"))
    assert(bcasts.size == 3, s"expected 3 broadcast joins, got ${bcasts.size}")
  }

  test("text_classify_linear: model inference is a zero-exchange narrow scan") {
    val plan = executed(query("text_classify_linear"))
    assert(shuffles(plan).isEmpty,
      s"classifier scoring must not shuffle the corpus:\n$plan")
    assert(allNodes(plan).exists(n => n.expressions.exists(_.find(
      _.isInstanceOf[graft.functions.HashedLinearScore]).isDefined)),
      "scoring must run through the fused HashedLinearScore kernel")
  }

  test("mm_interleave: doc side broadcasts; ONE exchange feeds the pack agg") {
    val plan = executed(query("mm_interleave"))
    assert(shuffles(plan).size == 1,
      s"expected exactly 1 exchange (the pack agg):\n$plan")
    assert(allNodes(plan)
      .exists(_.getClass.getSimpleName.startsWith("BroadcastHashJoin")),
      "the bounded doc side must broadcast — the registry never shuffles for the join")
  }

  test("dedup_incremental: store collapses map-side; batch text never aggregates") {
    val plan = executed(query("dedup_incremental"))
    // store dedup agg = 1 exchange (partial agg below it); the left join
    // itself must not add a corpus shuffle at this scale (broadcast)
    assert(shuffles(plan).size == 1,
      s"expected only the store-collapse exchange:\n$plan")
    val aggs = allNodes(plan)
      .filter(_.getClass.getSimpleName.startsWith("HashAggregate"))
    assert(aggs.size == 2, s"store collapse must be partial+final, got ${aggs.size}")
  }

  test("token-pair/block family: no window ever touches corpus rows (the sf100 audit, pinned)") {
    // text_pmi 89.6->18.2 s, bpe_pair_counts 133.7->16.5 s, text_block_dedup
    // 168.0->36.8 s at sf100 once their lead()-window / collect_list
    // reassembly builds became narrow array projections — a regression here
    // re-shuffles and re-sorts every token row at scale.
    for (q <- Seq("text_pmi", "bpe_pair_counts", "text_block_dedup")) {
      val plan = executed(query(q))
      assert(!allNodes(plan).exists(_.getClass.getSimpleName.startsWith("Window")),
        s"$q: a window crept back into the corpus path:\n$plan")
    }
  }
}
