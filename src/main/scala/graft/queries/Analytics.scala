package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** General analytics surface: aggregation, multi-way joins, windows, set ops,
  * rollup, top-k, time bucketing — the query capabilities the engine exposes
  * beyond the reference's fixed pipeline. Aggregated doubles are rounded so
  * summation order (Spark partial aggs vs DuckDB) cannot flip the hash.
  *
  * Scale notes per query are in the Scaladoc; plans verified via
  * .explain("formatted") (broadcast for dims, partial aggregation map-side).
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 shape: single wide scan → hash agg. Partial aggregation
    * map-side; no join. The headline throughput query. */
  val q1Agg: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 shape: fact-fact join + agg + deterministic top-10.
    * orders⋈lineitem shuffles on orderkey once; the skinny filtered
    * customer projection is left UNHINTED — customer grows with the corpus,
    * so the broadcast-vs-shuffle call belongs to AQE's measured runtime
    * size (a forced hint would pin a fourth-decade build in executor
    * memory). PlanPropertySpec pins that the planner still picks
    * BroadcastHashJoin at test scale. */
  val q3TopRevenue: Q = (s, dir) => {
    val cust = table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = table(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    val li = table(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }
  val q3TopRevenueSql =
    """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: 5-way join through the dimension chain; single
    * shuffle on the fact keys. nation/region hint-broadcast (BOUNDED
    * tables); customer is sf-proportional, so its join strategy is AQE's
    * runtime-size call, not a forced hint. */
  val q5RegionRevenue: Q = (s, dir) => {
    val region = table(s, dir, "region")
    val nation = table(s, dir, "nation")
    val cust = table(s, dir, "customer")
    val ord = table(s, dir, "orders")
    val li = table(s, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }
  val q5RegionRevenueSql =
    """SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** Window functions: per-customer running revenue and order rank. */
  val windowRunning: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    table(s, dir, "orders").filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("order_seq"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
  }
  val windowRunningSql =
    """SELECT o_custkey, o_orderkey,
      |  row_number() OVER w AS order_seq,
      |  round(sum(o_totalprice) OVER w, 2) AS running_total
      |FROM orders WHERE o_custkey < 200
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** Grouping sets / rollup. */
  val aggRollup: Q = (s, dir) =>
    table(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
  val aggRollupSql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin

  /** Set operations: union / intersect / except over supplier vs customer
    * nation sets. */
  val setOps: Q = (s, dir) => {
    val sn = table(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
    val cn = table(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
    sn.intersect(cn).withColumn("op", lit("both"))
      .unionAll(cn.exceptAll(sn).withColumn("op", lit("customer_only")))
  }
  val setOpsSql =
    """SELECT nationkey, 'both' AS op FROM
      |  (SELECT DISTINCT s_nationkey AS nationkey FROM supplier
      |   INTERSECT SELECT DISTINCT c_nationkey FROM customer)
      |UNION ALL
      |SELECT nationkey, 'customer_only' AS op FROM
      |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |   EXCEPT SELECT DISTINCT s_nationkey FROM supplier)""".stripMargin

  /** Time bucketing (the batch shape of a streaming tumbling-window agg —
    * the streaming variant is graft.streaming.EventStream). */
  val eventsTumbling: Q = (s, dir) =>
    eventsWithTs(s, dir)
      // epoch-seconds output: integer-exact across engines (a raw timestamp
      // column risks µs-vs-ns representation skew in the comparator)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
  val eventsTumblingSql =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sessionization in batch: 30-minute inactivity gaps via lag + cumulative
    * sum — the batch twin of flatMapGroupsWithState sessionization. */
  val eventsSessionize: Q = (s, dir) => {
    // Gap arithmetic on exact µs longs (engine-portable); ordering pinned by
    // (ts_us, event_id) so ties cannot flip between engines. session_value
    // sums INTEGER cents (floor(value*100) is bit-deterministic on the same
    // IEEE double in both engines; a float sum is summation-order-dependent
    // in its last ulp and round(·,2) flips on .xx5 knife edges).
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    eventsWithTs(s, dir)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * 100).cast("long")) / 100.0).as("session_value"))
  }
  val eventsSessionizeSql =
    """SELECT user_id, session_id, count(*) AS n_events,
      |  sum(CAST(floor(value * 100) AS BIGINT)) / 100.0 AS session_value
      |FROM (
      |  SELECT user_id, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, value, ts_us, event_id,
      |      CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
      |        OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > 1800000000
      |        THEN 1 ELSE 0 END AS new_session
      |    FROM (SELECT user_id, value, event_id, epoch_us(ts) AS ts_us FROM events)))
      |GROUP BY user_id, session_id""".stripMargin

  /** JSON extraction from the events props column. */
  val jsonExtract: Q = (s, dir) =>
    table(s, dir, "events")
      // from_json with an explicit schema: ONE Jackson parse per row into a
      // typed struct (get_json_object re-tokenizes the document per path —
      // measurably slower at 10 M rows, and quadratic in path count when
      // more fields are pulled)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.DoubleType))))
          .getField("k").as("k_value"))
      .filter(col("k_value") > 50)
  val jsonExtractSql =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_value
      |FROM events WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50""".stripMargin

  /** Skew-salted join: results must be IDENTICAL to the plain join — the
    * oracle is the plain SQL join, proving salting is semantics-preserving.
    * orders.o_custkey is the "skewed" side; customer the replicated side. */
  val skewSaltedJoin: Q = (s, dir) => {
    val big = table(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val small = table(s, dir, "customer").select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    graft.operators.SkewJoin.saltedJoin(big, small, "o_custkey", 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
  }
  val skewSaltedJoinSql =
    """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** Salted two-phase aggregation (operators.SkewJoin.saltedCountSum): the
    * skew-mitigation shape for hot group keys. The oracle is the PLAIN
    * GROUP BY — proving salting is semantics-preserving. Values aggregate as
    * integer cents: salting reorders the summation, which is only exact in
    * integer arithmetic. */
  val skewSaltedAgg: Q = (s, dir) => {
    val ev = table(s, dir, "events")
      .withColumn("cents", floor(col("value") * 100).cast("long"))
    graft.operators.SkewJoin.saltedCountSum(ev, "event_type", "cents", factor = 8)
      .select(col("event_type"), col("n"), (col("sum_value") / 100.0).as("total"))
  }
  val skewSaltedAggSql =
    """SELECT event_type, count(*) AS n,
      |  sum(CAST(floor(value * 100) AS BIGINT)) / 100.0 AS total
      |FROM events GROUP BY event_type""".stripMargin

  /** Native session_window sessionization — the Spark-first form of
    * eventsSessionize (SessionWindow operator handles gap merging inside the
    * aggregate; one shuffle on user_id). Must agree with the oracle's
    * lag/cumsum reconstruction of the same 30-minute-gap semantics. */
  val eventsSessionWindow: Q = (s, dir) =>
    eventsWithTs(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * 100).cast("long")) / 100.0).as("session_value"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"),
        col("n_events"), col("session_value"))
  val eventsSessionWindowSql =
    """SELECT user_id, min(ts_us) AS start_us, count(*) AS n_events,
      |  sum(CAST(floor(value * 100) AS BIGINT)) / 100.0 AS session_value
      |FROM (
      |  SELECT user_id, value, ts_us,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM (
      |    SELECT user_id, value, event_id, ts_us,
      |      CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
      |        OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) >= 1800000000
      |        THEN 1 ELSE 0 END AS new_session
      |    FROM (SELECT user_id, value, event_id, epoch_us(ts) AS ts_us FROM events)))
      |GROUP BY user_id, session_id""".stripMargin

  /** Exact interpolated percentiles (median / p90) — Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition. */
  /** Exact percentiles per group over DISCRETE measures. `percentile()` is
    * an object agg whose state is a value→count map — memory and merge cost
    * are O(distinct values), NOT O(rows), so for grid-valued columns like
    * quantities (≈50 values) and prices (a cent grid) it beats any
    * sort-based plan at every scale (measured: 4× faster than rank
    * selection at 60M rows). For CONTINUOUS measures, where distinct ≈
    * rows and that map becomes a per-group OOM, the surface uses
    * distributed rank selection instead — see `agg_percentiles_dist`. */
  val aggPercentiles: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
        count(lit(1)).as("n"))
  val aggPercentilesSql =
    """SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Exact percentiles per group over a CONTINUOUS measure — distributed
    * rank selection (operators.RankSelect), the scalable exact formulation
    * when distinct values ≈ rows: `percentile()`'s value→count map would
    * hold nearly every row per group and merge on ONE reducer per group
    * (straggler, then OOM at scale — the same low-cardinality-partition
    * family the 100× run exposed for ntile). Bit-equal to `percentile()`
    * (OperatorSpec pins it); oracle is native quantile_cont. */
  val aggPercentilesDist: Q = (s, dir) => {
    val ev = eventsWithTs(s, dir).select(col("event_type"), col("value"))
    graft.operators.RankSelect.percentileCont(ev, "event_type", "value",
      Seq("p50_value" -> 0.5, "p95_value" -> 0.95))
      .select(col("event_type"), round(col("p50_value"), 4).as("p50_value"),
        round(col("p95_value"), 4).as("p95_value"), col("n"))
  }
  // WHERE value IS NOT NULL mirrors RankSelect's ignore-nulls semantics
  // exactly (n counts non-null values; an all-null group emits no row)
  val aggPercentilesDistSql =
    """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50_value,
      |  round(quantile_cont(value, 0.95), 4) AS p95_value, count(*) AS n
      |FROM events WHERE value IS NOT NULL GROUP BY event_type""".stripMargin

  /** Z-score outlier detection per event type — the data-cleaning shape:
    * per-group mean/stddev, broadcast back, filter |x−μ| > 2σ. Statistics
    * run on exact integer cents (floor(value·100)) so the sums are
    * bit-identical across engines regardless of partial-agg order; the
    * double math that follows starts from identical longs, so even the
    * σ comparison is deterministic. Two scans: tiny stats agg + filtered
    * recount — the grouped stats broadcast, the data never re-shuffles. */
  val eventsOutliers: Q = (s, dir) => {
    val ev = eventsWithTs(s, dir)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"))
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"), sum(col("c") * col("c")).as("s2"))
      .withColumn("mean", col("s").cast("double") / col("n"))
      // greatest(.,0): an (all-equal, huge-n) group can round variance to a
      // tiny NEGATIVE double — Spark's sqrt yields NaN but DuckDB ERRORS,
      // so both sides clamp identically
      .withColumn("sd",
        sqrt(greatest(col("s2").cast("double") / col("n") - col("mean") * col("mean"), lit(0.0))))
    ev.join(broadcast(stats), Seq("event_type"))
      .filter(abs(col("c").cast("double") - col("mean")) > lit(2.0) * col("sd"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_outliers"),
        round(min(col("c")) / 100.0, 2).as("min_outlier"),
        round(max(col("c")) / 100.0, 2).as("max_outlier"))
  }
  val eventsOutliersSql =
    """WITH ev AS (
      |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c FROM events),
      |st AS (
      |  SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
      |    CAST(sum(c * c) AS BIGINT) AS s2
      |  FROM ev GROUP BY event_type),
      |st2 AS (
      |  SELECT event_type, CAST(s AS DOUBLE) / n AS mean,
      |    sqrt(greatest(CAST(s2 AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 0.0)) AS sd
      |  FROM st)
      |SELECT ev.event_type, count(*) AS n_outliers,
      |  round(min(c) / 100.0, 2) AS min_outlier,
      |  round(max(c) / 100.0, 2) AS max_outlier
      |FROM ev JOIN st2 ON ev.event_type = st2.event_type
      |WHERE abs(CAST(c AS DOUBLE) - mean) > 2.0 * sd
      |GROUP BY ev.event_type""".stripMargin

  /** Approximate aggregation — the 100 TB path next to the exact operators:
    * t-digest percentile and HLL distinct count. Both are DETERMINISTIC for
    * fixed data, but not portable to DuckDB, so the query verifies them
    * IN-PLAN against the exact values and emits the pass/fail booleans; the
    * oracle recomputes the exact side and expects the bounds to hold. */
  val approxStats: Q = (s, dir) => {
    // Two aggregation passes joined on the tiny grouped result: countDistinct
    // plans through Expand, which multiplies every input row per aggregate —
    // fusing it with the sort-based percentile objects in ONE agg made the
    // whole query 10× slower than the two clean scans. percentile() is the
    // right exact tool here (grid-valued price → O(distinct) state; see
    // agg_percentiles / agg_percentiles_dist for the split).
    val li = table(s, dir, "lineitem")
    val pct = li.groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_exact"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("_ap"))
    // countDistinct MIXED with a non-distinct agg plans through Expand
    // (doubles every input row); alone it plans as two clean hash aggs —
    // so the exact and approx ndv get separate scans (measured faster).
    val ndv = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("ndv_exact"))
    val ndvApprox = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_count_distinct(l_orderkey)").as("_andv"))
    pct.join(ndv, Seq("l_returnflag")).join(ndvApprox, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("median_exact"),
        (abs(col("_ap") - col("median_exact")) <= col("median_exact") * 0.01)
          .as("approx_median_within_1pct"),
        col("ndv_exact"),
        // 15% ≈ 3× the default HLL rsd (0.05 is a standard deviation, not a bound)
        (abs(col("_andv") - col("ndv_exact")) <= col("ndv_exact") * 0.15)
          .as("approx_ndv_within_15pct"))
  }
  val approxStatsSql =
    """SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS median_exact,
      |  TRUE AS approx_median_within_1pct,
      |  count(DISTINCT l_orderkey) AS ndv_exact,
      |  TRUE AS approx_ndv_within_15pct
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Left-semi and left-anti joins: customers with vs without orders. */
  val joinSemiAnti: Q = (s, dir) => {
    val cust = table(s, dir, "customer")
    val ord = table(s, dir, "orders").select(col("o_custkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_orders").as("op"))
      .unionAll(
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), lit("no_orders").as("op")))
  }
  val joinSemiAntiSql =
    """SELECT c_custkey, 'has_orders' AS op FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT c_custkey, 'no_orders' AS op FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Pivot: order counts by status across market segments (Spark .pivot;
    * oracle via conditional aggregation). */
  val pivotStatus: Q = (s, dir) =>
    table(s, dir, "orders")
      .join(table(s, dir, "customer"), // sf-proportional: AQE's call
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
  val pivotStatusSql =
    """SELECT c_mktsegment,
      |  count(*) FILTER (o_orderstatus = 'F') AS F,
      |  count(*) FILTER (o_orderstatus = 'O') AS O,
      |  count(*) FILTER (o_orderstatus = 'P') AS P
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** Scalar string-function surface. */
  val stringFuncs: Q = (s, dir) =>
    table(s, dir, "part").filter(col("p_partkey") < 500)
      .select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        substring(col("p_name"), 1, 5).as("pre5"),
        regexp_replace(col("p_name"), "a", "@").as("subbed"),
        lpad(col("p_brand"), 12, "_").as("padded"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        length(col("p_name")).as("len"))
  val stringFuncsSql =
    """SELECT p_partkey, upper(p_name) AS up, substring(p_name, 1, 5) AS pre5,
      |  regexp_replace(p_name, 'a', '@', 'g') AS subbed, lpad(p_brand, 12, '_') AS padded,
      |  concat_ws('|', p_brand, p_type) AS joined, length(p_name) AS len
      |FROM part WHERE p_partkey < 500""".stripMargin

  /** Date/time function surface over order dates. */
  val dateFuncs: Q = (s, dir) =>
    table(s, dir, "orders").filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        // long, not int: days_to_end goes negative and the comparator's
        // pandas hash is width-sensitive for negative ints
        datediff(to_date(lit("1998-12-31")), to_date(col("o_orderdate"))).cast("long").as("days_to_end"))
  val dateFuncsSql =
    """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  dayofmonth(o_orderdate) AS d, strftime(o_orderdate, '%Y-%m') AS ym,
      |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_end
      |FROM orders WHERE o_orderkey < 2000""".stripMargin

  /** ntile histogram: quartile buckets of event value per type. */
  val windowNtile: Q = (s, dir) => {
    // ntile over LOW-CARDINALITY partitions (a handful of event types) is
    // the classic scale straggler: each type's millions of rows collapse
    // into one window task. Round 12: the previous distributed composition
    // (two-pass prefix count) still paid ONE full range-partitioned SORT of
    // the corpus just to read 8 rank positions per type back out — 47.4 s
    // of window_ntile's 47.4 s at sf100 (SCALING.md). This is SELECTION,
    // not sorting: the quartile COUNTS are pure arithmetic on n, and lo/hi
    // are the values AT the quartile boundary ranks —
    // [[graft.operators.RankSelect.valueAtRanks]] finds those by histogram
    // probing (two counting passes + a bucket-local sort of ~n/1024
    // survivors), so no corpus row is ever sorted or shuffled. The oracle
    // still uses native SQL ntile, proving equivalence; ties across a
    // boundary select the same tied value either way, and the event_id
    // tiebreak in the ntile ORDER BY never reaches the output (it only
    // permutes equal values).
    // NOT persisted: the passes re-scan a 2-column parquet projection
    // (~3 s each at sf100), while caching 100M deserialized string rows
    // costs more in build + GC than all re-scans combined
    val ev = table(s, dir, "events").select(col("event_type"), col("value"))
    // exact ntile(4) sizing: first n%4 quartiles get one extra row
    def quartBounds(n: Long): Seq[(Int, Long, Long, Long)] = {
      val qs = n / 4; val rem = n % 4
      (1 to 4).map { q =>
        val size = qs + (if (q <= rem) 1L else 0L)
        val end = qs * q + math.min(q.toLong, rem)
        (q, size, end - size + 1, end)
      }.filter(_._2 > 0)
    }
    val (vals, stats) = graft.operators.RankSelect.valueAtRanksWithStats(
      ev, "event_type", "value",
      (n, nNull) => quartBounds(n).flatMap { case (q, _, start, end) =>
        // lo mirrors min()-ignores-nulls under the NULLS-FIRST rank order:
        // the first NON-null rank of the quartile (a rank still inside the
        // null prefix resolves to NULL — the all-null quartile)
        Seq((s"lo_$q", if (end <= nNull) end else math.max(start, nNull + 1)),
          (s"hi_$q", end))
      })
    // quartile sizing is pure arithmetic on the pass-0 stats — a tiny
    // driver-built frame, not a fourth corpus scan
    val quartRows = stats.flatMap { case (g, n, _) =>
      quartBounds(n).map { case (q, size, _, _) =>
        org.apache.spark.sql.Row(g.asInstanceOf[String], q, size)
      }
    }
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    val quart = s.createDataFrame(quartRows.asJava, StructType(Seq(
      StructField("event_type", StringType), StructField("quartile", IntegerType),
      StructField("n", LongType)))
    )
    val lo = vals.filter(col("label").startsWith("lo_"))
      .select(col("event_type").as("_et1"),
        substring(col("label"), 4, 1).cast("int").as("_q1"), col("value").as("_lov"))
    val hi = vals.filter(col("label").startsWith("hi_"))
      .select(col("event_type").as("_et2"),
        substring(col("label"), 4, 1).cast("int").as("_q2"), col("value").as("_hiv"))
    quart
      .join(broadcast(lo), col("event_type") === col("_et1") && col("quartile") === col("_q1"))
      .join(broadcast(hi), col("event_type") === col("_et2") && col("quartile") === col("_q2"))
      .select(col("event_type"), col("quartile"), col("n"),
        round(col("_lov"), 2).as("lo"), round(col("_hiv"), 2).as("hi"))
  }
  val windowNtileSql =
    """SELECT event_type, quartile, count(*) AS n, round(min(value), 2) AS lo, round(max(value), 2) AS hi
      |FROM (SELECT event_type, value,
      |        ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile
      |      FROM events)
      |GROUP BY event_type, quartile""".stripMargin

  /** TPC-H Q6 shape: pure filter-aggregate; every predicate reaches the
    * parquet scan as a pushed filter (date range, discount band, quantity). */
  val q6FilterAgg: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n"))
  val q6FilterAggSql =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Correlated scalar subquery: orders priced above 1.5× their customer's
    * average. Monetary values aggregate as EXACT integer cents and the
    * threshold compares in integer arithmetic (price*cnt*2 > sum*3) — a
    * float average is order-dependent in its last ulp, which flips rounded
    * outputs between engines on knife-edge rows. */
  val correlatedSubquery: Q = (s, dir) => {
    val o = table(s, dir, "orders")
      .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
    val per = o.groupBy(col("o_custkey").as("k"))
      .agg(sum(col("cents")).as("sum_c"), count(lit(1)).as("cnt"))
    o.join(per, col("o_custkey") === col("k"))
      .filter(col("cents") * col("cnt") * 2 > col("sum_c") * 3)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"),
        // half-up to whole cents in INTEGER arithmetic: Spark's round()
        // (decimal-string HALF_UP) and DuckDB's (binary-nearest) disagree on
        // .xx5 knife edges; floor((2s+n)/2n) is bit-deterministic in both
        (floor((col("sum_c") * 2 + col("cnt")) / (col("cnt") * 2)) / 100.0).as("cust_avg"))
  }
  val correlatedSubquerySql =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
      |  floor((sum_c * 2 + cnt) / (cnt * 2)) / 100.0 AS cust_avg
      |FROM (
      |  SELECT *,
      |    sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER (PARTITION BY o_custkey) AS sum_c,
      |    count(*) OVER (PARTITION BY o_custkey) AS cnt,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders)
      |WHERE cents * cnt * 2 > sum_c * 3""".stripMargin

  /** Column statistics (the ANALYZE shape a planner feeds on): min/max,
    * null count, exact distinct count per key column — one scan, partial
    * aggregation map-side. Every output is BIGINT-exact or an explicitly
    * rounded double on BOTH sides (DuckDB sum(int) is HUGEINT, which its
    * pandas bridge renders as float64 and flips the driver's hash). */
  val tableStats: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .agg(
        count(lit(1)).as("rows"),
        round(min(col("l_quantity")), 2).as("qty_min"),
        round(max(col("l_quantity")), 2).as("qty_max"),
        sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)).as("rf_nulls"),
        countDistinct(col("l_orderkey")).as("orderkey_ndv"),
        countDistinct(col("l_returnflag")).as("rf_ndv"),
        round(min(col("l_extendedprice")), 2).as("price_min"),
        round(max(col("l_extendedprice")), 2).as("price_max"))
  val tableStatsSql =
    """SELECT count(*) AS rows, round(min(l_quantity), 2) AS qty_min, round(max(l_quantity), 2) AS qty_max,
      |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS rf_nulls,
      |  count(DISTINCT l_orderkey) AS orderkey_ndv, count(DISTINCT l_returnflag) AS rf_ndv,
      |  round(min(l_extendedprice), 2) AS price_min, round(max(l_extendedprice), 2) AS price_max
      |FROM lineitem""".stripMargin

  /** Full outer join: supplier vs customer per-nation counts, null-safe. */
  val joinFullOuter: Q = (s, dir) => {
    val sn = table(s, dir, "supplier").groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_supp"))
    val cn = table(s, dir, "customer").groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_cust"))
    sn.join(cn, col("nk_s") === col("nk_c"), "full_outer")
      .select(coalesce(col("nk_s"), col("nk_c")).as("nationkey"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"))
  }
  val joinFullOuterSql =
    """SELECT COALESCE(nk_s, nk_c) AS nationkey,
      |  COALESCE(n_supp, 0) AS n_supp, COALESCE(n_cust, 0) AS n_cust
      |FROM (SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier GROUP BY 1) s
      |FULL OUTER JOIN (SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer GROUP BY 1) c
      |ON nk_s = nk_c""".stripMargin

  /** Sorted collect aggregation: per-customer ordered order-key lists
    * (collect_list is unordered in a distributed agg — sort_array pins it).
    * The list is emitted as JSON TEXT: the driver comparator hashes scalar
    * columns only (array cells crash its pandas sort). */
  val aggCollect: Q = (s, dir) =>
    table(s, dir, "orders").filter(col("o_custkey") < 100)
      .groupBy(col("o_custkey"))
      .agg(to_json(sort_array(collect_list(col("o_orderkey")))).as("orderkeys"),
        count(lit(1)).as("n"))
  val aggCollectSql =
    """SELECT o_custkey, CAST(to_json(list(o_orderkey ORDER BY o_orderkey)) AS VARCHAR) AS orderkeys, count(*) AS n
      |FROM orders WHERE o_custkey < 100 GROUP BY o_custkey""".stripMargin

  /** TPC-H Q18 shape: HAVING over a grouped sum. */
  val aggHaving: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"),
        count(lit(1)).as("n_lines"))
      .filter(col("total_qty") > 150)
  val aggHavingSql =
    """SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty, count(*) AS n_lines
      |FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 150""".stripMargin

  /** As-of join: each event picks its user's most recent order at or before
    * the event time (times as exact epoch µs). Right side deduplicated to one
    * order per (custkey, time) for determinism. Oracle: DuckDB's native
    * ASOF JOIN — the composed union+window operator must agree with it. */
  val joinAsof: Q = (s, dir) => {
    val ev = eventsWithTs(s, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val ordW = Window.partitionBy(col("o_custkey"), col("ot_us")).orderBy(col("o_orderkey").desc)
    val ord = table(s, dir, "orders")
      .withColumn("ot_us", unix_micros(col("o_orderdate").cast("timestamp"))) // NTZ → UTC instant
      .withColumn("_rn", row_number().over(ordW)).filter(col("_rn") === 1).drop("_rn")
      .select(col("o_custkey").as("user_id"), col("ot_us"),
        col("o_orderkey"), round(col("o_totalprice"), 2).as("o_price"))
    graft.operators.AsOfJoin.asOf(
      ev, ord, key = "user_id", leftTime = "ts_us", rightTime = "ot_us",
      payload = Seq("o_orderkey", "o_price"))
  }

  /** [[joinAsof]] over a BUCKETED+SORTED layout of its tagged union — the
    * recurring-layout result BucketBench measured at sf100 (123.0 →
    * 7.1 s/run, 17.3×, amortizes after 1 layout write; SCALING.md round 12)
    * promoted under the oracle gate: the as-of's ONE exchange + sort is
    * paid at layout-write time (bucketBy key, sortBy (key, time, side),
    * repartition-by-key first so every bucket is a single file — Spark
    * only trusts bucket sort order for single-file buckets), and the carry
    * window then runs straight off the scan with ZERO shuffle. Under
    * `-Dgraft.assertPlans=true` (Verify's session) the zero-exchange plan
    * property is require()d in the same configuration the driver runs —
    * the `join_bucketed` precedent.
    *
    * Round 14 (verdict task 3 + advice): the layout is CACHED across
    * processes, keyed by a content fingerprint of (source file trees'
    * mtime+length, bucket/sort spec, union schema) under
    * `target/asof-layout/` — the operator exists to demonstrate
    * write-once-carry-many, and re-paying the write per invocation (r13:
    * 48.8 s of a sf10 battery vs 18.2 s isolated; multi-GB nonce tables
    * accumulating until JVM exit) measured gate overhead instead. A COLD
    * call builds into a tmp dir and atomically renames it into place
    * (concurrent builders: the loser deletes its tmp and reads the
    * winner's); a WARM call registers an external bucketed table over the
    * published files and runs the carry with zero writes. Any testdata
    * regeneration moves an mtime → new fingerprint → rebuild; superseded
    * fingerprints are pruned once they are hours-stale, never while a
    * sibling process could plausibly still read them (the rounds-4/5
    * shared-warehouse flake is the cautionary tale).
    *
    * Double-gated, cold AND warm (round-15 verdict task 2): the EMITTED
    * rows come from the bucketed carry (so the driver hashes the layout
    * path against join_asof's own DuckDB ASOF oracle — every call), and
    * an order-free checksum — count + bit_xor + ANSI-safe 32-bit-half
    * sums of row hashes (xor alone cancels under even multiset
    * discrepancies) — is require()d equal on EVERY call: the cold build
    * computes it over the straight-from-source carry and publishes the
    * quad in a `_GRAFT_ASOF_CHECKSUM` sidecar inside the layout dir
    * (written before the atomic rename, so a published layout always has
    * one), and every read — cold or warm — re-derives the quad from the
    * CARRIED side and compares. Warm runs thus get an in-process
    * losslessness gate at carry cost (one exchange-free scan of the
    * layout + a one-row agg), never re-paying the from-source
    * exchange+sort the cache exists to amortize. */
  private[graft] val asofLayoutBuilds = new java.util.concurrent.atomic.AtomicLong(0)
  val joinAsofBucketed: Q = (s, dir) => {
    val ev = eventsWithTs(s, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val ordW = Window.partitionBy(col("o_custkey"), col("ot_us")).orderBy(col("o_orderkey").desc)
    val ord = table(s, dir, "orders")
      .withColumn("ot_us", unix_micros(col("o_orderdate").cast("timestamp"))) // NTZ → UTC instant
      .withColumn("_rn", row_number().over(ordW)).filter(col("_rn") === 1).drop("_rn")
      .select(col("o_custkey").as("user_id"), col("ot_us"),
        col("o_orderkey"), round(col("o_totalprice"), 2).as("o_price"))
    val payload = Seq("o_orderkey", "o_price")
    val (unioned, names, leftCols) = graft.operators.AsOfJoin.taggedUnion(
      ev, ord, key = "user_id", leftTime = "ts_us", rightTime = "ot_us",
      payload = payload, forward = false)
    val (kC, tC, sideC, _) = names
    val buckets = 16
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "")
    val schemaDdl = unioned.schema.toDDL
    // order-free checksum over the carry's emitted columns; applied to the
    // from-source carry at build time (published in the sidecar) and to
    // the carried-from-layout side on every read
    def checksum(df: DataFrame): Seq[Long] = {
      val r = df.select(xxhash64(col("event_id"), col("user_id"), col("ts_us"),
          col("asof_o_orderkey"), col("asof_o_price")).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)"),
          sum(expr("h & 4294967295")), sum(expr("shiftright(h, 32) & 4294967295")))
        .collect()(0)
      (0 to 3).map(i => if (r.isNullAt(i)) 0L else r.getLong(i))
    }
    val fp = graft.core.LayoutCache.fingerprint("graft-asof-layout-v2", dir,
      Seq("events.parquet", "orders.parquet"),
      s"buckets=$buckets;sort=$kC,$tC,$sideC;schema=$schemaDdl")
    val cacheRoot = new java.io.File(
      sys.props.getOrElse("graft.asofLayoutRoot", "target/asof-layout"))
    val (dataDir, cold) = graft.core.LayoutCache.getOrBuild(cacheRoot, fp) { tmpDir =>
      val buildName = s"graft_asof_build_$nonce"
      unioned.repartition(buckets, col(kC))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, kC).sortBy(kC, tC, sideC)
        .option("path", tmpDir.getAbsolutePath).saveAsTable(buildName)
      s.sql(s"DROP TABLE $buildName"): Unit // external: drops metadata, files stay
      // the expected quad, from the straight-from-source carry (the only
      // moment the source-side exchange is paid anyway); lands in the tmp
      // dir so the atomic publish can never yield a sidecar-less layout
      val quad = checksum(graft.operators.AsOfJoin.carryFrom(unioned, names, leftCols, payload))
      java.nio.file.Files.write(new java.io.File(tmpDir, "_GRAFT_ASOF_CHECKSUM").toPath,
        quad.mkString(",").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    if (cold) asofLayoutBuilds.incrementAndGet(): Unit
    // per-process registration over the shared published files: external
    // bucketed table, nonce-named (the in-memory catalog is process-private)
    val uName = s"graft_asof_u_$nonce"
    s.sql(
      s"""CREATE TABLE $uName ($schemaDdl) USING parquet
         |CLUSTERED BY ($kC) SORTED BY ($kC, $tC, $sideC) INTO $buckets BUCKETS
         |LOCATION '${dataDir.getAbsolutePath}'""".stripMargin)
    val carried = graft.operators.AsOfJoin.carryFrom(
      s.table(uName), names, leftCols, payload)
    if (sys.props.get("graft.assertPlans").contains("true")) {
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val exec = carried.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = exec.collect { case e: ShuffleExchangeExec => e }
      require(shuffles.isEmpty,
        s"bucketed as-of carry must run exchange-free (${shuffles.size} exchanges):\n$exec")
    }
    // losslessness gate, EVERY call (see scaladoc): the carried side's
    // checksum must reproduce the quad the cold build derived from source
    val sidecar = new java.io.File(dataDir, "_GRAFT_ASOF_CHECKSUM")
    require(sidecar.isFile, s"published as-of layout missing checksum sidecar: $sidecar")
    val expected = new String(java.nio.file.Files.readAllBytes(sidecar.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim.split(",").toSeq.map(_.toLong)
    require(checksum(carried) == expected,
      "bucketed as-of layout changed the result (carried checksum != published quad)")
    carried
  }

  val joinAsofSql =
    """WITH ord AS (
      |  SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS ot_us,
      |    o_orderkey, round(o_totalprice, 2) AS o_price,
      |    row_number() OVER (PARTITION BY o_custkey, epoch_us(o_orderdate)
      |                       ORDER BY o_orderkey DESC) AS rn
      |  FROM orders),
      |ord1 AS (SELECT user_id, ot_us, o_orderkey, o_price FROM ord WHERE rn = 1),
      |ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
      |SELECT ev.event_id, ev.user_id, ev.ts_us,
      |  ord1.o_orderkey AS asof_o_orderkey, ord1.o_price AS asof_o_price
      |FROM ev ASOF LEFT JOIN ord1
      |  ON ev.user_id = ord1.user_id AND ev.ts_us >= ord1.ot_us""".stripMargin

  /** Range join: events matched to overlapping value bands (bands derived
    * from nation keys: [7k, 7k+10.5]). The bucketed equi-join composition
    * must agree exactly with the oracle's naive BETWEEN join. */
  val joinRange: Q = (s, dir) => {
    val points = eventsWithTs(s, dir).select(col("event_id"), col("value"))
    val bands = table(s, dir, "nation")
      .select(col("n_nationkey").as("band_id"),
        (col("n_nationkey") * 7.0).as("lo"),
        (col("n_nationkey") * 7.0 + 10.5).as("hi"))
    graft.operators.RangeJoin.joinRange(points, "value", bands, "lo", "hi", bucketWidth = 7.0)
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
  }
  val joinRangeSql =
    """SELECT n_nationkey AS band_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM events JOIN nation
      |  ON value >= n_nationkey * 7.0 AND value <= n_nationkey * 7.0 + 10.5
      |GROUP BY 1""".stripMargin

  /** TPC-H Q7 shape: bidirectional nation-pair shipping volume by year.
    * Two independent dimension chains (supplier-nation, customer-nation) hang
    * off the same fact join; both nation dims broadcast, one fact shuffle. */
  val q7NationVolume: Q = (s, dir) => {
    val li = table(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val ord = table(s, dir, "orders").select("o_orderkey", "o_custkey")
    val sup = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val cust = table(s, dir, "customer").select("c_custkey", "c_nationkey")
    val n1 = table(s, dir, "nation")
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val n2 = table(s, dir, "nation")
      .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey")) // sf-proportional: AQE's call
      .join(cust, col("o_custkey") === col("c_custkey")) // sf-proportional: AQE's call
      .join(broadcast(n1), col("s_nationkey") === col("snk"))
      .join(broadcast(n2), col("c_nationkey") === col("cnk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("volume"),
        count(lit(1)).as("n"))
  }
  val q7NationVolumeSql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume, count(*) AS n
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q10 shape: returned-item revenue, top 20 customers. Date filter
    * pushes to the orders scan; deterministic tie-break on custkey. */
  val q10ReturnedRevenue: Q = (s, dir) => {
    val li = table(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = table(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val cust = table(s, dir, "customer")
    val nat = table(s, dir, "nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey")) // sf-proportional: AQE's call
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }
  val q10ReturnedRevenueSql =
    """SELECT c_custkey, c_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q19 shape: disjunction of brand/size/quantity bands — the
    * OR-of-ANDs must still push the join key and the shared part filter. */
  val q19Disjunctive: Q = (s, dir) => {
    val li = table(s, dir, "lineitem")
    val part = table(s, dir, "part")
    li.join(part, col("l_partkey") === col("p_partkey")) // part is sf-proportional: AQE's call
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
  }
  val q19DisjunctiveSql =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q2 shape: correlated min subquery over a join — for each
    * (filtered) part, the supplier(s) charging its minimum price. Expressed
    * Spark-first as a partitioned window min rather than a self-join: the
    * filtered lineitem is scanned ONCE, the per-part min rides the same
    * shuffle as the output rows (Catalyst decorrelates the SQL form into
    * exactly this agg+rejoin shape, but the window form skips the rejoin).
    * Equality is on a STORED double (never a computed one), so it is
    * engine-portable. */
  val q2MinSupplier: Q = (s, dir) => {
    val li = table(s, dir, "lineitem")
    val part = table(s, dir, "part").filter(col("p_size") <= 2)
      .select(col("p_partkey"), col("p_brand"))
    val supp = table(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
    val w = Window.partitionBy(col("l_partkey"))
    li.join(part, col("l_partkey") === col("p_partkey")) // part/supplier sf-proportional: AQE's call
      .withColumn("min_price", min(col("l_extendedprice")).over(w))
      .filter(col("l_extendedprice") === col("min_price"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"),
        round(col("min_price"), 2).as("min_price"))
  }
  val q2MinSupplierSql =
    """SELECT p.p_partkey, p.p_brand, s.s_name, round(l.l_extendedprice, 2) AS min_price
      |FROM part p
      |JOIN lineitem l ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |WHERE p.p_size <= 2
      |  AND l.l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2
      |                           WHERE l2.l_partkey = p.p_partkey)""".stripMargin

  /** TPC-H Q21 shape: multi-way EXISTS / NOT EXISTS — suppliers whose
    * returned ('R') lineitems were the LAST to ship in multi-supplier
    * orders. Left-semi (another supplier exists in the order) then
    * left-anti (no other supplier shipped later); both joins are equi on
    * l_orderkey with a residual condition, so they plan as shuffled joins —
    * never a nested loop — and the identical `others` scan below both
    * reuses one Exchange. Deterministic top-10 via (numwait, s_name)
    * total order. */
  val q21WaitingSuppliers: Q = (s, dir) => {
    val li = table(s, dir, "lineitem")
    val supp = table(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
    // Probe side: raw (order, supplier, shipdate) rows. A pre-aggregation to
    // per-(order,supplier) max-shipdate is semantically equivalent and the
    // right call when orders have many lines per supplier — measured here it
    // LOST (~20%): this data has ~1 line per (order, supplier), so the extra
    // shuffle shrinks nothing. The identical subplan below both joins is
    // exchange-reused either way.
    val others = li.select(col("l_orderkey").as("o2"),
      col("l_suppkey").as("s2"), col("l_shipdate").as("d2"))
    table(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(others, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
        "left_semi")
      .join(others, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2") &&
        col("d2") > col("l_shipdate"), "left_anti")
      .join(supp, col("l_suppkey") === col("s_suppkey")) // sf-proportional: AQE's call
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }
  val q21WaitingSuppliersSql =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey
      |              AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey
      |                  AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin

  /** RANGE-frame window + nth_value: for each order, the count and sum of
    * the same customer's orders within ±1000.0 of its price (a value-based
    * frame, not row-based), plus the customer's 2nd-cheapest order price.
    * Completes the frame surface next to the ROWS frames elsewhere. */
  val windowRangeFrame: Q = (s, dir) => {
    val byPrice = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      .rangeBetween(-1000L, 1000L)
    val byPriceRows = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    table(s, dir, "orders").filter(col("o_custkey") < 150)
      .select(col("o_orderkey"), col("o_custkey"),
        count(lit(1)).over(byPrice).as("n_near"),
        round(sum(col("o_totalprice")).over(byPrice), 2).as("near_total"),
        round(nth_value(col("o_totalprice"), 2).over(byPriceRows), 2).as("second_cheapest"))
  }
  val windowRangeFrameSql =
    """SELECT o_orderkey, o_custkey,
      |  count(*) OVER w_range AS n_near,
      |  round(sum(o_totalprice) OVER w_range, 2) AS near_total,
      |  round(nth_value(o_totalprice, 2) OVER w_rows, 2) AS second_cheapest
      |FROM orders WHERE o_custkey < 150
      |WINDOW
      |  w_range AS (PARTITION BY o_custkey ORDER BY o_totalprice
      |              RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING),
      |  w_rows AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  /** Per-group top-k: 3 highest-value orders per market segment. Rewritten
    * (round 12) from the rank-then-filter window onto the BOUNDED-STATE
    * aggregate [[graft.functions.TopKByValueDesc]]: with 5 huge segments,
    * any window form — even with WindowGroupLimit's partial rank cut —
    * still map-side SORTS every join-output row, measured 43.7 s at sf100;
    * the aggregate's map-side combine reduces each task to k rows per
    * segment, so only k-entry states cross the wire (same shape as
    * `topk_events_agg`, 5.3× there). The customer join is unhinted —
    * sf-proportional, AQE's runtime-size call. The oracle stays the plain
    * SQL row_number, proving the aggregate is result-identical. */
  val topkPerGroup: Q = (s, dir) => {
    val joined = table(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      .join(table(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderkey", "o_totalprice")
    graft.operators.GroupTopK.topKByValueDesc(
      joined, groupCols = Seq("c_mktsegment"), valueCol = "o_totalprice",
      idCol = "o_orderkey", k = 3, rankCol = "rk")
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
  }
  val topkPerGroupSql =
    """SELECT c_mktsegment, rk, o_orderkey, round(o_totalprice, 2) AS price
      |FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY c_mktsegment
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |      FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rk <= 3""".stripMargin

  /** Batch twin of the streaming stream-stream interval join
    * (graft.streaming.EventStream.correlate): each purchase pairs with the
    * same user's clicks in the preceding 30 minutes. Time bounds in exact µs
    * longs; the oracle proves the join semantics the watermarked streaming
    * version implements incrementally. */
  val eventsCorrelate: Q = (s, dir) => {
    val W = 1800000000L // 30-minute window, µs
    val ev = eventsWithTs(s, dir)
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"), col("ts_us").as("buy_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts_us").as("click_us"))
    // Range-join bucketing: without it the only equi-key is user_id, and
    // per-user work is buys×clicks — quadratic as event DENSITY grows (the
    // sf1→sf10 sweep measured 15.3× for 10× rows). Bucket time by the
    // window width: a buy at t can only pair with clicks in buckets
    // {⌊t/W⌋−1, ⌊t/W⌋}, so exploding the buy side to those two buckets and
    // equi-joining on (user, bucket) bounds each join group by per-window
    // density; the exact interval predicate stays as the residual filter.
    val buysB = buys.withColumn("b_bkt",
      explode(array(floor(col("buy_us") / W) - 1, floor(col("buy_us") / W))))
    val clicksB = clicks.withColumn("c_bkt", floor(col("click_us") / W))
    buysB.join(clicksB,
        col("user_id") === col("c_user") && col("b_bkt") === col("c_bkt") &&
          col("click_us") <= col("buy_us") &&
          col("click_us") >= col("buy_us") - W)
      .groupBy(col("buy_id"), col("user_id"))
      .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
  }
  val eventsCorrelateSql =
    """SELECT b.event_id AS buy_id, b.user_id, count(*) AS n_clicks,
      |  min(c.event_id) AS first_click
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      |      WHERE event_type = 'purchase') b
      |JOIN (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      |      WHERE event_type = 'click') c
      |  ON b.user_id = c.user_id AND c.ts_us <= b.ts_us
      | AND c.ts_us >= b.ts_us - 1800000000
      |GROUP BY 1, 2""".stripMargin

  /** CUBE over two dimensions: all grouping-set combinations (rollup's
    * sibling — completes the grouping-sets surface). */
  val aggCube: Q = (s, dir) =>
    table(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
  val aggCubeSql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin

  /** Forward-fill (last non-null carry-forward) per user over event time —
    * the canonical gap-filling cleanup in telemetry/training pipelines.
    * Nulls synthesized deterministically (every 3rd event). Partitioned
    * window: scales with users, no global ordering. */
  val windowFillForward: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventsWithTs(s, dir).filter(col("event_id") < 2000)
      .withColumn("v_sparse",
        when(col("event_id") % 3 === 0, lit(null)).otherwise(round(col("value"), 2)))
      .withColumn("v_filled", last(col("v_sparse"), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("v_sparse"), col("v_filled"))
  }
  val windowFillForwardSql =
    """SELECT event_id, user_id, v_sparse,
      |  last_value(v_sparse IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      |FROM (SELECT event_id, user_id, ts,
      |        CASE WHEN event_id % 3 = 0 THEN NULL ELSE round(value, 2) END AS v_sparse
      |      FROM events WHERE event_id < 2000)""".stripMargin

  /** Unpivot (wide → long): per-lineitem measures melted to (metric, val)
    * rows — the reshaping inverse of pivot_status. */
  val unpivotMetrics: Q = (s, dir) =>
    table(s, dir, "lineitem").filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity"), 2).as("quantity"),
        round(col("l_extendedprice"), 2).as("price"),
        round(col("l_tax"), 2).as("tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("quantity"), col("price"), col("tax")),
        variableColumnName = "metric", valueColumnName = "val")
  val unpivotMetricsSql =
    """SELECT l_orderkey, l_linenumber, metric, val FROM (
      |  SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS quantity,
      |         round(l_extendedprice, 2) AS price, round(l_tax, 2) AS tax
      |  FROM lineitem WHERE l_orderkey < 300)
      |UNPIVOT (val FOR metric IN (quantity, price, tax))""".stripMargin

  /** Ordered 3-step funnel (view → click → purchase): per user, the first
    * view, the first click AFTER it, the first purchase after that; one row
    * of per-stage user counts. Shape: three chained per-user min-aggregates
    * — each stage's survivor set only shrinks, every shuffle is on user_id
    * (exchange-reusable), and stage outputs are one row per user, so at
    * 100 TB the heavy table is scanned once per stage and reduced
    * immediately. Timestamps are exact integer µs. */
  val eventsFunnel: Q = (s, dir) => {
    val ev = eventsWithTs(s, dir).select(col("user_id"), col("event_type"), col("ts_us"))
    // persist the funnel stages (round 18): each stage feeds BOTH the next
    // stage's join and its own count — unpersisted, stage a executed twice
    // and b twice, compounding to 6 event scans (12 scan nodes in the
    // before-plan); persisted, the corpus is scanned once per stage. The
    // cached tables are per-user aggregates (⊆ distinct users), the same
    // bounded-intermediate class dedup_containment persists.
    val a = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_a"))
      .persist()
    val b = ev.filter(col("event_type") === "click").join(a, Seq("user_id"))
      .filter(col("ts_us") > col("t_a"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_b"))
      .persist()
    val c = ev.filter(col("event_type") === "purchase").join(b, Seq("user_id"))
      .filter(col("ts_us") > col("t_b"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_c"))
    // Materialize the 1-row result, then RELEASE the stage caches (round
    // 19, r18 advice): a library caller must not inherit a/b's cached
    // per-user aggregates — the harness's per-query clearCache masked the
    // leak. 1-row checkpoint = the bpe-argmax class, O(1) at any scale.
    val out = a.agg(count(lit(1)).as("n_view"))
      .crossJoin(b.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(c.agg(count(lit(1)).as("n_full_funnel")))
      .localCheckpoint()
    a.unpersist(blocking = false)
    b.unpersist(blocking = false)
    out
  }
  val eventsFunnelSql =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |a AS (SELECT user_id, min(ts_us) AS t_a FROM ev
      |      WHERE event_type = 'view' GROUP BY user_id),
      |b AS (SELECT e.user_id, min(e.ts_us) AS t_b FROM ev e JOIN a USING (user_id)
      |      WHERE e.event_type = 'click' AND e.ts_us > a.t_a GROUP BY e.user_id),
      |c AS (SELECT e.user_id, min(e.ts_us) AS t_c FROM ev e JOIN b USING (user_id)
      |      WHERE e.event_type = 'purchase' AND e.ts_us > b.t_b GROUP BY e.user_id)
      |SELECT (SELECT count(*) FROM a) AS n_view,
      |       (SELECT count(*) FROM b) AS n_view_click,
      |       (SELECT count(*) FROM c) AS n_full_funnel""".stripMargin

  /** Cohort retention: users grouped by first-activity day, distinct active
    * users per (cohort day, day offset). Day arithmetic on integer epoch
    * days (µs div 86 400 000 000) — exact cross-engine. Two shuffles: the
    * per-user first-day agg and the (cohort, offset) count-distinct. */
  val eventsRetention: Q = (s, dir) => {
    val ev = eventsWithTs(s, dir)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
    val coh = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(coh, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }
  val eventsRetentionSql =
    """WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |coh AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
      |SELECT cohort_day, day - cohort_day AS day_offset,
      |  CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users
      |FROM ev JOIN coh USING (user_id)
      |GROUP BY cohort_day, day - cohort_day""".stripMargin

  /** Distribution window functions (percent_rank, cume_dist) over a
    * HIGH-cardinality partition key — the straggler-safe way to use them
    * (the window_ntile lesson: a low-cardinality partition collapses to one
    * task; these partitions are per-customer and tiny). */
  val windowDistribution: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
    table(s, dir, "orders").filter(col("o_custkey") < 150)
      .select(col("o_orderkey"), col("o_custkey"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"))
  }
  val windowDistributionSql =
    """SELECT o_orderkey, o_custkey,
      |  round(percent_rank() OVER w, 4) AS pr,
      |  round(cume_dist() OVER w, 4) AS cd
      |FROM orders WHERE o_custkey < 150
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)""".stripMargin

  /** SCD-2 merge (upsert with history): a deterministic update batch (every
    * 10th customer changes segment) merged into the dimension; each key's
    * versions close over the next version's start (lead over a per-key
    * window — 1-2 rows per key, never a straggler). The MERGE pattern for
    * slowly-changing dimensions, expressed as union + keyed window. */
  val mergeScd2: Q = (s, dir) => {
    val base = table(s, dir, "customer").filter(col("c_custkey") < 300)
      .select(col("c_custkey"), col("c_mktsegment"), lit(0L).as("version"))
    val updates = base.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), lit("UPDATED").as("c_mktsegment"), lit(1L).as("version"))
    val w = Window.partitionBy(col("c_custkey")).orderBy(col("version"))
    base.unionAll(updates)
      .withColumn("valid_to", lead(col("version"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
  val mergeScd2Sql =
    """WITH base AS (
      |  SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS version
      |  FROM customer WHERE c_custkey < 300),
      |merged AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  SELECT c_custkey, 'UPDATED', CAST(1 AS BIGINT) FROM base WHERE c_custkey % 10 = 0)
      |SELECT c_custkey, c_mktsegment, version,
      |  lead(version) OVER (PARTITION BY c_custkey ORDER BY version) AS valid_to,
      |  lead(version) OVER (PARTITION BY c_custkey ORDER BY version) IS NULL AS is_current
      |FROM merged""".stripMargin

  /** Rate-spike detection: hourly event counts per type vs the trailing-24h
    * average, flagged when rate > 1.5× trailing. The comparison is the
    * cross-multiplied integer form 2·n·hours > 3·sum — no division, exact at
    * any scale. The RANGE window runs over HOURLY AGGREGATES (rows grow with
    * time, not data volume), so the low-cardinality type partition is never
    * a straggler over raw events. */
  val eventsRateAnomaly: Q = (s, dir) => {
    val hourly = eventsWithTs(s, dir)
      .groupBy(col("event_type"), expr("ts_us div 3600000000").as("h"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rangeBetween(-24, -1)
    hourly
      .withColumn("trail_sum", sum(col("n")).over(w))
      .withColumn("trail_hours", count(col("n")).over(w))
      .filter(col("trail_hours") >= 12 &&
        col("n") * col("trail_hours") * 2 > col("trail_sum") * 3)
      .select(col("event_type"), col("h"), col("n"),
        col("trail_sum"), col("trail_hours"))
  }
  val eventsRateAnomalySql =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |tr AS (
      |  SELECT event_type, h, n,
      |    sum(n) OVER w AS trail_sum, count(n) OVER w AS trail_hours
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY h
      |               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, h, n, CAST(trail_sum AS BIGINT) AS trail_sum,
      |  CAST(trail_hours AS BIGINT) AS trail_hours
      |FROM tr WHERE trail_hours >= 12 AND n * trail_hours * 2 > trail_sum * 3""".stripMargin

  /** Watermark/out-of-orderness audit — the measurement every streaming
    * deployment needs BEFORE choosing a watermark delay: per event, its
    * lateness against the running event-time high-water mark of its own
    * user's stream (event_id = arrival order, the ingest sequence), then
    * per type: how many events a 5-minute / 1-hour / 6-hour watermark
    * would have dropped, and the worst observed lateness. One user-keyed
    * running-max window + one agg — the window partitions by user, so the
    * scan distributes; no global ordering anywhere. */
  val eventsWatermarkAudit: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventsWithTs(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("late_us", max(col("ts_us")).over(w) - col("ts_us"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 300L * 1000000, 1L).otherwise(0L)).as("late_5m"),
        sum(when(col("late_us") > 3600L * 1000000, 1L).otherwise(0L)).as("late_1h"),
        sum(when(col("late_us") > 6L * 3600 * 1000000, 1L).otherwise(0L)).as("late_6h"),
        max(col("late_us")).as("max_late_us"))
  }
  val eventsWatermarkAuditSql =
    """WITH l AS (
      |  SELECT event_type,
      |    max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - epoch_us(ts) AS late_us
      |  FROM events)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CASE WHEN late_us > 300000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_5m,
      |  CAST(sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_1h,
      |  CAST(sum(CASE WHEN late_us > 21600000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_6h,
      |  CAST(max(late_us) AS BIGINT) AS max_late_us
      |FROM l GROUP BY event_type""".stripMargin

  /** First-order behavioral transition matrix: consecutive event-type pairs
    * per user (ordered by timestamp, event_id tie-break) with integer
    * transition probabilities (count·1e6 div from-total). One user-keyed
    * window + one count agg — the Markov-chain estimation shape. */
  val eventsMarkov: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val trans = eventsWithTs(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type")).agg(sum(col("n")).as("total"))
    trans.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 div total").as("p_micro"))
  }
  val eventsMarkovSql =
    """WITH tr AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |      AS to_type
      |  FROM events),
      |cnt AS (SELECT from_type, to_type, count(*) AS n FROM tr
      |        WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS total FROM cnt GROUP BY 1)
      |SELECT from_type, to_type, n, n * 1000000 // total AS p_micro
      |FROM cnt JOIN tot USING (from_type)""".stripMargin

  /** Explicit GROUPING SETS (the general form next to rollup/cube): order
    * counts and exact cent totals at four grouping levels, with the
    * grouping-flag bitmask distinguishing them. DataFrame API has only
    * rollup/cube, so this runs through spark.sql over a temp view — same
    * Catalyst Expand-based plan either way. */
  val aggGroupingSets: Q = (s, dir) => {
    table(s, dir, "orders").createOrReplaceTempView("gs_orders")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority,
        CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        count(*) AS n,
        sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS price_cents
      FROM gs_orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                              (o_orderstatus, o_orderpriority), ())""")
  }
  val aggGroupingSetsSql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
      |  count(*) AS n,
      |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
      |                        (o_orderstatus, o_orderpriority), ())""".stripMargin

  /** OHLC bar downsampling — the time-series candle aggregation: per
    * (event_type, 30-min bar) the OPEN (first value by (ts, event_id)),
    * HIGH, LOW, CLOSE (last value), count, and integer-cents volume.
    * First/last are made deterministic with row_number over the full
    * (ts, event_id) order; both directional numberings share ONE exchange
    * (Window preserves hash partitioning — the `asOfNearest` trick), so
    * the whole bar table costs one shuffle + two partition-local sorts,
    * then one map-side-combining agg. */
  val eventsOhlcBars: Q = (s, dir) => {
    val ev = eventsWithTs(s, dir)
      .select(col("event_type"), expr("ts_us div 1800000000").as("bucket"),
        col("ts_us"), col("event_id"), col("value"))
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    ev.withColumn("rn_a", row_number().over(wAsc))
      .withColumn("rn_d", row_number().over(wDesc))
      .groupBy(col("event_type"), col("bucket"))
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("volume_cents"))
  }
  val eventsOhlcBarsSql =
    """WITH e AS (SELECT event_type, epoch_us(ts) // 1800000000 AS bucket,
      |                  epoch_us(ts) AS t, event_id, value FROM events),
      |r AS (SELECT *,
      |        row_number() OVER (PARTITION BY event_type, bucket
      |          ORDER BY t ASC, event_id ASC) AS rn_a,
      |        row_number() OVER (PARTITION BY event_type, bucket
      |          ORDER BY t DESC, event_id DESC) AS rn_d
      |      FROM e)
      |SELECT event_type, bucket,
      |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
      |  max(value) AS high, min(value) AS low,
      |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
      |  count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS volume_cents
      |FROM r GROUP BY 1, 2""".stripMargin

  /** Hopping (sliding) windows — the missing member of the time-window
    * family next to tumbling and session: 60-minute windows every 30
    * minutes, so each event lands in exactly two windows. Spark's `window()`
    * generates both assignments BEFORE the shuffle (map-side expand ×2,
    * partial agg absorbs it); the oracle reconstructs the same two
    * epoch-grid-aligned starts via integer µs division. Value sums in
    * exact integer cents (house rule for order-independent float sums). */
  val eventsHopping: Q = (s, dir) =>
    eventsWithTs(s, dir)
      .groupBy(window(col("ts"), "60 minutes", "30 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(unix_timestamp(col("win.start")).as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
  val eventsHoppingSql =
    """SELECT w_start, event_type, count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
      |FROM (
      |  SELECT (epoch_us(ts) // 1800000000) * 1800 AS w_start, event_type, value FROM events
      |  UNION ALL
      |  SELECT (epoch_us(ts) // 1800000000) * 1800 - 1800, event_type, value FROM events)
      |GROUP BY 1, 2""".stripMargin

  /** Exact top-5 events per type via the salted two-phase rank
    * ([[graft.operators.GroupTopK]]) — the scale-safe form of
    * `topk_per_group`'s plain window when groups are few and huge. The
    * oracle is the PLAIN SQL row_number, proving the salted decomposition
    * is result-identical. NULLS LAST pinned explicitly: Spark's desc
    * defaults nulls-last, DuckDB's DESC defaults nulls-FIRST. */
  val topkEventsSalted: Q = (s, dir) =>
    graft.operators.GroupTopK.topK(
      table(s, dir, "events").select("event_id", "event_type", "value"),
      groupCols = Seq("event_type"),
      order = Seq(col("value").desc_nulls_last, col("event_id")),
      k = 5,
      saltFrom = col("event_id"))
      .select(col("event_type"), col("rank").cast("long").as("rank"),
        col("event_id"), col("value"))
  val topkEventsSaltedSql =
    """SELECT event_type, rank, event_id, value
      |FROM (SELECT event_type, event_id, value,
      |        row_number() OVER (PARTITION BY event_type
      |                           ORDER BY value DESC NULLS LAST, event_id) AS rank
      |      FROM events)
      |WHERE rank <= 5""".stripMargin

  /** The same exact top-5-per-type through the BOUNDED-STATE aggregate
    * ([[graft.functions.TopKByValueDesc]] via `GroupTopK.topKByValueDesc`)
    * instead of windows: map-side combine reduces every task to k rows per
    * group, so NOTHING but k-entry partial states crosses the wire — the
    * formulation that survives a 1000-executor corpus. Shares
    * [[topkEventsSaltedSql]] (identical result contract, plain-SQL window
    * oracle); the sf100 run that motivated it: salted windows 20.6 s vs
    * scan floor ~3 s — the window pair shuffles and sorts all 100M rows,
    * this aggregate shuffles 160 of them. */
  val topkEventsAgg: Q = (s, dir) =>
    graft.operators.GroupTopK.topKByValueDesc(
      table(s, dir, "events").select("event_id", "event_type", "value"),
      groupCols = Seq("event_type"), valueCol = "value", idCol = "event_id", k = 5)
      .select(col("event_type"), col("rank"), col("event_id"), col("value"))

  /** Weighted PageRank over the customer-nation → supplier-nation purchase
    * graph, 3 iterations of [[graft.operators.PageRank]] in integer
    * fixed-point — bit-exact, so the oracle UNROLLS the same three
    * iterations as CTEs and must match the distributed loop to the last
    * unit. Edge construction is the q7-style broadcast-dim join with one
    * fact shuffle; the iterative loop then runs on the tiny nation graph
    * (but the operator's per-round plan — pre-partitioned edges, one
    * shuffle per iteration, checkpoint-truncated lineage — is the 100 TB
    * shape). */
  val pagerankNations: Q = (s, dir) => {
    val li = table(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val ord = table(s, dir, "orders").select("o_orderkey", "o_custkey")
    val cust = table(s, dir, "customer").select("c_custkey", "c_nationkey")
    val supp = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n1 = table(s, dir, "nation").select(col("n_nationkey").as("cnk"), col("n_name").as("src"))
    val n2 = table(s, dir, "nation").select(col("n_nationkey").as("snk"), col("n_name").as("dst"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey")) // sf-proportional: AQE's call
      .join(supp, col("l_suppkey") === col("s_suppkey")) // sf-proportional: AQE's call
      .join(broadcast(n1), col("c_nationkey") === col("cnk"))
      .join(broadcast(n2), col("s_nationkey") === col("snk"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    graft.operators.PageRank.run(edges, iterations = 3)
      .select(col("node").as("nation"), col("rank_fp"))
  }
  val pagerankNationsSql =
    """WITH e AS (
      |  SELECT n1.n_name AS src, n2.n_name AS dst, count(*) AS w
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  GROUP BY 1, 2),
      |nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY src),
      |r0 AS (SELECT node, 1000000 // (SELECT n FROM nn) AS r FROM nodes),
      |c1 AS (SELECT dst, CAST(sum((r * w) // ow) AS BIGINT) AS c
      |       FROM e JOIN outw USING (src) JOIN r0 ON e.src = r0.node GROUP BY dst),
      |r1 AS (SELECT node, (15 * 1000000) // (100 * (SELECT n FROM nn))
      |         + (85 * coalesce(c, 0)) // 100 AS r
      |       FROM nodes LEFT JOIN c1 ON node = dst),
      |c2 AS (SELECT dst, CAST(sum((r * w) // ow) AS BIGINT) AS c
      |       FROM e JOIN outw USING (src) JOIN r1 ON e.src = r1.node GROUP BY dst),
      |r2 AS (SELECT node, (15 * 1000000) // (100 * (SELECT n FROM nn))
      |         + (85 * coalesce(c, 0)) // 100 AS r
      |       FROM nodes LEFT JOIN c2 ON node = dst),
      |c3 AS (SELECT dst, CAST(sum((r * w) // ow) AS BIGINT) AS c
      |       FROM e JOIN outw USING (src) JOIN r2 ON e.src = r2.node GROUP BY dst),
      |r3 AS (SELECT node, (15 * 1000000) // (100 * (SELECT n FROM nn))
      |         + (85 * coalesce(c, 0)) // 100 AS r
      |       FROM nodes LEFT JOIN c3 ON node = dst)
      |SELECT node AS nation, CAST(r AS BIGINT) AS rank_fp FROM r3""".stripMargin

  /** Multi-source BFS hop distance over the customer–supplier trade graph
    * ([[graft.operators.Bfs]]) — the reachability/"crawl depth" primitive:
    * customers and suppliers are linked when a high-quantity order connects
    * them, and every node gets its minimum hop count from a deterministic
    * seed set of customers. Disjoint id spaces (`cust·2`, `supp·2+1`) keep
    * the bipartite walk in one Long key domain.
    *
    * Scale shape: the edge table is pre-partitioned once; each of the ≤4
    * rounds shuffles only `frontier × degree` candidate rows and the
    * settled-id table — never the corpus (operator scaladoc has the full
    * argument). Output is the per-distance histogram, so the driver gate
    * pins every node's distance (id_sum) without a |V|-sized result. The
    * oracle replays the walk as a depth-guarded recursive CTE + `min(d)` —
    * the bounded round count is exactly what makes the iterative plan
    * SQL-checkable. */
  val graphBfsDistance: Q = (s, dir) => {
    val li = table(s, dir, "lineitem")
      .filter(col("l_quantity") >= 48 && col("l_orderkey") % 3 === 0)
      .select("l_orderkey", "l_suppkey")
    val ord = table(s, dir, "orders").select("o_orderkey", "o_custkey")
    val base = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("cn"),
        (col("l_suppkey").cast("long") * 2 + 1).as("sn"))
    // explode-symmetrize (round 19): the previous self-union ran the
    // lineitem⋈orders build in both branches of one stage — the fact join
    // executed twice per query. One pass emits both directions.
    val edges = base.select(explode(array(
        struct(col("cn").as("src"), col("sn").as("dst")),
        struct(col("sn").as("src"), col("cn").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val seeds = table(s, dir, "customer")
      .filter(col("c_custkey") % 500 === 1)
      .select((col("c_custkey").cast("long") * 2).as("id"))
    graft.operators.Bfs.run(edges, seeds, maxHops = 4)
      .groupBy(col("dist"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("id")).cast("long").as("id_sum"))
  }
  val graphBfsDistanceSql =
    """WITH RECURSIVE base AS (
      |  SELECT CAST(o_custkey * 2 AS BIGINT) AS cn,
      |         CAST(l_suppkey * 2 + 1 AS BIGINT) AS sn
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_quantity >= 48 AND l_orderkey % 3 = 0),
      |e AS (SELECT cn AS src, sn AS dst FROM base UNION ALL SELECT sn, cn FROM base),
      |bfs(id, d) AS (
      |  SELECT CAST(c_custkey * 2 AS BIGINT), 0 FROM customer WHERE c_custkey % 500 = 1
      |  UNION
      |  SELECT e.dst, d + 1 FROM bfs JOIN e ON e.src = bfs.id WHERE d < 4),
      |md AS (SELECT id, min(d) AS dist FROM bfs GROUP BY id)
      |SELECT dist, count(*) AS n_nodes, CAST(sum(id) AS BIGINT) AS id_sum
      |FROM md GROUP BY dist""".stripMargin

  /** First-touch attribution: for each purchasing user, which channel
    * (event type) started the path to their FIRST purchase? Composite
    * (ts, event_id) ordering everywhere — same-timestamp events cannot
    * flip the answer. Shape: two user-keyed min-STRUCT aggregates (struct
    * min is lexicographic in both engines — a map-side-combinable agg, not
    * a per-user window) + one broadcast-sized channel count. */
  val eventsAttribution: Q = (s, dir) => {
    val ev = eventsWithTs(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts_us"), col("event_id"))).as("p"))
    val pre = ev.join(fp, Seq("user_id"))
      .filter(col("ts_us") < col("p.ts_us") ||
        (col("ts_us") === col("p.ts_us") && col("event_id") < col("p.event_id")))
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts_us"), col("event_id"), col("event_type"))).as("f"))
    fp.join(pre, Seq("user_id"), "left")
      .groupBy(coalesce(col("f.event_type"), lit("direct")).as("first_touch"))
      .agg(count(lit(1)).as("n_users"))
  }
  val eventsAttributionSql =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
      |fp AS (SELECT user_id, min(struct_pack(ts_us := ts_us, event_id := event_id)) AS p
      |       FROM ev WHERE event_type = 'purchase' GROUP BY user_id),
      |pre AS (SELECT e.user_id,
      |          min(struct_pack(ts_us := e.ts_us, event_id := e.event_id,
      |                          et := e.event_type)) AS f
      |        FROM ev e JOIN fp USING (user_id)
      |        WHERE e.ts_us < fp.p.ts_us
      |           OR (e.ts_us = fp.p.ts_us AND e.event_id < fp.p.event_id)
      |        GROUP BY e.user_id)
      |SELECT coalesce(pre.f.et, 'direct') AS first_touch,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM fp LEFT JOIN pre USING (user_id) GROUP BY 1""".stripMargin

  /** Triangle counting on the user co-occurrence graph (edge = two users
    * active in the same (event_type, hour) cell at least twice, hub cells
    * capped — the standard stopword-drop that bounds the per-cell pair
    * expansion). The count itself uses the degree-ordered orientation
    * [Suri & Vassilvitskii, WWW'11]: orient each edge from its
    * lower-(degree, id) endpoint, so every out-neighborhood is O(√m) and
    * the wedge join never explodes on hubs — the 100 TB shape. The oracle
    * is the plain id-ordered triple join; orientation cannot change the
    * triangle count, so the two must agree exactly. */
  val graphTriangles: Q = (s, dir) => {
    val ev = eventsWithTs(s, dir)
      .select(col("user_id"), col("event_type"), expr("ts_us div 3600000000").as("hr"))
      .distinct()
    // cap 25: C(25,2) pairs max per cell — the pair expansion stays bounded
    // by #cells × 300 at ANY data scale (denser cells are hubs and drop).
    // Order matters for scale: the cells are COUNT-filtered first (count
    // state is O(1) even on a 100M-user hub hour), and only then collected
    // into per-cell arrays — now provably ≤ 25 elements — from which pairs
    // expand locally. collect_list before the cap filter would buffer a
    // whole hub cell in one aggregator state.
    val okCells = ev.groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n")).filter(col("n").between(2, 25))
      .select(col("event_type"), col("hr"))
    val edges = ev.join(okCells, Seq("event_type", "hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(collect_list(col("user_id")).as("us")) // bounded: cells pre-capped
      .select(explode(expr(
        """flatten(transform(us, (x, i) ->
          |  transform(slice(us, i + 2, size(us)), y ->
          |    struct(least(x, y) as u, greatest(x, y) as v))))""".stripMargin)).as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2).select(col("u"), col("v"))
      // eager checkpoint: 4 consumers below (n_edges + degrees/orientation/
      // wedge close) would otherwise race a lazy cache and each recompute
      // the whole expansion — the ConnectedComponents materialization rule.
      // Round 19 TRIED the lineage-keeping persist(MEMORY_AND_DISK)+count
      // swap here (the pagerank/format_roundtrip r18-task-6 pattern) and
      // REVERTED it on measurement: 6.8 → 10.3 s median (3-run alternating
      // A/B, sf0.1) — the columnar InMemoryRelation build + the extra
      // count() action cost ~1.5× where the raw-block checkpoint is
      // one-shot. The liveness trade (severed lineage on executors) stands
      // as a known cost, same class as the per-round iterative checkpoints.
      .localCheckpoint(true)
    // boundedGraph: the cell cap bounds |E| ≤ #cells × C(25,2) at any data
    // scale, so the degree/orientation tables are broadcast-safe here
    edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(graft.operators.Triangles.countDf(edges, boundedGraph = true))
  }
  val graphTrianglesSql =
    """WITH ev AS (SELECT DISTINCT user_id, event_type,
      |              epoch_us(ts) // 3600000000 AS hr FROM events),
      |ok AS (SELECT event_type, hr FROM ev
      |       GROUP BY event_type, hr HAVING count(*) BETWEEN 2 AND 25),
      |cev AS (SELECT ev.* FROM ev JOIN ok USING (event_type, hr)),
      |edges AS (SELECT a.user_id AS u, b.user_id AS v
      |          FROM cev a JOIN cev b USING (event_type, hr)
      |          WHERE a.user_id < b.user_id
      |          GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
      |       (SELECT CAST(count(*) AS BIGINT) FROM edges e1
      |          JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
      |          JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles""".stripMargin

  /** Interval-concurrency profile (the sweep-line): how many 5-minute event
    * intervals are open at every boundary instant. Each interval becomes a
    * +1/-1 point; the running sum over (t, delta, event_id) is the
    * concurrency. The prefix sum is [[graft.operators.Sharding.cumSumBy]]'s
    * two-pass range-partitioned form — a global ORDER BY sweep with no
    * single-partition window at any scale. Ends sort before starts at the
    * same instant (delta ascending): [s, e) semantics. */
  val eventsConcurrency: Q = (s, dir) => {
    val ev = eventsWithTs(s, dir).select(col("event_id"), col("ts_us"))
    val pts = ev.select(col("event_id"), col("ts_us").as("t"), lit(1L).as("delta"))
      .unionAll(ev.select(col("event_id"),
        (col("ts_us") + lit(300000000L)).as("t"), lit(-1L).as("delta")))
    graft.operators.Sharding.cumSumBy(pts, Seq("t", "delta", "event_id"),
      col("delta"), "conc")
  }
  val eventsConcurrencySql =
    """WITH pts AS (
      |  SELECT event_id, epoch_us(ts) AS t, CAST(1 AS BIGINT) AS delta FROM events
      |  UNION ALL
      |  SELECT event_id, epoch_us(ts) + 300000000, CAST(-1 AS BIGINT) FROM events)
      |SELECT event_id, t, delta,
      |  CAST(sum(delta) OVER (ORDER BY t, delta, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
      |FROM pts""".stripMargin

  /** Cross-table data-quality audit: FK orphans, PK duplicate counts
    * (count − distinct), and null-key counts, one row per check. The kind
    * of gate a 100 TB ingest runs before promoting a snapshot.
    *
    * One pass per FACT table (round 18): the original form ran every check
    * as its own subquery — lineitem scanned 4× (three FK anti-joins + a
    * null probe), orders 3× — and the union planned 17 independent
    * aggregates (39 AQE stage jobs at sf0.1; at 100 TB the extra fact
    * scans are the dominant I/O). Now all four lineitem checks ride ONE
    * scan (three left joins against DEDUPLICATED key projections + a
    * 4-counter aggregate) and the orders FK/null checks share a second.
    * `count(keys-null after left join on a deduplicated key)` is exactly
    * the anti-join count — deduplication makes the equivalence hold even
    * if a dim carried duplicate keys (a matched row is never multiplied,
    * an orphan contributes exactly one all-null row). The per-check rows
    * (names, values, schema) are unchanged; guide §2.4 (remove redundant
    * passes) + §1.2 (algorithm before config). */
  val dqAudit: Q = (s, dir) => {
    import org.apache.spark.sql.DataFrame
    def chk(name: String, n: org.apache.spark.sql.Column, df: DataFrame): DataFrame =
      df.agg(n.cast("long").as("n_bad")).select(lit(name).as("check_name"), col("n_bad"))
    /** one scan, many counters: agg then explode to (check_name, n_bad)
      * rows — identical to the per-check aggregates' union. */
    def multi(df: DataFrame, checks: (String, org.apache.spark.sql.Column)*): DataFrame =
      df.agg(checks.head._2.cast("long").as(checks.head._1),
          checks.tail.map { case (n, c) => c.cast("long").as(n) }: _*)
        .select(explode(array(checks.map { case (n, _) =>
          struct(lit(n).as("check_name"), col(n).as("n_bad")) }: _*)).as("r"))
        .select(col("r.check_name"), col("r.n_bad"))
    val cust = table(s, dir, "customer"); val ord = table(s, dir, "orders")
    val li = table(s, dir, "lineitem"); val supp = table(s, dir, "supplier")
    val part = table(s, dir, "part"); val nat = table(s, dir, "nation")
    val reg = table(s, dir, "region"); val ev = table(s, dir, "events")
    // lineitem: 3 FK checks + the null probe in ONE scan. Key projections
    // are deduplicated so a left-join null count ≡ the anti-join count.
    val liChecks = multi(
      li.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
        .join(ord.select(col("o_orderkey")).dropDuplicates("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left")
        .join(part.select(col("p_partkey")).dropDuplicates("p_partkey"),
          col("l_partkey") === col("p_partkey"), "left")
        .join(supp.select(col("s_suppkey")).dropDuplicates("s_suppkey"),
          col("l_suppkey") === col("s_suppkey"), "left"),
      "fk_lineitem_orderkey" -> count(when(col("o_orderkey").isNull, 1)),
      "fk_lineitem_partkey" -> count(when(col("p_partkey").isNull, 1)),
      "fk_lineitem_suppkey" -> count(when(col("s_suppkey").isNull, 1)),
      "null_l_orderkey" -> count(when(col("l_orderkey").isNull, 1)))
    // orders: FK orphans + null probe share a scan (PK dup stays its own
    // clean two-agg plan — countDistinct MIXED with other aggregates plans
    // through Expand, the approx_stats lesson)
    val ordChecks = multi(
      ord.select(col("o_custkey"))
        .join(cust.select(col("c_custkey")).dropDuplicates("c_custkey"),
          col("o_custkey") === col("c_custkey"), "left"),
      "fk_orders_custkey" -> count(when(col("c_custkey").isNull, 1)),
      "null_o_custkey" -> count(when(col("o_custkey").isNull, 1)))
    val fk = Seq(
      ("fk_customer_nationkey", cust.join(nat, cust("c_nationkey") === nat("n_nationkey"), "left_anti")),
      ("fk_supplier_nationkey", supp.join(nat, supp("s_nationkey") === nat("n_nationkey"), "left_anti")),
      ("fk_nation_regionkey", nat.join(reg, nat("n_regionkey") === reg("r_regionkey"), "left_anti"))
    ).map { case (n, df) => chk(n, count(lit(1)), df) }
    val pk = Seq(
      ("pk_dup_customer", cust, "c_custkey"), ("pk_dup_orders", ord, "o_orderkey"),
      ("pk_dup_part", part, "p_partkey"), ("pk_dup_supplier", supp, "s_suppkey"),
      ("pk_dup_nation", nat, "n_nationkey"), ("pk_dup_region", reg, "r_regionkey"),
      ("pk_dup_events", ev, "event_id")
    ).map { case (n, df, k) => chk(n, count(lit(1)) - countDistinct(col(k)), df) }
    val nulls = Seq(
      ("null_ev_user", ev, "user_id")
    ).map { case (n, df, k) => chk(n, count(when(col(k).isNull, 1)), df) }
    (Seq(liChecks, ordChecks) ++ fk ++ pk ++ nulls).reduce(_ unionAll _)
  }
  val dqAuditSql = {
    val fk = Seq(
      ("fk_orders_custkey", "orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"),
      ("fk_lineitem_orderkey", "lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"),
      ("fk_lineitem_partkey", "lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL"),
      ("fk_lineitem_suppkey", "lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL"),
      ("fk_customer_nationkey", "customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL"),
      ("fk_supplier_nationkey", "supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL"),
      ("fk_nation_regionkey", "nation na LEFT JOIN region r ON na.n_regionkey = r.r_regionkey WHERE r.r_regionkey IS NULL")
    ).map { case (n, f) => s"SELECT '$n' AS check_name, CAST(count(*) AS BIGINT) AS n_bad FROM $f" }
    val pk = Seq(
      ("pk_dup_customer", "customer", "c_custkey"), ("pk_dup_orders", "orders", "o_orderkey"),
      ("pk_dup_part", "part", "p_partkey"), ("pk_dup_supplier", "supplier", "s_suppkey"),
      ("pk_dup_nation", "nation", "n_nationkey"), ("pk_dup_region", "region", "r_regionkey"),
      ("pk_dup_events", "events", "event_id")
    ).map { case (n, t, k) =>
      s"SELECT '$n', CAST(count(*) - count(DISTINCT $k) AS BIGINT) FROM $t" }
    val nulls = Seq(
      ("null_l_orderkey", "lineitem", "l_orderkey"),
      ("null_o_custkey", "orders", "o_custkey"),
      ("null_ev_user", "events", "user_id")
    ).map { case (n, t, k) =>
      s"SELECT '$n', CAST(count(CASE WHEN $k IS NULL THEN 1 END) AS BIGINT) FROM $t" }
    (fk ++ pk ++ nulls).mkString("\n", "\nUNION ALL\n", "")
  }

  /** Mergeable-sketch distinct counting (Apache DataSketches HLL — THE
    * 100 TB count-distinct tool: per-partition sketches union associatively,
    * so the shuffle carries kilobyte sketches instead of user-id sets).
    * Exact distinct runs alongside; the query emits whether the estimate
    * landed within 5% — a DETERMINISTIC bound the DuckDB oracle asserts as
    * a literal, which turns the approximation itself into a gated claim.
    * The '__all__' row re-estimates from the UNION of the per-type sketches
    * (never re-touching the raw data) — the mergeability contract. */
  val hllDistinct: Q = (s, dir) => {
    val ev = table(s, dir, "events")
    val byType = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        hll_sketch_agg(col("user_id")).as("sk"))
      .persist()
    val typed = byType.select(col("event_type"), col("n_exact"),
      (abs(hll_sketch_estimate(col("sk")) - col("n_exact")) * lit(100) <=
        col("n_exact") * lit(5)).as("within_5pct"))
    val all = byType.agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))).as("est"))
      .crossJoin(ev.agg(countDistinct(col("user_id")).as("n_exact")))
      .select(lit("__all__").as("event_type"), col("n_exact"),
        (abs(col("est") - col("n_exact")) * lit(100) <= col("n_exact") * lit(5))
          .as("within_5pct"))
    typed.unionAll(all)
  }
  val hllDistinctSql =
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
      |  TRUE AS within_5pct
      |FROM events GROUP BY event_type
      |UNION ALL
      |SELECT '__all__', CAST(count(DISTINCT user_id) AS BIGINT), TRUE FROM events""".stripMargin

  def defs: Map[String, (Q, Option[String])] = Map(
    "events_attribution" -> (eventsAttribution, Some(eventsAttributionSql)),
    "graph_triangles" -> (graphTriangles, Some(graphTrianglesSql)),
    "graph_bfs_distance" -> (graphBfsDistance, Some(graphBfsDistanceSql)),
    "events_concurrency" -> (eventsConcurrency, Some(eventsConcurrencySql)),
    "dq_audit" -> (dqAudit, Some(dqAuditSql)),
    "hll_distinct" -> (hllDistinct, Some(hllDistinctSql)),
    "pagerank_nations" -> (pagerankNations, Some(pagerankNationsSql)),
    "events_hopping" -> (eventsHopping, Some(eventsHoppingSql)),
    "events_ohlc_bars" -> (eventsOhlcBars, Some(eventsOhlcBarsSql)),
    "topk_events_salted" -> (topkEventsSalted, Some(topkEventsSaltedSql)),
    "topk_events_agg" -> (topkEventsAgg, Some(topkEventsSaltedSql)),
    "agg_grouping_sets" -> (aggGroupingSets, Some(aggGroupingSetsSql)),
    "events_markov" -> (eventsMarkov, Some(eventsMarkovSql)),
    "events_rate_anomaly" -> (eventsRateAnomaly, Some(eventsRateAnomalySql)),
    "events_watermark_audit" -> (eventsWatermarkAudit, Some(eventsWatermarkAuditSql)),
    "events_funnel" -> (eventsFunnel, Some(eventsFunnelSql)),
    "events_retention" -> (eventsRetention, Some(eventsRetentionSql)),
    "window_distribution" -> (windowDistribution, Some(windowDistributionSql)),
    "merge_scd2" -> (mergeScd2, Some(mergeScd2Sql)),
    "events_correlate" -> (eventsCorrelate, Some(eventsCorrelateSql)),
    "agg_cube" -> (aggCube, Some(aggCubeSql)),
    "window_fill_forward" -> (windowFillForward, Some(windowFillForwardSql)),
    "unpivot_metrics" -> (unpivotMetrics, Some(unpivotMetricsSql)),
    "q7_nation_volume" -> (q7NationVolume, Some(q7NationVolumeSql)),
    "q10_returned_revenue" -> (q10ReturnedRevenue, Some(q10ReturnedRevenueSql)),
    "q19_disjunctive" -> (q19Disjunctive, Some(q19DisjunctiveSql)),
    "q2_min_supplier" -> (q2MinSupplier, Some(q2MinSupplierSql)),
    "q21_waiting_suppliers" -> (q21WaitingSuppliers, Some(q21WaitingSuppliersSql)),
    "topk_per_group" -> (topkPerGroup, Some(topkPerGroupSql)),
    "window_range_frame" -> (windowRangeFrame, Some(windowRangeFrameSql)),
    "join_range" -> (joinRange, Some(joinRangeSql)),
    "join_asof" -> (joinAsof, Some(joinAsofSql)),
    "join_asof_bucketed" -> (joinAsofBucketed, Some(joinAsofSql)),
    "join_full_outer" -> (joinFullOuter, Some(joinFullOuterSql)),
    "agg_collect" -> (aggCollect, Some(aggCollectSql)),
    "agg_having" -> (aggHaving, Some(aggHavingSql)),
    "table_stats" -> (tableStats, Some(tableStatsSql)),
    "q6_filter_agg" -> (q6FilterAgg, Some(q6FilterAggSql)),
    "correlated_subquery" -> (correlatedSubquery, Some(correlatedSubquerySql)),
    "window_ntile" -> (windowNtile, Some(windowNtileSql)),
    "skew_salted_join" -> (skewSaltedJoin, Some(skewSaltedJoinSql)),
    "skew_salted_agg" -> (skewSaltedAgg, Some(skewSaltedAggSql)),
    "events_session_window" -> (eventsSessionWindow, Some(eventsSessionWindowSql)),
    "agg_percentiles" -> (aggPercentiles, Some(aggPercentilesSql)),
    "agg_percentiles_dist" -> (aggPercentilesDist, Some(aggPercentilesDistSql)),
    "events_outliers" -> (eventsOutliers, Some(eventsOutliersSql)),
    "approx_stats" -> (approxStats, Some(approxStatsSql)),
    "join_semi_anti" -> (joinSemiAnti, Some(joinSemiAntiSql)),
    "pivot_status" -> (pivotStatus, Some(pivotStatusSql)),
    "string_funcs" -> (stringFuncs, Some(stringFuncsSql)),
    "date_funcs" -> (dateFuncs, Some(dateFuncsSql)),
    "q1_agg" -> (q1Agg, Some(q1AggSql)),
    "q3_top_revenue" -> (q3TopRevenue, Some(q3TopRevenueSql)),
    "q5_region_revenue" -> (q5RegionRevenue, Some(q5RegionRevenueSql)),
    "window_running" -> (windowRunning, Some(windowRunningSql)),
    "agg_rollup" -> (aggRollup, Some(aggRollupSql)),
    "set_ops" -> (setOps, Some(setOpsSql)),
    "events_tumbling" -> (eventsTumbling, Some(eventsTumblingSql)),
    "events_sessionize" -> (eventsSessionize, Some(eventsSessionizeSql)),
    "json_extract" -> (jsonExtract, Some(jsonExtractSql)),
  )
}
