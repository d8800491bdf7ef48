package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** The remaining TPC-H query shapes (q4, q8, q9, q11–q18, q20, q22),
  * completing the 22-shape family next to the nine in [[Analytics]].
  *
  * The driver's schema has no `partsupp`, `l_shipmode`, `l_commitdate`,
  * `o_comment`, or `c_phone`, so shapes that depend on them are ADAPTED —
  * the join/subquery/aggregation STRUCTURE (what Catalyst has to plan) is
  * preserved; only the filter columns are proxied. Each Scaladoc states the
  * proxy. Monetary/ratio outputs that sit under a comparison, max-equality,
  * or division are computed in exact integer cents
  * (`floor(double_expr * 100)` per row — bit-deterministic in both engines
  * because the per-row IEEE expression is written identically on both
  * sides — then BIGINT sums), so partial-aggregation order can never flip
  * a knife-edge the way a rounded float sum can. Ratios divide two exact
  * longs (one IEEE division of identical operands → identical double).
  */
object TpchOps {
  type Q = (SparkSession, String) => DataFrame

  /** Exact per-row cents for revenue expressions: floor(price·(1−disc)·100).
    * The SQL twin must inline the same expression text. */
  private def volCents = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")
  private val volCentsSql = "CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"

  /** TPC-H Q4: order-priority checking. Proxy for the missing
    * commitdate/receiptdate pair: EXISTS a lineitem that shipped after the
    * order date. Plans as a left-semi join on orderkey with the date
    * comparison as the residual — one shuffle each side, no row
    * multiplication (semi joins short-circuit on first match). */
  val q4PriorityExists: Q = (s, dir) => {
    val ord = table(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }
  val q4PriorityExistsSql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |              AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q8: national market share. EUROPE customers, LARGE parts,
    * two-year window; share of NATION_1 suppliers per order year. All five
    * dimension chains broadcast; the fact shuffles ONCE on l_orderkey for
    * the orders join. The share is an exact-cents ratio emitted in ppm via
    * one IEEE division + floor (portable); the float `round(x, 6)` twin
    * would knife-edge between the engines' different rounding modes. */
  val q8MarketShare: Q = (s, dir) => {
    val li = table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), volCents.as("vol_cents"))
    val part = table(s, dir, "part").filter(col("p_type") === "LARGE").select("p_partkey")
    val ord = table(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
    val custEur = table(s, dir, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val suppNation = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(table(s, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    // part/custEur/suppNation are sf-proportional builds: no forced
    // broadcast hints — AQE decides on measured runtime size (the bounded
    // nation/region hints above stay)
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(custEur, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_1", col("vol_cents")).otherwise(0L)).as("mkt_cents"),
        sum(col("vol_cents")).as("all_cents"))
      .select(col("o_year"),
        floor(col("mkt_cents").cast("double") / col("all_cents").cast("double") * 1000000)
          .cast("long").as("share_ppm"),
        (col("all_cents") / 100.0).as("total_volume"))
  }
  val q8MarketShareSql =
    s"""WITH vol AS (
      |  SELECT year(o_orderdate) AS o_year, $volCentsSql AS vol_cents, n2.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE p_type = 'LARGE' AND r_name = 'EUROPE'
      |    AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
      |SELECT o_year,
      |  CAST(floor(CAST(mkt_cents AS DOUBLE) / CAST(all_cents AS DOUBLE) * 1000000) AS BIGINT) AS share_ppm,
      |  all_cents / 100.0 AS total_volume
      |FROM (SELECT o_year,
      |        CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol_cents ELSE 0 END) AS BIGINT) AS mkt_cents,
      |        CAST(sum(vol_cents) AS BIGINT) AS all_cents
      |      FROM vol GROUP BY o_year)""".stripMargin

  /** TPC-H Q9: product-type profit by supplier nation and year. Proxy for
    * the missing ps_supplycost: cost = 10% of p_retailprice per unit; part
    * filter is name-contains-'red' (names are "color noun"). Profit is an
    * exact per-row cents floor — the subtraction happens INSIDE the per-row
    * expression, identical on both sides, before any aggregation. */
  val q9NationProfit: Q = (s, dir) => {
    val part = table(s, dir, "part").filter(col("p_name").contains("red"))
      .select("p_partkey", "p_retailprice")
    val suppNation = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(table(s, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    table(s, dir, "lineitem")
      .join(part, col("l_partkey") === col("p_partkey")) // sf-proportional: AQE's call
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .withColumn("profit_cents",
        floor((col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * lit(0.1) * col("l_quantity")) * 100).cast("long"))
      .groupBy(col("supp_nation"), year(col("l_shipdate")).as("o_year"))
      .agg((sum(col("profit_cents")) / 100.0).as("profit"), count(lit(1)).as("n"))
  }
  val q9NationProfitSql =
    """SELECT n_name AS supp_nation, year(l_shipdate) AS o_year,
      |  CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS profit,
      |  count(*) AS n
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2""".stripMargin

  /** TPC-H Q11: important stock. Proxy for partsupp value: per-part revenue
    * from lineitem; keep parts above 0.01% of the global total. The global
    * scalar rides a broadcast cross join; the threshold compares exact longs
    * (val·10000 > total — no float fraction). The total is the SAME
    * aggregate subtree as the per-part one, so Spark's ReuseExchange serves
    * both from one shuffle. */
  val q11ImportantParts: Q = (s, dir) => {
    val li = table(s, dir, "lineitem")
      .select(col("l_partkey"), floor(col("l_extendedprice") * 100).cast("long").as("cents"))
    val perPart = li.groupBy(col("l_partkey")).agg(sum(col("cents")).as("val_cents"))
    val total = perPart.agg(sum(col("val_cents")).as("total_cents"))
    perPart.crossJoin(broadcast(total))
      .filter(col("val_cents") * 10000 > col("total_cents"))
      .select(col("l_partkey"), (col("val_cents") / 100.0).as("value"))
  }
  val q11ImportantPartsSql =
    """SELECT l_partkey, val_cents / 100.0 AS value
      |FROM (SELECT l_partkey,
      |        CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS val_cents
      |      FROM lineitem GROUP BY l_partkey)
      |WHERE val_cents * 10000 >
      |  (SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) FROM lineitem)""".stripMargin

  /** TPC-H Q12: shipping-mode priority split. Proxy for l_shipmode:
    * l_linestatus buckets; "late" = shipped more than 90 days after the
    * order date. Fact-fact equi join on orderkey (one shuffle each side),
    * conditional counts map-side. */
  val q12LateLines: Q = (s, dir) => {
    val ord = table(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    table(s, dir, "lineitem").select("l_orderkey", "l_linestatus", "l_shipdate")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
  }
  val q12LateLinesSql =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      |GROUP BY l_linestatus""".stripMargin

  /** TPC-H Q13: customer order-count distribution. Proxy for the o_comment
    * NOT LIKE filter: drop '4-NOT SPECIFIED' priority. Orders pre-aggregate
    * to per-customer counts BEFORE the customer join (shuffles |customers|
    * rows, not |orders| — the naive join-then-count shuffles the fact), then
    * the histogram is a second tiny agg. */
  val q13OrderCounts: Q = (s, dir) => {
    val perCust = table(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    table(s, dir, "customer").select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
  }
  val q13OrderCountsSql =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT coalesce(n, 0) AS c_count
      |      FROM customer LEFT OUTER JOIN
      |        (SELECT o_custkey, count(*) AS n FROM orders
      |         WHERE o_orderpriority <> '4-NOT SPECIFIED' GROUP BY o_custkey) o
      |        ON c_custkey = o_custkey)
      |GROUP BY c_count""".stripMargin

  /** TPC-H Q14: promo revenue share for one ship month. p_type = 'PROMO'
    * is a real value in this schema (no LIKE proxy needed). Part broadcast;
    * share emitted in exact ppm. */
  val q14PromoShare: Q = (s, dir) => {
    val part = table(s, dir, "part").select("p_partkey", "p_type")
    table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .select(col("l_partkey"), volCents.as("vol_cents"))
      .join(part, col("l_partkey") === col("p_partkey")) // sf-proportional: AQE's call
      .agg(sum(when(col("p_type") === "PROMO", col("vol_cents")).otherwise(0L)).as("promo_cents"),
        sum(col("vol_cents")).as("all_cents"))
      .select(
        floor(col("promo_cents").cast("double") / col("all_cents").cast("double") * 1000000)
          .cast("long").as("promo_ppm"),
        (col("all_cents") / 100.0).as("total_revenue"))
  }
  val q14PromoShareSql =
    s"""SELECT
      |  CAST(floor(CAST(promo_cents AS DOUBLE) / CAST(all_cents AS DOUBLE) * 1000000) AS BIGINT) AS promo_ppm,
      |  all_cents / 100.0 AS total_revenue
      |FROM (SELECT
      |        CAST(sum(CASE WHEN p_type = 'PROMO' THEN vol_cents ELSE 0 END) AS BIGINT) AS promo_cents,
      |        CAST(sum(vol_cents) AS BIGINT) AS all_cents
      |      FROM (SELECT l_partkey, $volCentsSql AS vol_cents FROM lineitem
      |            WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01')
      |      JOIN part ON l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q15: top supplier(s) by quarterly revenue. The max-equality
    * selection is on exact cents longs, so ties resolve identically in both
    * engines. The revenue aggregate subtree appears twice (output + scalar
    * max) — identical, so ReuseExchange computes it once. */
  val q15TopSupplier: Q = (s, dir) => {
    val rev = table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_suppkey"), volCents.as("vol_cents"))
      .groupBy(col("l_suppkey")).agg(sum(col("vol_cents")).as("rev_cents"))
    val mx = rev.agg(max(col("rev_cents")).as("mx"))
    rev.crossJoin(broadcast(mx)).filter(col("rev_cents") === col("mx"))
      .join(table(s, dir, "supplier").select("s_suppkey", "s_name"), // sf-proportional: AQE's call
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), (col("rev_cents") / 100.0).as("total_revenue"))
  }
  val q15TopSupplierSql =
    s"""WITH rev AS (
      |  SELECT l_suppkey, CAST(sum($volCentsSql) AS BIGINT) AS rev_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, rev_cents / 100.0 AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_cents = (SELECT max(rev_cents) FROM rev)""".stripMargin

  /** TPC-H Q16: supplier variety per part attribute triple. Proxy for the
    * missing partsupp relation: lineitem IS the part↔supplier relation;
    * proxy for the complaint filter: negative-balance suppliers are
    * excluded (NOT IN → left-anti against a broadcast ~nothing). countDistinct
    * shuffles only (triple, suppkey) pairs after map-side dedup. */
  val q16SupplierVariety: Q = (s, dir) => {
    val part = table(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val excl = table(s, dir, "supplier").filter(col("s_acctbal") < 0).select("s_suppkey")
    table(s, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(part, col("l_partkey") === col("p_partkey")) // part/excl sf-proportional: AQE's call
      .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }
  val q16SupplierVarietySql =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1,4,9,14,19,24,29,34,39,44,49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q17: small-quantity-order revenue. The correlated avg-quantity
    * subquery becomes a tiny per-part agg broadcast back onto the filtered
    * fact; the 20%-of-average threshold compares INTEGERS
    * (qty·5·cnt < sum_qty — quantities are integral), never a float
    * average. */
  val q17SmallQtyRevenue: Q = (s, dir) => {
    val part = table(s, dir, "part")
      .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
      .select("p_partkey")
    val fil = table(s, dir, "lineitem")
      .join(part, col("l_partkey") === col("p_partkey")) // sf-proportional: AQE's call
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
    val per = fil.groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("sq"), count(lit(1)).as("cnt"))
    fil.join(per, Seq("l_partkey")) // per grows with |part|: AQE's call
      .filter(col("qty") * 5 * col("cnt") < col("sq"))
      .agg((sum(col("cents")) / 700.0).as("avg_yearly"), count(lit(1)).as("n"))
  }
  val q17SmallQtyRevenueSql =
    """WITH fil AS (
      |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'),
      |per AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sq, count(*) AS cnt
      |        FROM fil GROUP BY l_partkey)
      |SELECT CAST(sum(cents) AS BIGINT) / 700.0 AS avg_yearly, count(*) AS n
      |FROM fil JOIN per USING (l_partkey)
      |WHERE qty * 5 * cnt < sq""".stripMargin

  /** TPC-H Q18: large-volume orders. The HAVING-filtered per-order quantity
    * agg shrinks to ~nothing, so it broadcasts into the orders join (the
    * fact never re-shuffles); customer is a broadcast dim. Deterministic
    * top-100 by (price DESC, orderkey). */
  val q18BigOrders: Q = (s, dir) => {
    val big = table(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 300)
    table(s, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey")) // big/customer grow with sf: AQE's call
      .join(table(s, dir, "customer").select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        // floor-cents, not round(_, 2): Spark rounds via BigDecimal HALF_UP
        // while DuckDB rounds doubles half-away-from-zero in float math, so
        // a knife-edge value can flip both the hash and the top-100 cut.
        // floor(x*100) as a long is exact in both engines (house rule).
        floor(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("total_qty"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
      .limit(100)
  }
  val q18BigOrdersSql =
    """SELECT c_custkey, c_name, o_orderkey,
      |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents, total_qty
      |FROM (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING sum(CAST(l_quantity AS BIGINT)) > 300) big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY price_cents DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q20: dominant suppliers. Proxy for the partsupp availability
    * test: a supplier "dominates" a STANDARD part if it shipped more than
    * half that part's 1996 volume. Per-(part,supplier) agg, then a window
    * total over the (already tiny) agged table — the fact is scanned and
    * shuffled once. Quantities are integral, so the half test is
    * qty_ps·2 > qty_p in longs. */
  val q20HalfSupplied: Q = (s, dir) => {
    val part = table(s, dir, "part").filter(col("p_type") === "STANDARD").select("p_partkey")
    val qty = table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(part, col("l_partkey") === col("p_partkey")) // sf-proportional: AQE's call
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty_ps"))
    val w = Window.partitionBy(col("l_partkey"))
    val picked = qty.withColumn("qty_p", sum(col("qty_ps")).over(w))
      .filter(col("qty_ps") * 2 > col("qty_p"))
      .select(col("l_suppkey")).distinct()
    picked
      .join(table(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey"), // sf-proportional
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(table(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name").as("supp_nation"))
  }
  val q20HalfSuppliedSql =
    """WITH q AS (
      |  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_ps
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'STANDARD'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY l_partkey, l_suppkey),
      |d AS (SELECT DISTINCT l_suppkey FROM
      |        (SELECT l_suppkey, qty_ps,
      |           CAST(sum(qty_ps) OVER (PARTITION BY l_partkey) AS BIGINT) AS qty_p FROM q)
      |      WHERE qty_ps * 2 > qty_p)
      |SELECT s_suppkey, s_name, n_name AS supp_nation
      |FROM d JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey""".stripMargin

  /** TPC-H Q22: idle wealthy customers. Proxy for the phone-prefix country
    * code: c_nationkey mod 5. "Wealthier than the positive-balance average"
    * compares exact cents longs against the broadcast global sum/count
    * (cents·n > s — no float average); "idle" is a left-anti join against
    * recent orders (no order since 2000 — the unbounded "never ordered" set
    * is empty in this data). */
  val q22IdleCustomers: Q = (s, dir) => {
    val cust = table(s, dir, "customer")
      .withColumn("cents", floor(col("c_acctbal") * 100).cast("long"))
    val posStats = cust.filter(col("cents") > 0)
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
    cust.crossJoin(broadcast(posStats))
      .filter(col("cents") * col("n") > col("s"))
      .join(table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_nationkey") % 5).cast("long").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), (sum(col("cents")) / 100.0).as("totacctbal"))
  }
  val q22IdleCustomersSql =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey, CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer),
      |st AS (SELECT CAST(sum(cents) AS BIGINT) AS s, count(*) AS n FROM cust WHERE cents > 0)
      |SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, count(*) AS numcust,
      |  CAST(sum(cents) AS BIGINT) / 100.0 AS totacctbal
      |FROM cust, st
      |WHERE cents * n > s
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY 1""".stripMargin

  def defs: Map[String, (Q, Option[String])] = Map(
    "q4_priority_exists" -> (q4PriorityExists, Some(q4PriorityExistsSql)),
    "q8_market_share" -> (q8MarketShare, Some(q8MarketShareSql)),
    "q9_nation_profit" -> (q9NationProfit, Some(q9NationProfitSql)),
    "q11_important_parts" -> (q11ImportantParts, Some(q11ImportantPartsSql)),
    "q12_late_lines" -> (q12LateLines, Some(q12LateLinesSql)),
    "q13_order_counts" -> (q13OrderCounts, Some(q13OrderCountsSql)),
    "q14_promo_share" -> (q14PromoShare, Some(q14PromoShareSql)),
    "q15_top_supplier" -> (q15TopSupplier, Some(q15TopSupplierSql)),
    "q16_supplier_variety" -> (q16SupplierVariety, Some(q16SupplierVarietySql)),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue, Some(q17SmallQtyRevenueSql)),
    "q18_big_orders" -> (q18BigOrders, Some(q18BigOrdersSql)),
    "q20_half_supplied" -> (q20HalfSupplied, Some(q20HalfSuppliedSql)),
    "q22_idle_customers" -> (q22IdleCustomers, Some(q22IdleCustomersSql)),
  )
}
