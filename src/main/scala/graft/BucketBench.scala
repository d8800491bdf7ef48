package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layout-amortization measurement for the sustained single-box walls the
  * sf100 sweeps surfaced (SCALING.md rounds 11-12): queries that are
  * genuinely SHUFFLE-bound, where the production answer is layout, not a
  * knob — pay the exchange ONCE at write time, then every later run reads
  * co-located (and, for the as-of, pre-sorted) buckets with zero input
  * shuffle.
  *
  * Two modes:
  *   - `join` — the two-big-table sort-merge join (q5's lineitem⋈orders
  *     shape, ~25 GB of shuffle per run at sf100): both fact tables
  *     bucketed+sorted on the join key.
  *   - `asof` — the as-of join (join_asof's shape, 126 s at sf100): the
  *     operator's ONE exchange is the key shuffle + (key, time, side) sort
  *     of the tagged union ([[graft.operators.AsOfJoin]]). The union
  *     itself is written bucketed BY key and sorted BY (key, time, side),
  *     so the carry window runs straight off the scan.
  *
  * Measurement hygiene: one UNTIMED warm-up run precedes the timed plain
  * run — without it the plain query reads a cold OS page cache while the
  * bucketed run follows the layout write that just touched every byte,
  * inflating plain_sec and flattering amortize_after_runs.
  *
  * Three modes:
  *   - `join` — the two-big-table sort-merge join (q5's lineitem⋈orders
  *     shape); both fact tables bucketed+sorted on the join key.
  *   - `asof` — the as-of join's tagged-union shape.
  *   - `tpch` — the three remaining sf100 TPC-H walls (round-15 verdict
  *     task 1: q21 115 s / q4 95 s / q10 80 s in bench/r15_tpch_sf100
  *     .json), ALL orderkey-keyed fact-fact shapes served by ONE shared
  *     layout: lineitem bucketed+sorted on l_orderkey (q21's probe + both
  *     EXISTS/NOT-EXISTS scans, q4's semi probe side, q10's fact side)
  *     and orders bucketed+sorted on o_orderkey (q4/q10's other side).
  *     Column-pruned to the family's 10 columns — parquet scans prune
  *     identically either way, so the pruning changes write cost only.
  *
  * Usage: runMain graft.BucketBench <sfDir> [buckets] [join|asof|tpch]
  * Prints one JSON line (join/asof):
  *   {"mode":…,"plain_sec":…,"bucket_write_sec":…,"bucketed_sec":…,
  *    "buckets":…,"bucketed_exchanges":…,"amortize_after_runs":…}
  * or per-query plain/bucketed run pairs + exchange counts + layout_cold
  * (tpch — warm runs skip the write via LayoutCache and report it).
  */
object BucketBench {
  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val buckets = if (args.length > 1) args(1).toInt else 256
    val mode = if (args.length > 2) args(2) else "join"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", buckets)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", graft.core.EphemeralWarehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (mode == "tpch") {
      println(runTpch(spark, sfDir, buckets))
    } else {
      val (tPlain, tWrite, tBucketed, nExchanges) =
        if (mode == "asof") runAsOf(spark, sfDir, buckets)
        else runJoin(spark, sfDir, buckets)

      val perRunSaving = tPlain - tBucketed
      val amortize = if (perRunSaving > 0) math.ceil(tWrite / perRunSaving).toInt else -1
      println(f"""{"mode":"$mode","plain_sec":$tPlain%.1f,"bucket_write_sec":$tWrite%.1f,""" +
        f""""bucketed_sec":$tBucketed%.1f,"buckets":$buckets,""" +
        f""""bucketed_exchanges":$nExchanges,"amortize_after_runs":$amortize}""")
    }
    spark.stop()
  }

  /** Exchanges in the final (post-AQE) physical plan of `df`'s last run. */
  private def exchanges(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def all(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case n => n }.flatMap {
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => s +: all(s.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r +: all(r.child)
        case n => Seq(n)
      }.distinct
    all(plan).count(_.getClass.getSimpleName.startsWith("ShuffleExchange"))
  }

  // ---- mode tpch: the q21/q4/q10 fact-fact walls off ONE shared layout ------
  /** The round-15 verdict's remaining sf100 walls are all orderkey-keyed
    * lineitem(-orders) shapes whose cost is the fact-table exchange feeding
    * a sort-merge (semi/anti/inner) join. One layout pays that exchange
    * once; each query's residual conditions (suppkey inequality, shipdate
    * comparison, date-range/returnflag filters) ride the co-located join
    * unchanged. Queries mirror graft.queries.Analytics q21/q10 and
    * TpchOps q4 exactly — same filters — and the losslessness require
    * compares SORTED result canons (q4 has no ORDER BY; partition order
    * is not semantics), with q10 gated on an exact-cents twin because its
    * timed double-sum is legally order-sensitive in the last cent. The
    * layout is published through [[graft.core.LayoutCache]] (join_bucketed's
    * machinery): warm sessions skip the write and the JSON says which
    * happened ("layout_cold"). */
  private def runTpch(spark: SparkSession, sfDir: String, buckets: Int): String = {
    val liPlain = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      col("l_orderkey"), col("l_suppkey"), col("l_shipdate"), col("l_returnflag"),
      col("l_extendedprice"), col("l_discount"))
    val ordPlain = spark.read.parquet(s"$sfDir/orders.parquet").select(
      col("o_orderkey"), col("o_orderdate"), col("o_custkey"), col("o_orderpriority"))
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"), col("s_name"))
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val nat = spark.read.parquet(s"$sfDir/nation.parquet")

    // the three walls, parameterized by the fact-table layout
    def q21(li: DataFrame): DataFrame = {
      val others = li.select(col("l_orderkey").as("o2"),
        col("l_suppkey").as("s2"), col("l_shipdate").as("d2"))
      li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(others, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        .join(others, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2") &&
          col("d2") > col("l_shipdate"), "left_anti")
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(10)
    }
    def q4(li: DataFrame, ord: DataFrame): DataFrame =
      ord.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .join(li.select(col("l_orderkey"), col("l_shipdate")),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("order_count"))
    def q10(li: DataFrame, ord: DataFrame): DataFrame =
      li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)

    // q10's LOSSLESSNESS twin (round-16 advice): the timed query sums
    // doubles and rounds, so summation ORDER — which legitimately differs
    // between the plain and bucketed physical plans — can flip the last
    // cent and reorder the top-20 boundary. The equality gate therefore
    // runs on exact long cents (associative+commutative, order-free, and
    // the (revenue_cents desc, c_custkey) order is total since c_custkey
    // is unique per group), while the TIMED query stays the double/round
    // form the r15/r16 walls were measured on.
    def q10Cents(li: DataFrame, ord: DataFrame): DataFrame =
      li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey")).limit(20)

    // (timed query, losslessness twin) — None means the timed query IS its
    // own twin (deterministic result), so the gate reuses the second timed
    // run's rows instead of paying a third full evaluation (~100 s/
    // invocation at sf100 across the plain+bucketed sides)
    val queries: Seq[(String, (DataFrame, DataFrame) => DataFrame,
        Option[(DataFrame, DataFrame) => DataFrame])] = Seq(
      ("q21", (li: DataFrame, _: DataFrame) => q21(li), None),
      ("q4", (li: DataFrame, ord: DataFrame) => q4(li, ord), None),
      ("q10", (li: DataFrame, ord: DataFrame) => q10(li, ord),
        Some((li: DataFrame, ord: DataFrame) => q10Cents(li, ord))))

    // SORTED canon (round-16 advice): q4 ends in a groupBy with no ORDER
    // BY, so the two physical plans can return its 5 groups in different
    // partition orders — an order-sensitive compare would spuriously fail
    // an expensive sf100 run over a legitimate reordering
    def canon(df: DataFrame): Seq[String] = df.collect().map(_.toString).toSeq.sorted

    // plain side: one untimed warm-up then two timed runs per query (the
    // r12 discipline — equalize page-cache state, expose run-to-run
    // spread); the losslessness twin is evaluated untimed only where it
    // differs from the timed query (q10's cents form)
    val plain = queries.map { case (name, q, lossless) =>
      canon(q(liPlain, ordPlain))
      val (t1, _) = time(canon(q(liPlain, ordPlain)))
      val (t2, rows) = time(canon(q(liPlain, ordPlain)))
      name -> ((Seq(t1, t2),
        lossless.map(l => canon(l(liPlain, ordPlain))).getOrElse(rows)))
    }

    // layout pass via LayoutCache (round-16 verdict task 5): the family
    // layout is PUBLISHED under a content fingerprint of the source trees
    // + spec, exactly like join_bucketed's — the first session pays the
    // write once (127.2 s at sf100, r16), every later JVM registers
    // external bucketed tables over the published files and the
    // 27.1 s/pass number is the default, not a harness-only result.
    // Inside the build: repartition = the single exchange, one file per
    // bucket, so later scans are one-task-per-bucket and Spark trusts the
    // bucket sort order.
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "")
    val (lDdl, oDdl) = (liPlain.schema.toDDL, ordPlain.schema.toDDL)
    val fp = graft.core.LayoutCache.fingerprint("graft-bucketbench-tpch-v1", sfDir,
      Seq("lineitem.parquet", "orders.parquet"),
      s"buckets=$buckets;li=($lDdl)sort=l_orderkey;ord=($oDdl)sort=o_orderkey")
    val cacheRoot = new java.io.File(
      sys.props.getOrElse("graft.bucketLayoutRoot", "target/bucket-layout"))
    val (tWrite, (dataDir, cold)) = time {
      graft.core.LayoutCache.getOrBuild(cacheRoot, fp) { tmpDir =>
        def writeOne(df: DataFrame, key: String, sub: String): Unit = {
          val bn = s"bb_tpch_build_${sub}_$nonce"
          df.repartition(buckets, col(key))
            .write.mode("overwrite").format("parquet")
            .bucketBy(buckets, key).sortBy(key)
            .option("path", new java.io.File(tmpDir, sub).getAbsolutePath)
            .saveAsTable(bn)
          spark.sql(s"DROP TABLE $bn"): Unit // external: files stay
        }
        writeOne(liPlain, "l_orderkey", "lineitem")
        writeOne(ordPlain, "o_orderkey", "orders")
      }
    }
    def register(sub: String, ddl: String, key: String): DataFrame = {
      val n = s"bb_tpch_${sub}_$nonce"
      spark.sql(
        s"""CREATE TABLE $n ($ddl) USING parquet
           |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
           |LOCATION '${new java.io.File(dataDir, sub).getAbsolutePath}'""".stripMargin)
      spark.table(n)
    }
    val bl = register("lineitem", lDdl, "l_orderkey")
    val bo = register("orders", oDdl, "o_orderkey")

    val bucketed = queries.map { case (name, q, lossless) =>
      canon(q(bl, bo))
      val (t1, _) = time(canon(q(bl, bo)))
      // the second timed run keeps its DataFrame so the exchange count
      // reads the post-AQE plan of an actual timed execution — no third run
      val df2 = q(bl, bo)
      val (t2, rows) = time(canon(df2))
      name -> ((Seq(t1, t2),
        lossless.map(l => canon(l(bl, bo))).getOrElse(rows), exchanges(df2)))
    }

    // losslessness: identical result multisets per query, EVERY run (warm
    // layouts included) — exact-arithmetic twins, sorted canon
    plain.zip(bucketed).foreach { case ((n, (_, pr)), (_, (_, br, _))) =>
      require(pr == br, s"bucketed layout changed $n's result")
    }

    val perQ = plain.zip(bucketed).map { case ((n, (pt, _)), (_, (bt, _, ex))) =>
      f""""$n":{"plain_sec":[${pt.map(t => f"$t%.1f").mkString(",")}],""" +
        f""""bucketed_sec":[${bt.map(t => f"$t%.1f").mkString(",")}],"bucketed_exchanges":$ex}"""
    }.mkString(",")
    f"""{"mode":"tpch","buckets":$buckets,"layout_cold":$cold,""" +
      f""""bucket_write_sec":$tWrite%.1f,$perQ}"""
  }

  // ---- mode join: q5's big equi-join core -----------------------------------
  private def runJoin(spark: SparkSession, sfDir: String, buckets: Int)
      : (Double, Double, Double, Int) = {
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")

    // the recurring query: q5's big-join core + a bounded agg
    def joinAgg(l: DataFrame, o: DataFrame): Array[org.apache.spark.sql.Row] = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))
      .collect() // 5 priority rows — constant-size at any scale

    joinAgg(lineitem, orders) // untimed warm-up: equalize page-cache state
    val (tPlain, plainRows) = time(joinAgg(lineitem, orders))

    // layout pass, paid once: repartition = the single exchange, then a
    // bucketed+sorted managed-table write (one file per bucket)
    val (tWrite, _) = time {
      lineitem.repartition(buckets, col("l_orderkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("bb_lineitem")
      orders.repartition(buckets, col("o_orderkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bb_orders")
    }

    val bl = spark.table("bb_lineitem"); val bo = spark.table("bb_orders")
    val (tBucketed, bRows) = time(joinAgg(bl, bo))
    val nEx = exchanges(bl.join(bo, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n")))

    // losslessness: identical 5-row aggregate both ways
    def canon(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    require(canon(plainRows) == canon(bRows),
      s"bucketed layout lost rows: ${canon(bRows)} vs ${canon(plainRows)}")
    (tPlain, tWrite, tBucketed, nEx)
  }

  // ---- mode asof: join_asof's union+window shape ----------------------------
  private def runAsOf(spark: SparkSession, sfDir: String, buckets: Int)
      : (Double, Double, Double, Int) = {
    import org.apache.spark.sql.expressions.Window
    // exactly join_asof's inputs (queries.Analytics.joinAsof)
    val ev = graft.queries.Util.eventsWithTs(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val ordW = Window.partitionBy(col("o_custkey"), col("ot_us")).orderBy(col("o_orderkey").desc)
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("ot_us", unix_micros(col("o_orderdate").cast("timestamp")))
      .withColumn("_rn", row_number().over(ordW)).filter(col("_rn") === 1).drop("_rn")
      .select(col("o_custkey").as("user_id"), col("ot_us"),
        col("o_orderkey"), round(col("o_totalprice"), 2).as("o_price"))
    val payload = Seq("o_orderkey", "o_price")
    val (unioned, names, leftCols) = graft.operators.AsOfJoin.taggedUnion(
      ev, ord, key = "user_id", leftTime = "ts_us", rightTime = "ot_us",
      payload = payload, forward = false)
    val (kC, tC, sideC, _) = names

    // window-carry probe rule: noop SINK, never count() — Catalyst prunes
    // an unconsumed window entirely (SCALING.md round-11)
    def run(u: DataFrame): DataFrame = {
      val out = graft.operators.AsOfJoin.carryFrom(u, names, leftCols, payload)
      out.write.format("noop").mode("overwrite").save()
      out
    }
    // equality across layouts: order-free checksum — count + bit_xor of row
    // hashes PLUS the sums of each hash's 32-bit halves. Xor alone cancels
    // under any EVEN multiset discrepancy (a dropped pair plus a duplicated
    // pair hashes clean); the half-sums break that symmetry and stay
    // ANSI-overflow-safe (each half < 2^32, so the sum holds to ~2^31 rows,
    // where a raw SUM of int64 hashes throws). One row collected.
    def checksum(u: DataFrame): Seq[Long] = {
      val r = graft.operators.AsOfJoin.carryFrom(u, names, leftCols, payload)
        .select(xxhash64(col("event_id"), col("user_id"), col("ts_us"),
          col("asof_o_orderkey"), col("asof_o_price")).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)"),
          sum(expr("h & 4294967295")), sum(expr("shiftright(h, 32) & 4294967295")))
        .collect()(0)
      (0 to 3).map(i => if (r.isNullAt(i)) 0L else r.getLong(i))
    }

    run(unioned) // untimed warm-up: equalize page-cache state
    val (tPlain, _) = time(run(unioned))

    // layout pass, paid once: the operator's one exchange + sort happen
    // HERE — bucketed by key, sorted by (key, time, side), one file/bucket
    val (tWrite, _) = time {
      unioned.repartition(buckets, col(kC))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, kC).sortBy(kC, tC, sideC)
        .saveAsTable("bb_asof_union")
    }
    val stored = spark.table("bb_asof_union")
    val (tBucketed, out) = time(run(stored))
    val nEx = exchanges(out)

    require(checksum(unioned) == checksum(stored),
      "bucketed as-of layout changed the result")
    (tPlain, tWrite, tBucketed, nEx)
  }
}
