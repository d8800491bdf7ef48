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
  * Usage: runMain graft.BucketBench <sfDir> [buckets] [join|asof]
  * Prints one JSON line:
  *   {"mode":…,"plain_sec":…,"bucket_write_sec":…,"bucketed_sec":…,
  *    "buckets":…,"bucketed_exchanges":…,"amortize_after_runs":…}
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

    val (tPlain, tWrite, tBucketed, nExchanges) =
      if (mode == "asof") runAsOf(spark, sfDir, buckets)
      else runJoin(spark, sfDir, buckets)

    val perRunSaving = tPlain - tBucketed
    val amortize = if (perRunSaving > 0) math.ceil(tWrite / perRunSaving).toInt else -1
    println(f"""{"mode":"$mode","plain_sec":$tPlain%.1f,"bucket_write_sec":$tWrite%.1f,""" +
      f""""bucketed_sec":$tBucketed%.1f,"buckets":$buckets,""" +
      f""""bucketed_exchanges":$nExchanges,"amortize_after_runs":$amortize}""")
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
