package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layout-amortization measurement for the ONE sustained single-box wall
  * the sf100 sweep surfaced (SCALING.md round-11): the two-big-table
  * sort-merge join (q5's lineitem⋈orders shape) moves ~25 GB of shuffle
  * per RUN. The production answer is layout, not a knob: write both fact
  * tables bucketed+sorted by the join key ONCE (the bucketing is the
  * exchange, paid at layout time), and every later run of the join reads
  * co-located buckets with ZERO input shuffle — `join_bucketed`'s plan
  * property, here measured at the scale where it matters.
  *
  * Usage: runMain graft.BucketBench <sfDir> [buckets]
  * Prints one JSON line:
  *   {"plain_sec":…,"bucket_write_sec":…,"bucketed_join_sec":…,
  *    "buckets":…,"amortize_after_runs":…}
  */
object BucketBench {
  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val buckets = if (args.length > 1) args(1).toInt else 256
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

    val (tBucketed, bRows) = time(joinAgg(spark.table("bb_lineitem"), spark.table("bb_orders")))

    // losslessness: identical 5-row aggregate both ways
    def canon(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    require(canon(plainRows) == canon(bRows),
      s"bucketed layout lost rows: ${canon(bRows)} vs ${canon(plainRows)}")

    val perRunSaving = tPlain - tBucketed
    val amortize = if (perRunSaving > 0) math.ceil(tWrite / perRunSaving).toInt else -1
    println(f"""{"plain_sec":$tPlain%.1f,"bucket_write_sec":$tWrite%.1f,""" +
      f""""bucketed_join_sec":$tBucketed%.1f,"buckets":$buckets,""" +
      f""""amortize_after_runs":$amortize}""")
    spark.stop()
  }
}
