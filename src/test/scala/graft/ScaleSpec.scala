package graft

import org.apache.spark.sql.functions._

/** Specs for the storage-layout scale patterns: partition pruning on
  * partitioned writes, and bucketed co-located joins that plan without a
  * shuffle exchange — the two layouts that matter most at 100 TB.
  */
class ScaleSpec extends SparkSpec {

  test("partitionBy write → partition pruning at read (no full scan)") {
    val dir = tmpDir("graft-part")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(dir.getAbsolutePath)
    val read = spark.read.parquet(dir.getAbsolutePath).filter(col("o_year") === 1995)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"partition filter missing:\n$plan")
    // pruning actually works: only the 1995 directory is touched
    val scanned = read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("o_year=1994") || scanned.contains("o_year=1995"))
    val expected = orders.filter(col("o_year") === 1995).count()
    assert(read.count() == expected && expected > 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = tmpDir("graft-warehouse")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bk LOCATION '${wh.getAbsolutePath}'")
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_bk.li_b")
      ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_bk.ord_b")
      // disable auto-broadcast so the join must co-locate via buckets
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graft_bk.li_b")
          .join(spark.table("graft_bk.ord_b"), col("l_orderkey") === col("o_orderkey"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("ShuffleExchange"), s"bucketed join still shuffles:\n$plan")
        assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"),
          s"expected bucketed sort-merge join:\n$plan")
        assert(joined.count() == li.count()) // every lineitem has its order
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql("DROP DATABASE IF EXISTS graft_bk CASCADE")
  }
}
