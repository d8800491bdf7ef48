package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X1 — deterministic shard assignment (reference: src/main.rs:714-718).
  *
  * The reference splits its scan-order file list into consecutive chunks of
  * `--files-per-db` (default 500); the chunk index is the shard id and the
  * output file name. Directory-iterator order is platform-dependent, so we
  * define scan order as ORDER BY the given sort keys (documented divergence,
  * SURVEY.md §7.4).
  *
  * Scale note: a global row_number is a single-partition window — fine for
  * the reference-parity path, but at 1000-executor scale use
  * [[shardByRange]]: zero global ordering bottleneck, same shard sizes.
  */
object Sharding {
  val DefaultFilesPerShard = 500 // reference: src/main.rs:68-69

  /** Exact reference semantics: consecutive chunks in global sort order. */
  def shardConsecutive(df: DataFrame, filesPerShard: Int, order: Column*): DataFrame = {
    val w = Window.orderBy(order: _*)
    df.withColumn("shard_id",
      floor((row_number().over(w) - lit(1)) / lit(filesPerShard)).cast("int"))
  }

  /** Scalable variant: repartitionByRange on the sort key gives ~equal-size,
    * ordered shards without a global window; shard id = partition id. */
  def shardByRange(df: DataFrame, numShards: Int, order: Column*): DataFrame = {
    import org.apache.spark.sql.functions.spark_partition_id
    df.repartitionByRange(numShards, order: _*)
      .withColumn("shard_id", spark_partition_id())
  }

  /** Scalable global cumulative sum: appends `outCol` = running sum of
    * `valueCol` (cast to long) in ascending `orderCol` order, WITHOUT a
    * single-partition window. Range-partition on the order key gives a total
    * order across partitions; per-partition totals (one long per partition)
    * are collected, prefix-scanned on the driver, and broadcast back as
    * offsets — the classic two-pass distributed prefix sum. Data rows only
    * ever move through the one parallel range shuffle.
    */
  def cumSum(df: DataFrame, orderCol: String, valueCol: Column, outCol: String): DataFrame =
    cumSumBy(df, Seq(orderCol), valueCol, outCol)

  /** [[cumSum]] with a composite (lexicographic) ordering — e.g. a running
    * rank over `(group, sort_key, tiebreak)` for distributed per-group
    * ranking without a per-group window. */
  def cumSumBy(df: DataFrame, orderCols: Seq[String], valueCol: Column, outCol: String): DataFrame =
    cumSumByCounted(df, orderCols, valueCol, outCol)._1

  /** [[cumSumBy]] that ALSO returns the grand total (the fold of pass 1's
    * per-partition totals) — already on the driver when the scan runs, so
    * consumers that need "sum of everything" (e.g. a shard count) get it
    * for ZERO extra jobs and zero extra input listings. */
  def cumSumByCounted(df: DataFrame, orderCols: Seq[String], valueCol: Column,
      outCol: String): (DataFrame, Long) =
    twoPassScan(df, orderCols, valueCol, outCol,
      zero = 0L, exclusive = false)(_ + _) // null-safe: null values count 0

  /** Scalable global EXCLUSIVE prefix max: appends `outCol` = max of
    * `valueCol` (cast to long) over all rows STRICTLY BEFORE the current one
    * in ascending `orderCols` order — [[Long.MinValue]] for the first row
    * (and anywhere no predecessor carries a non-null value; nulls don't
    * participate). Max is associative, so it rides the same two-pass scan
    * as [[cumSumBy]]; exclusive semantics because the main consumer
    * ([[Skyline.globalSkyline]]) needs "best among strictly earlier keys".
    * (Returns only the frame — the pass-1 fold is a MAX here, not a count.)
    */
  def cumMaxBy(df: DataFrame, orderCols: Seq[String], valueCol: Column, outCol: String): DataFrame =
    twoPassScan(df, orderCols, valueCol, outCol,
      zero = Long.MinValue, exclusive = true)(math.max)._1

  /** The shared two-pass distributed prefix scan over any associative
    * `op` with identity `zero` (null values coalesce to `zero`, so they
    * never perturb the running value): range-partition on the order key
    * for a total order across partitions, reduce one long per partition to
    * the driver, prefix-scan those, broadcast back as per-partition seeds.
    * Data rows only ever move through the one parallel range shuffle —
    * pass 2 reuses the shuffle files. `exclusive` emits the PRE-update
    * running value (prefix over strictly-preceding rows). */
  private def twoPassScan(
      df: DataFrame, orderCols: Seq[String], valueCol: Column, outCol: String,
      zero: Long, exclusive: Boolean)(op: (Long, Long) => Long): (DataFrame, Long) = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    // internal column must be collision-free: withColumn REPLACES an existing
    // name in place, which would silently corrupt the positional reads below
    val tmpCol = Iterator.iterate("_ts_v")(_ + "_").dropWhile(df.columns.contains).next()
    val ranged = df
      .withColumn(tmpCol, coalesce(valueCol.cast("long"), lit(zero)))
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    // stay on InternalRow: Dataset.rdd would deserialize every row through
    // Scala converters and createDataFrame would re-encode them — measured
    // 4-5× slower on wide scans. The running value REUSES the appended
    // tmp column's (last, non-null long) slot, renamed to outCol below.
    val vIdx = ranged.schema.length - 1
    val rdd = ranged.queryExecution.toRdd
    // pass 1: one long per partition reaches the driver
    val totals = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.foldLeft(zero)((a, r) => op(a, r.getLong(vIdx))))
      }
      .collect().toMap
    val n = rdd.getNumPartitions
    val offsets = (0 until n)
      .scanLeft(zero)((acc, pid) => op(acc, totals.getOrElse(pid, zero))).toArray
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    // pass 2: the range shuffle's files are reused, not recomputed; each
    // partition streams through with its seed
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bcOffsets.value(pid)
      it.map { r =>
        val c = r.copy() // toRdd reuses the row object per partition
        val v = c.getLong(vIdx)
        if (exclusive) { c.setLong(vIdx, acc); acc = op(acc, v) }
        else { acc = op(acc, v); c.setLong(vIdx, acc) }
        c
      }
    }
    (GraftBridge.internalCreateDataFrame(spark, out,
      StructType(df.schema.fields :+ StructField(outCol, LongType, nullable = false))),
      offsets(n)) // the fold over ALL partitions — grand total under `op`
  }

  /** Exact consecutive chunking WITHOUT a single-partition window over the
    * data: global ranks are computed on a SKINNY (distinct-key) projection via
    * [[cumSum]] of 1s, then joined back on the key. The wide rows — audio
    * content at 100 TB — only ever move through parallel shuffles, never
    * through one task. Keys are ranked DISTINCT (generic type), so duplicate
    * key values share a shard instead of multiplying rows through the join.
    */
  def shardConsecutiveByKey(df: DataFrame, keyCol: String, filesPerShard: Int): DataFrame =
    shardConsecutiveByKeyCounted(df, keyCol, filesPerShard)._1

  /** [[shardConsecutiveByKey]] that ALSO returns the distinct-key count —
    * free (it is the ranking scan's pass-1 grand total), so callers that
    * need the shard count (the CLI sinks size their repartition by it)
    * never re-list or re-scan the input to count. */
  def shardConsecutiveByKeyCounted(
      df: DataFrame, keyCol: String, filesPerShard: Int): (DataFrame, Long) = {
    val (ranked, nKeys) = cumSumByCounted(
      df.select(col(keyCol)).distinct(), Seq(keyCol), lit(1L), "_rank")
    val shardMap = ranked.select(col(keyCol),
      floor((col("_rank") - 1) / filesPerShard).cast("int").as("shard_id"))
    (df.join(shardMap, Seq(keyCol)), nKeys)
  }
}
