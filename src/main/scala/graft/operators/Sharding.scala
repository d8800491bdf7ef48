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

  /** Exact consecutive chunking WITHOUT a single-partition window over the
    * data: global ranks are computed on a SKINNY (key-only) projection with
    * range-partition + per-partition zipWithIndex (partition sizes are tiny
    * metadata; order across range partitions is total), then joined back on
    * the key. The wide rows — audio content at 100 TB — only ever move
    * through parallel shuffles, never through one task.
    */
  def shardConsecutiveByKey(df: DataFrame, keyCol: String, filesPerShard: Int): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val skinny = df.select(col(keyCol)).repartitionByRange(parts, col(keyCol))
      .sortWithinPartitions(col(keyCol))
    val ranked = skinny.rdd.zipWithIndex.map { case (row, rank) =>
      (row.getString(0), (rank / filesPerShard).toInt)
    }
    import spark.implicits._
    val shardMap = ranked.toDF(keyCol, "shard_id")
    df.join(shardMap, Seq(keyCol))
  }
}
