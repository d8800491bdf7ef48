package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * For a join where a handful of hot keys dominate (the classic 100 TB
  * failure mode: one key → one straggler task), salt the skewed (large) side
  * with `salt = hash(row) % factor` and explode the build side `factor`
  * times, joining on `(key, salt)`. Results are identical to the plain join;
  * the hot key's rows spread over `factor` tasks.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) covers sort-merge joins automatically; explicit salting remains
  * the tool for aggregations and for engines/plans AQE can't split.
  */
object SkewJoin {

  /** Content-derived salt: deterministic (stable under AQE re-planning and
    * task retries, unlike `monotonically_increasing_id` whose value depends
    * on partition layout) and uniform as long as rows vary in ANY column.
    * Fully identical rows share a salt — they are indistinguishable anyway,
    * so no correctness impact, only residual skew for pathological
    * all-duplicate inputs. */
  private def contentSalt(df: DataFrame, factor: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(factor))

  /** Salted inner equi-join of `big` (skewed) with `small` on `key`.
    * `small` is replicated `factor`× via explode — keep it the smaller side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    val salted = big.withColumn("_salt", contentSalt(big, factor))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted aggregation: two-phase groupBy for skewed group keys —
    * partial aggregate on (key, salt), then final aggregate on key.
    * `partial` must be decomposable (sum/count/min/max). */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, factor: Int): DataFrame = {
    val salted = df.withColumn("_salt", contentSalt(df, factor))
    salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum_value"))
  }
}
