package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact percentiles by DISTRIBUTED RANK SELECTION — the scalable exact
  * formulation.
  *
  * Spark's `percentile()` is an object aggregate: each group accumulates a
  * value→count map that is merged on ONE reducer per group. With a handful
  * of groups over billions of rows that is first a straggler and finally an
  * OOM — exactly the low-cardinality-partition failure mode the 100× scale
  * run exposed for `ntile` (SCALING.md). Here instead:
  *
  *   1. rank every (group, value) pair via the two-pass range-partitioned
  *      prefix count ([[Sharding.cumSumBy]]) — one parallel shuffle, no
  *      per-group state;
  *   2. broadcast the tiny per-group (count, start-rank) aggregate back;
  *   3. keep ONLY the rows at the two bracketing ranks per requested
  *      percentile and interpolate with Spark's own formula
  *      `(1-frac)·lower + frac·higher` (bit-equality with `percentile()`
  *      is pinned by OperatorSpec).
  *
  * Ties in the value column are benign: ranks are unique but tied rows
  * carry equal values, so any tie order selects the same bracketing values.
  */
object RankSelect {

  /** One row per group: `groupCol`, `n`, and one `percentile_cont` column
    * per `(outName, p)` — exact, type-7 interpolation (= Spark
    * `percentile`, DuckDB `quantile_cont`). Nulls in `valueCol` are
    * ignored, matching the aggregate forms. */
  def percentileCont(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val ev = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("_v"))
    val ranked = Sharding.cumSumBy(ev, Seq(groupCol, "_v"), lit(1L), "_rank")
    val groups = ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"), min(col("_rank")).as("_start"))
    val withR = ranked.join(broadcast(groups), Seq(groupCol))
      .withColumn("_r", col("_rank") - col("_start")) // 0-based rank in group
    // per p: pos = p·(n−1); emit the value only at the bracketing ranks
    val picks = ps.flatMap { case (name, p) =>
      val pos = lit(p) * (col("_n") - 1).cast("double")
      Seq(
        when(col("_r") === floor(pos).cast("long"), col("_v")).as(s"_lo_$name"),
        when(col("_r") === ceil(pos).cast("long"), col("_v")).as(s"_hi_$name"))
    }
    val picked = withR
      .select((col(groupCol) +: col("_n") +: picks.map(c => c)): _*)
      .groupBy(col(groupCol))
      .agg(max(col("_n")).as("_n"),
        ps.flatMap { case (name, _) =>
          Seq(max(col(s"_lo_$name")).as(s"_lo_$name"),
            max(col(s"_hi_$name")).as(s"_hi_$name"))
        }: _*)
    val outs = ps.map { case (name, p) =>
      val pos = lit(p) * (col("_n") - 1).cast("double")
      val frac = pos - floor(pos)
      // Spark Percentile.getPercentile: (higherIndex−position)·lower +
      // (position−lowerIndex)·higher — reproduce verbatim for bit equality
      ((lit(1.0) - frac) * col(s"_lo_$name") + frac * col(s"_hi_$name")).as(name)
    }
    picked.select((col(groupCol) +: col("_n").as("n") +: outs): _*)
  }
}
