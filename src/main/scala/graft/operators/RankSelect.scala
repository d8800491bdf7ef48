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

  /** Hard ceiling on `groupCol` cardinality (see [[valueAtRanks]]): the
    * driver holds one stats row per group (pass 0) and up to groups×buckets
    * histogram rows (pass 1) — 4096 groups × 1024 buckets ≈ 4M count rows,
    * comfortably bounded; past it the caller is in the many-groups regime
    * where a plain aggregate parallelizes fine and this operator's driver
    * state would grow without bound. */
  val MaxGroups = 4096

  /** One row per group: `groupCol`, `n`, and one `percentile_cont` column
    * per `(outName, p)` — exact, type-7 interpolation (= Spark
    * `percentile`, DuckDB `quantile_cont`). Nulls in `valueCol` are
    * ignored, matching the aggregate forms.
    *
    * CONTRACT (inherited from [[valueAtRanks]], enforced by [[MaxGroups]]):
    * `groupCol` must be LOW-CARDINALITY. This form collect()s one row per
    * group plus up to groups×buckets histogram rows to the driver — it
    * exists for the few-huge-groups straggler regime where `percentile()`
    * funnels each group through one reducer. A high-cardinality `groupCol`
    * fails loudly (it would be better served by a plain sort-based
    * aggregate anyway: many groups already parallelize). The input must
    * also be DETERMINISTIC (see [[valueAtRanks]]).
    *
    * Round 12: rides [[valueAtRanks]] — each percentile needs only the
    * TWO values bracketing `p·(n−1)`, so this is selection, not ranking:
    * the previous form still range-SORTED every row (`cumSumBy`) to read
    * 2·|ps| positions back. Now nothing corpus-sized is shuffled (same
    * rewrite as `window_ntile`, measured there 47.4 → 28.6 s at sf100).
    * Interpolation reproduces Spark Percentile.getPercentile verbatim —
    * `(1−frac)·lower + frac·higher` — so bit equality with `percentile()`
    * still holds (OperatorSpec pins it). */
  def percentileCont(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    // pre-filtered nulls: every rank below is over non-null values only
    // (an all-null group vanishes, matching the aggregate forms)
    val ev = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("_v"))
    val (vals, stats) = valueAtRanksWithStats(
      ev, groupCol, "_v",
      (n, _) => ps.flatMap { case (name, p) =>
        val pos = p * (n - 1) // 0-based; ranks below are 1-based
        Seq((s"_lo_$name", math.floor(pos).toLong + 1),
          (s"_hi_$name", math.ceil(pos).toLong + 1))
      })
    val aggCols = ps.flatMap { case (name, _) => Seq(
      max(when(col("label") === s"_lo_$name", col("value"))).as(s"_lo_$name"),
      max(when(col("label") === s"_hi_$name", col("value"))).as(s"_hi_$name")) }
    val wide = vals.groupBy(col(groupCol)).agg(aggCols.head, aggCols.tail: _*)
    // n per group is pass-0 knowledge — a tiny driver-built frame
    val gType = df.schema(groupCol).dataType
    val nDf = spark.createDataFrame(
      stats.map { case (g, n, _) => Row(g, n) }.asJava,
      StructType(Seq(StructField(groupCol, gType), StructField("_n", LongType))))
    val outs = ps.map { case (name, p) =>
      val pos = lit(p) * (col("_n") - 1).cast("double")
      val frac = pos - floor(pos)
      // Spark Percentile.getPercentile: (higherIndex−position)·lower +
      // (position−lowerIndex)·higher — reproduce verbatim for bit equality
      ((lit(1.0) - frac) * col(s"_lo_$name") + frac * col(s"_hi_$name")).as(name)
    }
    wide.join(broadcast(nDf), Seq(groupCol))
      .select((col(groupCol) +: col("_n").as("n") +: outs): _*)
  }

  /** Exact VALUE AT GLOBAL RANK per group — with NO corpus sort at all.
    *
    * [[percentileCont]] (and the ntile composition before round 12) still
    * pay one full range-partitioned SORT of every row
    * ([[Sharding.cumSumBy]]) even though only a handful of rank positions
    * are ever read back; at the third decade that sort IS the query
    * (window_ntile: ~47 s of its 47 s at sf100, SCALING.md). This is the
    * classic distributed SELECTION answer — find the value at rank k by
    * histogram probing:
    *
    *   pass 0  per-group n / null count / min / max          (tiny agg)
    *   pass 1  per-(group, equi-width bucket) counts — partials combine
    *           map-side, so the exchange carries ≤ groups·buckets rows,
    *           NEVER corpus rows; the driver walks the cumulative counts
    *           to locate the bucket holding each requested rank
    *   pass 2  rows of the ≤|ranks| hit buckets only (~n/buckets each)
    *           get a bucket-local row_number; the row at the residual
    *           offset is the answer
    *
    * Rank semantics: 1-based over value ASC NULLS FIRST; a rank inside the
    * null prefix resolves to a NULL value. Ties are benign — any tie order
    * yields the same value at a rank. Contracts:
    *   - `groupCol` must be LOW-CARDINALITY (this exists for the
    *     few-huge-groups straggler regime; the driver holds ≤
    *     groups·buckets count rows — the same bounded-collect class as
    *     kmeans' K=64 centroids) with equality-well-defined atomic values.
    *     ENFORCED: more than [[MaxGroups]] groups raises
    *     IllegalArgumentException instead of silently OOMing the driver
    *     (pass 0 probes through a limit, so the overflow itself is cheap).
    *   - values must be NaN-free (equi-width bucketing has no NaN bucket).
    *     ±Infinity IS handled: a group whose min or max is infinite cannot
    *     be equi-width bucketed ((v−lo)/(hi−lo) degenerates), so it is
    *     routed to a SINGLE bucket explicitly — pass 2 degrades to that
    *     group's full in-bucket sort, correct at any rank (spec-pinned).
    *   - the input plan must be DETERMINISTIC: passes 1 and 2 re-execute
    *     the same lazy plan, and a nondeterministic source (rand(),
    *     unstable sampling) can make the probed bucket contents disagree
    *     with the histogram — surfacing as IllegalStateException at best,
    *     a wrong value at worst. Persist such inputs before calling.
    * Adversarial mass on one point inside a bucket degrades pass 2 to
    * that bucket's size; the all-equal case short-circuits on the driver,
    * and the general escape (recursive refinement) is documented, not
    * needed at any benched scale.
    *
    * @param ranksOf needed ranks per group as (label, rank) pairs, given
    *                the group's total row count n (nulls INCLUDED) and its
    *                null count
    * @return (groupCol, label, value) — one row per requested (group, label)
    */
  def valueAtRanks(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ranksOf: (Long, Long) => Seq[(String, Long)],
      buckets: Int = 1024): DataFrame =
    valueAtRanksWithStats(df, groupCol, valueCol, ranksOf, buckets)._1

  /** [[valueAtRanks]] plus the pass-0 per-group stats it collected anyway —
    * (group, n, nNull) — so a caller that also needs group counts (the
    * ntile composition derives every quartile size from n) does not pay a
    * FOURTH corpus scan to re-aggregate them. */
  def valueAtRanksWithStats(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ranksOf: (Long, Long) => Seq[(String, Long)],
      buckets: Int = 1024): (DataFrame, Seq[(Any, Long, Long)]) = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}
    val spark = df.sparkSession
    val gType = df.schema(groupCol).dataType
    val ev = df.select(col(groupCol).as("_g"), col(valueCol).cast("double").as("_v"))
    val outSchema = StructType(Seq(StructField("_g", gType),
      StructField("label", StringType, nullable = false),
      StructField("value", DoubleType)))
    def finish(res: DataFrame): DataFrame =
      res.select(col("_g").as(groupCol), col("label"), col("value"))

    // pass 0: one row per group — the low-cardinality contract, ENFORCED:
    // the collect goes through limit(MaxGroups+1), so a high-cardinality
    // group column costs one truncated fetch and a clear error, never an
    // unbounded driver materialization
    val stats = ev.groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"), count(col("_v")).as("_nv"),
        min(col("_v")).as("_lo"), max(col("_v")).as("_hi"))
      .limit(MaxGroups + 1)
      .collect()
    require(stats.length <= MaxGroups,
      s"valueAtRanks: '$groupCol' exceeds $MaxGroups groups — this operator " +
        "serves the few-huge-groups regime (driver holds one stats row per " +
        "group plus up to groups*buckets histogram rows); a high-cardinality " +
        "grouping already parallelizes under a plain sort/percentile aggregate")
    val statsOut: Seq[(Any, Long, Long)] =
      stats.toSeq.map(r => (r.get(0), r.getLong(1), r.getLong(1) - r.getLong(2)))

    // driver: answer what needs no probing; queue the rest
    val direct = scala.collection.mutable.ArrayBuffer.empty[Row]
    val pending = scala.collection.mutable.ArrayBuffer
      .empty[(Any, Double, Double, Long, String)] // (g, lo, hi, nonNullRank, label)
    stats.foreach { r =>
      val (g, n, nv) = (r.get(0), r.getLong(1), r.getLong(2))
      val nNull = n - nv
      ranksOf(n, nNull).foreach { case (label, rank) =>
        require(rank >= 1 && rank <= n, s"rank $rank outside [1, $n] for group $g")
        val rNN = rank - nNull
        if (rNN <= 0) direct += Row(g, label, null)               // null prefix
        else {
          val (lo, hi) = (r.getDouble(3), r.getDouble(4))         // nv > 0 here
          if (rNN == 1) direct += Row(g, label, lo)               // group min
          else if (rNN == nv) direct += Row(g, label, hi)         // group max
          else if (lo == hi) direct += Row(g, label, lo)          // all equal
          else pending += ((g, lo, hi, rNN, label))
        }
      }
    }
    val directDf = spark.createDataFrame(direct.asJava, outSchema)
    if (pending.isEmpty) return (finish(directDf), statsOut)

    // pass 1: per-group equi-width histogram over [lo, hi]
    val boundsDf = spark.createDataFrame(
      pending.map(p => (p._1, p._2, p._3)).distinct.map(t => Row(t._1, t._2, t._3)).asJava,
      StructType(Seq(StructField("_bg", gType), StructField("_blo", DoubleType),
        StructField("_bhi", DoubleType))))
    // null-safe join keys throughout: a NULL group key is a legal group
    // An infinite lo/hi (or a span overflowing to +Inf) makes the
    // equi-width ratio NaN/degenerate — route those groups to ONE bucket
    // explicitly: pass 2 degrades to the group's full in-bucket sort,
    // correct at any rank, instead of leaning on floor(NaN)→0 casts
    val span = col("_bhi") - col("_blo")
    val bucketed = ev.filter(col("_v").isNotNull)
      .join(broadcast(boundsDf), col("_g") <=> col("_bg")) // groups with no probe drop out
      .withColumn("_b",
        when(span >= lit(Double.PositiveInfinity), lit(0))
          .otherwise(least(floor((col("_v") - col("_blo")) /
            span * buckets), lit(buckets - 1)).cast("int")))
      .select(col("_g"), col("_b"), col("_v"))
    val hist = bucketed.groupBy(col("_g"), col("_b")).agg(count(lit(1)).as("_c")).collect()

    // driver: cumulative bucket counts → (bucket, in-bucket offset) per rank
    val byG = hist.groupBy(_.get(0))
    val probes = pending.map { case (g, _, _, rNN, label) =>
      val bs = byG(g).map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
      var cum = 0L
      var hit: Option[(Int, Long)] = None
      for ((b, c) <- bs if hit.isEmpty) {
        if (rNN <= cum + c) hit = Some((b, rNN - cum))
        cum += c
      }
      val (b, off) = hit.getOrElse(
        throw new IllegalStateException(s"rank $rNN beyond histogram mass $cum for group $g"))
      Row(g, b, off, label)
    }
    val probeDf = spark.createDataFrame(probes.asJava,
      StructType(Seq(StructField("_pg", gType), StructField("_pb", IntegerType),
        StructField("_off", LongType), StructField("label", StringType))))

    // pass 2: only hit buckets survive; a bucket-local row_number picks the
    // row at the offset (ties: equal values, any order picks the same one)
    val hitBuckets = probeDf.select(col("_pg").as("_hg"), col("_pb").as("_hb")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g"), col("_b")).orderBy(col("_v"))
    val probedVals = bucketed
      .join(broadcast(hitBuckets), col("_g") <=> col("_hg") && col("_b") === col("_hb"))
      .withColumn("_rn", row_number().over(w).cast("long"))
      .join(broadcast(probeDf),
        col("_g") <=> col("_pg") && col("_b") === col("_pb") && col("_rn") === col("_off"))
      .select(col("_g"), col("label"), col("_v").as("value"))
    (finish(directDf.unionByName(probedVals)), statsOut)
  }
}
