package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Process-local side-channel for per-query SCALE STATISTICS (round-14
  * verdict task 5; gating + in-plan observation added round 15).
  *
  * Round 13 burned a session discovering that driver-regenerated testdata
  * carried ~7× the near-duplicate mass at sf100 (22.2M surviving pairs vs a
  * far sparser prior corpus) before a "this query got slower" mystery
  * resolved as data-not-code. The dedup lanes now record their candidate
  * and survivor masses here as they run, and Bench folds the snapshot into
  * the per-query record (`"stats"` in BENCH.out / bench/r{N}_per_query
  * .json) — so the next regeneration is adjudicated by diffing two numbers
  * in two JSON files, not by re-deriving candidate-mass arithmetic.
  *
  * GATED (round-15 verdict task 6): recording is OFF by default — Verify
  * and the oracle runs must not pay the side-aggregates (at the fourth
  * decade the embedding-lane candidate agg is a full extra base pass).
  * [[graft.Bench]] calls [[enable]] once after building its session; the
  * `graft.benchStats=true` system property turns it on for ad-hoc runs.
  * When disabled, [[record]] is a no-op and [[observed]] returns its input
  * unchanged — zero plan difference from the driver's Verify session.
  *
  * Two recording paths:
  *   - [[record]]: a synchronized map of query → (key → long), for masses
  *     a query computes anyway (or via a skinny side-aggregate);
  *   - [[observed]]: wraps a plan node in `df.observe(...)` so the mass
  *     rides the query's OWN action at zero extra cost — an
  *     AggregatingAccumulator, no extra job, no second scan. The
  *     [[enable]]-registered QueryExecutionListener harvests the metrics
  *     into the same map when the action completes (the fuzzy-link lane's
  *     candidate/true-pair masses, round-15 verdict task 4).
  *
  * Queries record under their REGISTRY name (the `SparkEntry.queries` key)
  * so the bench record lines up with the timing dict.
  */
object BenchStats {
  @volatile private var on = sys.props.get("graft.benchStats").contains("true")
  def enabled: Boolean = on
  /** Test hook: flip recording without registering a listener. */
  private[graft] def setEnabled(v: Boolean): Unit = on = v

  private val stats =
    scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[String, Long]]

  def record(query: String, key: String, value: Long): Unit = if (on) synchronized {
    stats.getOrElseUpdate(query, scala.collection.mutable.Map.empty)
      .update(key, value)
  }

  /** Accumulating variant: the chunked band lanes run one Spark job per
    * (band, slice) chunk, each carrying a share of the total mass. */
  def add(query: String, key: String, value: Long): Unit = if (on) synchronized {
    val m = stats.getOrElseUpdate(query, scala.collection.mutable.Map.empty)
    m.update(key, m.getOrElse(key, 0L) + value)
  }

  /** In-plan observation: when enabled, attaches `df.observe` with the
    * given named aggregate expressions (each `col.as(key)`), to be
    * harvested by the listener [[enable]] registers. `tag` disambiguates
    * multiple observation points inside ONE query's plan (Spark requires
    * observed-metric names unique per query execution). When disabled,
    * returns `df` untouched — the Verify plan is byte-identical. */
  def observed(df: DataFrame, query: String, tag: String, exprs: (String, Column)*): DataFrame =
    if (!on) df
    else df.observe(s"graft_stats/$query/$tag",
      exprs.head._2.as(exprs.head._1),
      exprs.tail.map { case (k, c) => c.as(k) }: _*)

  /** Like [[observed]] but the harvested values ACCUMULATE across actions
    * (for per-chunk jobs whose masses sum to the lane total — the vector
    * dedup lanes' candidate/survivor counts, one observation per band/slice
    * job, each riding the chunk's own parquet write). */
  def observedSum(df: DataFrame, query: String, tag: String, exprs: (String, Column)*): DataFrame =
    if (!on) df
    else df.observe(s"graft_statsum/$query/$tag",
      exprs.head._2.as(exprs.head._1),
      exprs.tail.map { case (k, c) => c.as(k) }: _*)

  // sessions that already carry the harvesting listener: enable() must be
  // idempotent IN EFFECT, not just in intent — a second registration on the
  // same session would double-harvest every observedSum metric and silently
  // double the candidate/survivor masses (round-16 advice). Identity map:
  // two sessions are "the same" iff they share the listener manager.
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean])

  /** Turn recording on and register the metric-harvesting listener — at most
    * one listener per session, however many times this is called. */
  def enable(spark: SparkSession): Unit = {
    on = true
    if (registered.add(spark))
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          val sum = name.startsWith("graft_statsum/")
          if (sum || name.startsWith("graft_stats/")) {
            val query = name.dropWhile(_ != '/').drop(1).takeWhile(_ != '/')
            row.schema.fieldNames.zipWithIndex.foreach { case (k, i) =>
              if (!row.isNullAt(i)) row.get(i) match {
                case l: Long => if (sum) add(query, k, l) else record(query, k, l)
                case n: Number =>
                  if (sum) add(query, k, n.longValue()) else record(query, k, n.longValue())
                case _ => ()
              }
            }
          }
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    })
  }

  /** Immutable snapshot, queries and keys in insertion-independent sorted
    * order (the bench record must be byte-stable across runs of the same
    * data). */
  def snapshot: Seq[(String, Seq[(String, Long)])] = synchronized {
    stats.toSeq.sortBy(_._1).map { case (q, m) => q -> m.toSeq.sortBy(_._1) }
  }
}
