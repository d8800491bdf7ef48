package graft.core

/** Process-local side-channel for per-query SCALE STATISTICS (round-14
  * verdict task 5).
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
  * Deliberately dumb: a synchronized map of query → (key → long). Queries
  * record under their REGISTRY name (the `SparkEntry.queries` key) so the
  * bench record lines up with the timing dict. Recording is unconditional —
  * the counts ride scans/aggregates the queries already pay for or skinny
  * side-aggregates measured in SCALING.md round 14 — and Verify simply
  * never reads the snapshot.
  */
object BenchStats {
  private val stats =
    scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[String, Long]]

  def record(query: String, key: String, value: Long): Unit = synchronized {
    stats.getOrElseUpdate(query, scala.collection.mutable.Map.empty)
      .update(key, value)
  }

  /** Immutable snapshot, queries and keys in insertion-independent sorted
    * order (the bench record must be byte-stable across runs of the same
    * data). */
  def snapshot: Seq[(String, Seq[(String, Long)])] = synchronized {
    stats.toSeq.sortBy(_._1).map { case (q, m) => q -> m.toSeq.sortBy(_._1) }
  }
}
