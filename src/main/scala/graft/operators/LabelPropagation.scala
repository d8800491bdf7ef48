package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (LPA, Raghavan et al. 2007) — community
  * detection over an undirected graph: every node starts with its own id as
  * label and, each round, adopts the most frequent label among its
  * neighbours (ties broken toward the smaller label; isolated nodes keep
  * their own). Deterministic by construction — the classic async LPA is
  * order-dependent, the synchronous min-tie-break variant here is not, so
  * the whole operator is oracle-checkable as unrolled SQL.
  *
  * This is the third iterative graph operator next to
  * [[ConnectedComponents]] (reachability) and [[PageRank]] (centrality):
  * LPA converges to DENSE communities, not mere connectivity — two cliques
  * joined by one bridge edge are one CC but two LPA communities.
  *
  * Scale shape (same discipline as the other two loops): per round exactly
  * one |E| join (labels onto edge sources, shuffled by node id) and two
  * keyed aggregations — (node, label) vote counts with map-side partial
  * aggregation, then the per-node argmax as a lexicographic struct-min
  * (also map-side combinable; never a per-node window). Labels are
  * localCheckpoint'ed each round so the lineage doesn't stack across
  * iterations. Traffic per round is O(|E| + |V|) longs; nothing is ever
  * collected to the driver.
  */
object LabelPropagation {

  /** @param nodes one column `id`
    * @param edges columns `src`, `dst` — each undirected edge listed ONCE;
    *              both directions are derived here so multiplicities stay
    *              exact (votes are counted, a doubled edge would double its
    *              weight)
    * @return `(id, label)` after `iterations` synchronous rounds
    */
  def run(nodes: DataFrame, edges: DataFrame, iterations: Int): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true) // round-invariant; never recompute the generator
    var labels = nodes.select(col("id"), col("id").as("label"))
    for (_ <- 1 to iterations) {
      val votes = sym
        .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("n"))
      // argmax(label by (n desc, label asc)) as a struct-min: combinable
      val best = votes
        .groupBy(col("id"))
        .agg(min(struct((-col("n")).as("negn"), col("label").as("l"))).as("b"))
        .select(col("id"), col("b.l").as("next_label"))
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("next_label"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    labels
  }
}
