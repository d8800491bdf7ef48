package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a similarity-pair graph — the step that turns
  * near-duplicate PAIRS (minhash/simhash/jaccard candidates) into duplicate
  * CLUSTERS with one canonical representative (min id) per cluster.
  *
  * Algorithm: iterative min-label propagation (each node adopts the smallest
  * component id among itself and its neighbors) until fixpoint. Converges in
  * O(graph diameter) rounds; near-dup graphs are unions of small cliques, so
  * 3–5 rounds in practice. Each round is one shuffle (join + min-aggregate);
  * intermediate labels are persisted and the previous round unpersisted, so
  * peak storage is 2× the label table — this is the standard scalable
  * formulation (large-scale variants swap in large-star/small-star for
  * pathological diameters).
  */
object ConnectedComponents {

  /** @param nodes single column `id`
    * @param edges columns `src`, `dst` (undirected; direction ignored)
    * @return (id, comp) — comp is the min id in the node's component
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    sym.count() // materialize once; reused every round
    var cached = nodes.select(col("id")).distinct().withColumn("comp", col("id")).persist()
    var labels = cached
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      // Fold the convergence check into the label-update aggregate: each id
      // occurs exactly once in `labels`, so min(prev) recovers its old label
      // (neighbor rows vote with prev = null). ONE job per round: the agg
      // materializes the persisted next-labels AND yields the changed count.
      val neigh = sym
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src").as("id"), col("comp"), lit(null).cast(labels.schema("comp").dataType).as("prev"))
      val next = labels.select(col("id"), col("comp"), col("comp").as("prev"))
        .unionAll(neigh)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"), min(col("prev")).as("prev"))
        .persist()
      val changed = next
        .agg(max(when(col("comp") =!= col("prev"), 1).otherwise(0)))
        .head.getInt(0) > 0
      cached.unpersist()
      cached = next
      labels = next.select(col("id"), col("comp"))
      converged = !changed
      i += 1
    }
    sym.unpersist()
    labels
  }
}
