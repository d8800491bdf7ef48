package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting via the degree-ordered orientation
  * (Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
  * Reducer", WWW'11): orient every undirected edge from its lower-(degree,
  * id) endpoint to the higher one. The orientation is acyclic (it follows a
  * total order), so each triangle contains exactly one directed 2-path
  * src→mid→dst closed by the edge src→dst — counting closed wedges counts
  * each triangle once.
  *
  * Why this shape at 100 TB: the naive wedge join explodes on hubs (a
  * degree-d vertex contributes d² wedges), and real co-occurrence graphs
  * are power-law. Under the degree orientation every OUT-degree is O(√m),
  * so the wedge join is bounded by m^1.5 regardless of skew — the classic
  * curse-of-the-last-reducer fix. All joins are hash joins on vertex ids;
  * no driver-side state.
  */
object Triangles {

  /** Orient `edges` (columns `u`, `v`; one row per undirected edge, u ≠ v,
    * no duplicates in either direction) from lower to higher (degree, id).
    * Output columns: `src`, `dst`.
    *
    * `boundedGraph = true` asserts the CALLER knows |E| is bounded at any
    * data scale (e.g. a hub-capped co-occurrence graph, where edges ≤
    * #cells × C(cap, 2) no matter how large the input) — the degree table
    * then broadcasts instead of shuffling. Leave false for graphs that
    * grow with the data. */
  def orient(edges: DataFrame, boundedGraph: Boolean = false): DataFrame = {
    val hint: DataFrame => DataFrame = if (boundedGraph) broadcast else identity
    val deg = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    edges
      .join(hint(deg.select(col("node").as("u"), col("d").as("du"))), Seq("u"))
      .join(hint(deg.select(col("node").as("v"), col("d").as("dv"))), Seq("v"))
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** One row, one column `n_triangles`. */
  def countDf(edges: DataFrame, boundedGraph: Boolean = false): DataFrame = {
    val hint: DataFrame => DataFrame = if (boundedGraph) broadcast else identity
    val oriented = orient(edges, boundedGraph)
    val wedges = oriented.select(col("src").as("a"), col("dst").as("b"))
      .join(hint(oriented.select(col("src").as("b"), col("dst").as("c"))), Seq("b"))
    wedges
      .join(hint(oriented.select(col("src").as("a"), col("dst").as("c"))),
        Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
