package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not dominated by any other row,
  * where `q` dominates `p` iff `q.x <= p.x` AND `q.y >= p.y` with at least
  * one strict (minimize x, maximize y; flip signs for other orientations).
  * Ties — rows with identical (x, y) — dominate neither and all survive.
  *
  * The naive formulation is a quadratic NOT EXISTS self-join (it remains the
  * DuckDB oracle for the verification query). The distributed formulation
  * rests on a per-x reduction: a row survives iff
  *
  *   y == B(x)   where B(x)  = max y among rows with the same x, and
  *   y >  A(x)   where A(x)  = max y among rows with STRICTLY smaller x.
  *
  * B is one hash aggregation on x; A is a prefix max over the (distinct-x)
  * reduced table; the verdict joins back on x. Every step shuffles on keys —
  * no pairwise candidate generation, no single-partition stage.
  */
object Skyline {

  /** Per-group skyline (minimize `x`, maximize `y`; `y` must cast to long).
    * A(x) comes from a rows-frame window over the DISTINCT (group, x) table
    * — one row per distinct x per group, so `rowsBetween(…, -1)` is exactly
    * "strictly smaller x" and the window partition is a group's distinct-x
    * count, never its row count. */
  def groupedSkyline(df: DataFrame, groupCols: Seq[String], x: String, y: String): DataFrame = {
    val keys = groupCols :+ x
    val b = Iterator.iterate("_sk_b")(_ + "_").dropWhile(df.columns.contains).next()
    val a = Iterator.iterate("_sk_a")(_ + "_").dropWhile(df.columns.contains).next()
    val perX = df.groupBy(keys.map(col): _*).agg(max(col(y).cast("long")).as(b))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(x))
      .rowsBetween(Window.unboundedPreceding, -1)
    val verdict = perX.withColumn(a, max(col(b)).over(w))
    df.join(verdict, keys)
      .filter(col(y).cast("long") === col(b) &&
        (col(a).isNull || col(y).cast("long") > col(a)))
      .drop(b, a)
  }

  /** Global skyline: same per-x reduction, but A comes from the two-pass
    * distributed prefix max ([[Sharding.cumMaxBy]]) instead of a window — no
    * single-partition stage even with one global frontier. `Long.MinValue`
    * marks "no strictly-smaller x exists" (first x survives by definition).
    */
  def globalSkyline(df: DataFrame, x: String, y: String): DataFrame = {
    val b = Iterator.iterate("_sk_b")(_ + "_").dropWhile(df.columns.contains).next()
    val a = Iterator.iterate("_sk_a")(_ + "_").dropWhile(df.columns.contains).next()
    val perX = df.groupBy(col(x)).agg(max(col(y).cast("long")).as(b))
    val verdict = Sharding.cumMaxBy(perX, Seq(x), col(b), a)
    df.join(verdict, Seq(x))
      .filter(col(y).cast("long") === col(b) &&
        (col(a) === Long.MinValue || col(y).cast("long") > col(a)))
      .drop(b, a)
  }
}
