package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — points joined to every range `[lo, hi]` that
  * contains them. Spark plans the naive `p BETWEEN lo AND hi` as a
  * broadcast-nested-loop (O(points × ranges)); this composition bucketizes
  * both sides on a fixed width so the join is a hash equi-join on bucket id:
  *
  *   - point  → bucket floor(p / W)
  *   - range  → exploded to every bucket it overlaps
  *     (ceil((hi-lo)/W)+1 rows — bounded when range width is bounded)
  *   - equi-join on bucket, then exact `BETWEEN` filter.
  *
  * Shuffle is proportional to rows × (range_width / W), never the cross
  * product. Results are exactly the naive join's (each (point, range) pair
  * meets in exactly one bucket — the point's).
  */
object RangeJoin {

  /** @param points frame with numeric column `pcol`
    * @param ranges frame with numeric columns `lo`, `hi` (inclusive)
    * @param bucketWidth bucket size; pick ≈ typical range width
    */
  def joinRange(
      points: DataFrame,
      pcol: String,
      ranges: DataFrame,
      lo: String,
      hi: String,
      bucketWidth: Double): DataFrame = {
    val p = points.withColumn("_bucket", floor(col(pcol) / bucketWidth).cast("long"))
    val r = ranges.withColumn("_bucket",
      explode(sequence(
        floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    p.join(r, Seq("_bucket"))
      .filter(col(pcol) >= col(lo) && col(pcol) <= col(hi))
      .drop("_bucket")
  }
}
