package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `rightTime <= leftTime` on the same key. Spark has no native operator;
  * the naive range-join explodes. This is the scalable composition:
  *
  *   1. tag and union both sides on (key, time);
  *   2. one window over (key) ordered by (time, side) — right rows sort
  *      before left rows at equal times, so "at or before" is inclusive;
  *   3. `last(value, ignoreNulls)` carries the latest right payload forward;
  *   4. keep only left rows.
  *
  * ONE shuffle on the key, no row multiplication, state = one window frame —
  * this is how the 100 TB version must look. Right-side ties on
  * (key, time) must be pre-deduplicated by the caller for determinism.
  */
object AsOfJoin {

  /** @param left      left frame
    * @param right     right frame
    * @param key       join-key column name present in both
    * @param leftTime  left ordering column (numeric/long, e.g. epoch µs)
    * @param rightTime right ordering column (same unit)
    * @param payload   right-side columns to carry (everything else dropped)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(Seq(col(key).as("_k"), col("_t"), col("_side")) ++
        leftCols.map(col) ++ payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_r_$p")): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(Seq(col(key).as("_k"), col("_t"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"_r_$p")): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (Seq(col("_k"), col("_t"), col("_side")) ++ leftCols.map(col) ++
          payload.map(p => last(col(s"_r_$p"), ignoreNulls = true).over(w).as(s"asof_$p"))): _*)
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"asof_$p")): _*)
  }
}
