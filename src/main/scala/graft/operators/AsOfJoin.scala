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
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    // The payload travels as ONE struct (non-null for every right row), so
    // last(_, ignoreNulls) carries the whole most-recent right row
    // atomically — a NULL payload VALUE in the matched row stays NULL, and
    // multiple payload columns can never mix values from different right
    // rows (per-column carry would do both).
    val payloadType = StructType(payload.map(p =>
      StructField(p, right.schema(p).dataType, nullable = true)))
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(Seq(col(key).as("_k"), col("_t"), col("_side")) ++
        leftCols.map(col) :+ lit(null).cast(payloadType).as("_r"): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(Seq(col(key).as("_k"), col("_t"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("_r"): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (Seq(col("_k"), col("_t"), col("_side")) ++ leftCols.map(col) :+
          last(col("_r"), ignoreNulls = true).over(w).as("_rbest")): _*)
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"_rbest.$p").as(s"asof_$p")): _*)
  }

  /** Forward as-of join — for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` on the same key. Mirror image of [[asOf]]:
    * left rows sort BEFORE right rows at equal times (side 0 vs 1), and
    * `first(value, ignoreNulls)` over the (current row, unbounded FOLLOWING)
    * frame picks the next right payload — so "at or after" is inclusive.
    * Same scale contract: one shuffle on the key, no row multiplication.
    * Right-side ties on (key, time) must be pre-deduplicated by the caller.
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    val payloadType = StructType(payload.map(p =>
      StructField(p, right.schema(p).dataType, nullable = true)))
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(0))
      .select(Seq(col(key).as("_k"), col("_t"), col("_side")) ++
        leftCols.map(col) :+ lit(null).cast(payloadType).as("_r"): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(1))
      .select(Seq(col(key).as("_k"), col("_t"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("_r"): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = l.unionByName(r)
      .select(
        (Seq(col("_k"), col("_t"), col("_side")) ++ leftCols.map(col) :+
          first(col("_r"), ignoreNulls = true).over(w).as("_rbest")): _*)
    carried.filter(col("_side") === 0)
      .select(leftCols.map(col) ++ payload.map(p => col(s"_rbest.$p").as(s"asof_$p")): _*)
  }
}
