package graft

import org.apache.spark.sql.functions._
import graft.operators.RankSelect

/** Pins the round-13 hardening of the distributed rank-selection operator:
  * the LOW-CARDINALITY contract fails loudly instead of OOMing the driver,
  * and groups with infinite min/max route to the explicit single-bucket
  * path (full in-bucket sort) rather than relying on floor(NaN)→0 casts.
  */
class RankSelectSpec extends SparkSpec {

  test("high-cardinality group column raises a clear error, not driver OOM") {
    val df = spark.range(RankSelect.MaxGroups + 10)
      .select(col("id").as("g"), (col("id") % 7).cast("double").as("v"))
    val e = intercept[IllegalArgumentException] {
      RankSelect.valueAtRanks(df, "g", "v", (_, _) => Seq(("r1", 1L)))
    }
    assert(e.getMessage.contains(s"exceeds ${RankSelect.MaxGroups} groups"))
  }

  test("±Infinity bounds degrade to the single-bucket path, every rank exact") {
    val s = spark
    import s.implicits._
    // group "inf" spans (-Inf, +Inf): span = +Inf → one bucket, full sort;
    // group "neg" has only an infinite LOWER bound; "fin" is the control
    val rows =
      Seq("inf" -> Double.NegativeInfinity, "inf" -> 1.0, "inf" -> 2.0,
          "inf" -> 5.0, "inf" -> Double.PositiveInfinity,
          "neg" -> Double.NegativeInfinity, "neg" -> 1.0, "neg" -> 2.0, "neg" -> 3.0,
          "fin" -> 10.0, "fin" -> 20.0, "fin" -> 30.0)
    val df = rows.toDF("g", "v").repartition(4)
    val out = RankSelect
      .valueAtRanks(df, "g", "v", (n, _) => (1L to n).map(r => (s"r$r", r)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet
    val expect = rows.groupBy(_._1).flatMap { case (g, vs) =>
      vs.map(_._2).sorted.zipWithIndex.map { case (v, i) => (g, s"r${i + 1}", v) }
    }.toSet
    assert(out == expect)
  }

  test("percentileCont stays bit-equal to native percentile() under ±Infinity") {
    val s = spark
    import s.implicits._
    val df = Seq("a" -> Double.NegativeInfinity, "a" -> 1.0, "a" -> 2.0,
        "a" -> 5.0, "a" -> Double.PositiveInfinity,
        "b" -> 4.0, "b" -> 8.0)
      .toDF("g", "v").repartition(3)
    val ps = Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75))
    val ours = RankSelect.percentileCont(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val native = df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(0.25)).as("p25"),
        percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.75)).as("p75"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(ours.keySet == native.keySet)
    // bit equality, including any ±Inf the interpolation propagates
    ours.foreach { case (g, (a, b, c)) =>
      val (na, nb, nc) = native(g)
      assert(java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(na), s"$g p25")
      assert(java.lang.Double.doubleToLongBits(b) == java.lang.Double.doubleToLongBits(nb), s"$g p50")
      assert(java.lang.Double.doubleToLongBits(c) == java.lang.Double.doubleToLongBits(nc), s"$g p75")
    }
  }
}
