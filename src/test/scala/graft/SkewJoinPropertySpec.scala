package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized property for the salting operators: on arbitrary inputs —
  * including hot keys, duplicate rows (which share a content salt), keys
  * missing from either side, and NULL values in the aggregate — the salted
  * join must equal the plain join as a MULTISET and the salted two-phase
  * aggregate must equal the plain groupBy exactly.
  */
class SkewJoinPropertySpec extends SparkSpec {

  private val gen = for {
    nb <- Gen.chooseNum(0, 60)
    ns <- Gen.chooseNum(0, 10)
    big <- Gen.listOfN(nb, for {
      k <- Gen.frequency(5 -> Gen.const(1L), 2 -> Gen.chooseNum(2L, 6L)) // hot key 1
      v <- Gen.chooseNum(0, 9)
    } yield (k, v.toLong))
    small <- Gen.listOfN(ns, for {
      k <- Gen.chooseNum(0L, 6L); p <- Gen.chooseNum(100, 999)
    } yield (k, p.toLong))
  } yield (big, small)

  test("salted join == plain join (multiset), salted agg == plain agg, random hot-key inputs") {
    import spark.implicits._
    (0 until 10).foreach { seed =>
      gen.apply(Gen.Parameters.default, Seed(seed.toLong)).foreach { case (big, small) =>
        val b = big.toDF("k", "v").repartition(7)
        val sm = small.toDF("k", "p").repartition(2)

        val saltedJ = graft.operators.SkewJoin.saltedJoin(b, sm, "k", factor = 4)
          .select("k", "v", "p").collect().map(_.toSeq).toSeq
        val plainJ = b.join(sm, Seq("k")).select("k", "v", "p")
          .collect().map(_.toSeq).toSeq
        assert(saltedJ.groupBy(identity).view.mapValues(_.size).toMap ==
          plainJ.groupBy(identity).view.mapValues(_.size).toMap,
          s"seed $seed: salted join multiset diverges")

        val saltedA = graft.operators.SkewJoin.saltedCountSum(b, "k", "v", factor = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
        val plainA = b.groupBy(col("k"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_value"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
        assert(saltedA == plainA, s"seed $seed: salted agg diverges")
      }
    }
  }
}
