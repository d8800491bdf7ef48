package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized property for all three AsOfJoin variants against a
  * driver-side reference of the exact contract: backward = latest right at
  * or before, forward = earliest right at or after, nearest = closest with
  * backward winning distance ties. Times are drawn from a DENSE range so
  * exact-time matches and equal-distance ties occur constantly — the cases
  * where the union-window composition's side-numbering and tie rules could
  * silently drift from the contract.
  */
class AsOfPropertySpec extends SparkSpec {

  test("backward/forward/nearest match the reference on random dense-tie inputs") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.chooseNum(0, 30)
      nr <- Gen.chooseNum(0, 15)
      ls <- Gen.listOfN(nl, for {
        k <- Gen.chooseNum(1L, 3L); t <- Gen.chooseNum(0L, 15L)
      } yield (k, t))
      rs <- Gen.listOfN(nr, for {
        k <- Gen.chooseNum(1L, 3L); rt <- Gen.chooseNum(0L, 15L)
      } yield (k, rt))
    } yield (ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      rs.distinct) // unique (key, rt): the caller-side dedup contract

    (0 until 10).foreach { seed =>
      gen.apply(Gen.Parameters.default, Seed(seed.toLong)).foreach { case (ls, rs) =>
        val left = ls.toDF("id", "k", "t").repartition(5)
        val right = rs.map { case (k, rt) => (k, rt, rt * 1000 + k) }
          .toDF("k", "rt", "pv").repartition(3)

        def run(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
          df.collect().map(r => r.getAs[Long]("id") ->
            (if (r.isNullAt(r.fieldIndex("asof_pv"))) None else Some(r.getAs[Long]("asof_pv"))))
            .toMap

        val back = run(graft.operators.AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("pv")))
        val fwd = run(graft.operators.AsOfJoin.asOfForward(left, right, "k", "t", "rt", Seq("pv")))
        val near = run(graft.operators.AsOfJoin.asOfNearest(left, right, "k", "t", "rt", Seq("pv")))

        ls.foreach { case (id, k, lt) =>
          val cands = rs.filter(_._1 == k)
          val b = cands.filter(_._2 <= lt).sortBy(_._2).lastOption
          val f = cands.filter(_._2 >= lt).sortBy(_._2).headOption
          val n = (b, f) match {
            case (Some(x), Some(y)) =>
              if ((lt - x._2) <= (y._2 - lt)) Some(x) else Some(y) // backward wins ties
            case (x, y) => x.orElse(y)
          }
          def pv(o: Option[(Long, Long)]) = o.map { case (rk, rt) => rt * 1000 + rk }
          assert(back(id) == pv(b), s"seed $seed backward id=$id: ${back(id)} != ${pv(b)}")
          assert(fwd(id) == pv(f), s"seed $seed forward id=$id: ${fwd(id)} != ${pv(f)}")
          assert(near(id) == pv(n), s"seed $seed nearest id=$id: ${near(id)} != ${pv(n)}")
        }
      }
    }
  }
}
