package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** `train_logreg_quality` — distributed fixed-point logistic-regression
  * training (TextOps.trainLogregQuality). Pins (a) the BIT-EXACT training
  * trajectory: integer GD has one correct answer, so any engine/codegen
  * change that perturbs a single division truncation fails loudly; (b) the
  * distributed-GD plan contract: weights move by broadcast only — the
  * corpus is never shuffled into a join.
  */
class TrainLogRegSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.01"

  private def run(): DataFrame =
    SparkEntry.queries("train_logreg_quality")(spark, Sf)

  test("bit-exact 3-round trajectory at sf0.01 (matches the integer-GD reference trace)") {
    val rows = run().orderBy("iter").collect().map { r =>
      (r.getAs[Long]("iter"), r.getAs[Long]("w0"), r.getAs[Long]("w1"),
        r.getAs[Long]("w2"), r.getAs[Long]("w3"), r.getAs[Long]("sse"),
        r.getAs[Long]("n_correct"))
    }
    assert(rows.length == 3)
    // Reference trace: independently computed integer GD (truncate-toward-
    // zero division, hard-sigmoid link, lr = 1/5) over the sf0.01 corpus.
    assert(rows(0) == ((1L, 2400L, 239400L, 215800L, 144800L, 125000000L, 244L)), s"iter1: ${rows(0)}")
    assert(rows(1) == ((2L, 7697L, 294192L, 265225L, 162470L, 34588142L, 485L)), s"iter2: ${rows(1)}")
    assert(rows(2) == ((3L, 13150L, 331419L, 298725L, 171736L, 28660287L, 485L)), s"iter3: ${rows(2)}")
    // The numbers above encode the training CLAIM too: squared loss falls
    // monotonically (125.0M -> 34.6M -> 28.7M) and accuracy reaches 97%
    // (485/500) — the model actually learns, it does not just terminate.
  }

  test("held-out eval: the even-trained model generalizes to the odd split") {
    val r = SparkEntry.queries("train_logreg_eval")(spark, Sf).collect()(0)
    val got = Seq("n_eval", "tp", "fp", "tn", "fn", "precision_ppm", "recall_ppm")
      .map(c => r.getAs[Long](c))
    // 250 held-out docs the model never saw: 238 correct (95.2%),
    // precision 129/131, recall 129/139 — integer-exact reference trace.
    assert(got == Seq(250L, 129L, 2L, 109L, 10L, 984732L, 928057L), s"got $got")
  }

  test("warm-start increment: one O(batch) round on unseen day-2 continues the day-1 model") {
    val rows = SparkEntry.queries("train_logreg_incremental")(spark, Sf)
      .orderBy("iter").collect().map { r =>
        (r.getAs[Long]("iter"), r.getAs[Long]("w0"), r.getAs[Long]("w1"),
          r.getAs[Long]("w2"), r.getAs[Long]("w3"), r.getAs[Long]("sse"),
          r.getAs[Long]("n_correct"))
      }
    // Reference trace: 2 rounds on the 250-doc day-1 half, then ONE round
    // on the 125-doc day-2 quarter seeded with the stored weights. The
    // warm-start round opens at 122/125 (97.6%) on data the model never
    // saw — the store transfers; sse keeps falling across the seam.
    assert(rows.length == 3)
    assert(rows(0) == ((1L, 2400L, 237200L, 212000L, 138000L, 62500000L, 122L)), s"iter1: ${rows(0)}")
    assert(rows(1) == ((2L, 7664L, 295044L, 263382L, 157189L, 17990418L, 244L)), s"iter2: ${rows(1)}")
    assert(rows(2) == ((3L, 10364L, 330780L, 296935L, 163427L, 6126164L, 122L)), s"iter3: ${rows(2)}")
  }

  test("gradient pass: literal-folded weights, no join, one 7-long exchange") {
    val g = queries.TextOps.logregGradient(
      queries.TextOps.logregFeatures(spark, Sf), Array(0L, 0L, 0L, 0L))
    g.collect()
    def all(p: SparkPlan): Seq[SparkPlan] = {
      p.collect { case n => n }.flatMap {
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => s +: all(s.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r +: all(r.child)
        case n => Seq(n)
      }.distinct
    }
    val plan = g.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val nodes = all(plan).map(_.getClass.getSimpleName)
    assert(!nodes.exists(_.contains("Join")), s"GD gradient pass must not join: $nodes")
    assert(nodes.count(_.startsWith("ShuffleExchange")) <= 1,
      s"gradient pass should shuffle only partial-agg rows: $nodes")
    assert(nodes.count(_.startsWith("HashAggregate")) >= 2,
      s"expected partial+final aggregation (map-side combine): $nodes")
  }
}
