package graft

import org.apache.spark.sql.functions._
import graft.queries.{Analytics, Util, VectorOps}

/** Pins for the round-9 scale knobs: adaptive LSH band width
  * (dedup_embedding / dedup_semantic) and the bucketed interval join
  * (events_correlate). The oracle gate proves small-scale values; these
  * tests pin the SCHEDULE (when the knob engages) and the equivalence the
  * oracle can't see (bucketing changes nothing at any scale). */
class ScaleKnobSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("adaptive width: floor holds through the oracle/bench scales, then one bit per doubling") {
    val base = 1L << VectorOps.DedupBits // 4096 buckets, load target 16
    // every driver-visible scale stays on the 12-bit contract
    for (n <- Seq(0L, 200L, 2000L, 20000L, 65536L))
      assert(VectorOps.extraBitsFor(n, base) == 0, s"n=$n")
    // first engagement just past LoadTarget*buckets, then log2 growth
    assert(VectorOps.extraBitsFor(65537L, base) == 1)
    assert(VectorOps.extraBitsFor(200000L, base) == 2)   // the sf10 point
    assert(VectorOps.extraBitsFor(2000000L, base) == 5)
    assert(VectorOps.extraBitsFor(Long.MaxValue, base) == 16) // capped
    // dedup_semantic's factored base (K·2^SemBits) uses the same schedule
    assert(VectorOps.extraBitsFor(200000L, 64L << VectorOps.SemBits) == 2)
  }

  test("adaptive width: expected bucket load stays <= LoadTarget once engaged") {
    val base = 1L << VectorOps.DedupBits
    for (n <- Seq(100000L, 1000000L, 100000000L, 10000000000L)) {
      val extra = VectorOps.extraBitsFor(n, base)
      if (extra < 16)
        assert(n.toDouble / (base << extra) <= 16.0, s"n=$n extra=$extra")
    }
  }

  test("second contrast family: valid distinct 1-based dims for every adaptive bit") {
    for (m <- 0 until 8 * 16) { // every (band, extra-bit) slot either query can use
      val (i1, i2) = VectorOps.contrastDims2(m)
      assert(i1 >= 1 && i1 <= 64 && i2 >= 1 && i2 <= 64 && i1 != i2, s"m=$m -> ($i1,$i2)")
    }
  }

  test("extra bit columns evaluate in-bounds on a real 64-dim vector") {
    val df = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .limit(4)
    for (band <- 0 until 8) {
      val sig = VectorOps.extraBitCols(col("v"), band, 16, 12).reduce(_ + _)
      val vals = df.select(sig.as("s")).collect().map(_.getLong(0))
      // 16 bits above shift 12 => signature confined to [0, 2^28)
      assert(vals.forall(s => s >= 0L && s < (1L << 28)))
    }
  }

  test("events_correlate: bucketed interval join == naive interval join") {
    val W = 1800000000L
    val ev = Util.eventsWithTs(spark, dir)
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"), col("ts_us").as("buy_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts_us").as("click_us"))
    val naive = buys.join(clicks,
        col("user_id") === col("c_user") &&
          col("click_us") <= col("buy_us") &&
          col("click_us") >= col("buy_us") - W)
      .groupBy(col("buy_id"), col("user_id"))
      .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
    val bucketed = Analytics.eventsCorrelate(spark, dir)
    assert(naive.count() > 0)
    assert(bucketed.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(bucketed).count() == 0)
  }

  test("band-job schedule: one all-bands job through bench scales, (band, residue-slice) grid past the threshold") {
    // every driver/bench/sf100 scale runs the single all-bands job
    for (n <- Seq(0L, 2000L, 20000L, 200000L, 2000000L)) {
      assert(VectorOps.bandJobs(5, n) == Seq((0 until 5, 0, 1)), s"n=$n")
    }
    // fourth decade: one job per (band, bucket-residue) slice
    val jobs = VectorOps.bandJobs(5, 20000000L)
    val subs = math.ceil(20000000.0 / VectorOps.BandSeqMinRows).toInt
    assert(subs == 5 && jobs.size == 5 * subs)
    for (b <- 0 until 5) {
      val slices = jobs.filter(_._1 == Seq(b)).map(j => (j._2, j._3))
      // residues are disjoint and complete: exactly 0..subs-1, each with subCount=subs
      assert(slices == (0 until subs).map(s => (s, subs)),
        s"band $b slices: $slices")
    }
    // a pair shares its bucket, so residue slicing partitions the PAIR set:
    // every bucket value lands in exactly one slice
    for (bucket <- Seq(0L, 1L, 12345L, (1L << 21) - 1))
      assert((0 until subs).count(s => bucket % subs == s) == 1)
  }
}
