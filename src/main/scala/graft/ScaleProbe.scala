package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A FOURTH-decade probe (virtual sf1000) for the lanes that can honestly
  * run on this box.
  *
  * A materialized sf1000 is ~150 GB of parquet — past this box's free
  * disk (53 GB at round 12), so the corpus is VIRTUAL: the plan unions
  * `copies` (default 10) key-shifted reads of the sf100 tables. What that
  * buys honestly, and what it does not:
  *
  *   - every DECODE, AGGREGATION STATE, map-side combine, and SHUFFLE runs
  *     at true sf1000 volume (6G lineitem rows, 50M docs) — the machinery
  *     being probed another decade up;
  *   - the scan I/O re-reads the same 11 GB file 10×, which the page
  *     cache serves after pass one — so these numbers measure the
  *     COMPUTE/SHUFFLE path, and the cold-disk term must be extrapolated
  *     separately (it is linear in bytes: SCALING.md's q1 adjudication).
  *
  * The shuffle-HEAVY lanes (q5's fact-fact SMJ: ~25 GB of shuffle per run
  * at sf100 → ~250 GB at sf1000) exceed the box's disk in SHUFFLE SPILL
  * alone and are not probed — that is the single-box disk ceiling,
  * documented as such in SCALING.md, and exactly the resource a
  * 1000-executor cluster widens.
  *
  * Three lanes, mirroring their registry queries:
  *   q1  — `q1_agg`'s full-scan aggregate (tiny group count);
  *   q6  — `q6_filter_agg`'s pushed-filter aggregate;
  *   dedup — `dedup_sha256`'s exact-dup detector (hash groupBy; the
  *           clone-mass generator makes every sf100 clone class 10× wider
  *           here, so duplicate OUTPUT grows super-row on purpose).
  *
  * Usage: runMain graft.ScaleProbe <sf100Dir> [copies] [lanes]
  * Prints one JSON line of lane timings.
  */
object ScaleProbe {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val copies = if (args.length > 1) args(1).toInt else 10
    val lanes = (if (args.length > 2) args(2) else "q1,q6,dedup").split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", graft.core.EphemeralWarehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** `copies` plan-level reads of `name`, each with `idCol` shifted into
      * its own key space (clone rows stay distinguishable, as a real
      * decade-up corpus's would be). */
    def virtualTable(name: String, idCol: String): DataFrame =
      (0 until copies).map { i =>
        spark.read.parquet(s"$sfDir/$name.parquet")
          .withColumn(idCol, col(idCol) + lit(i.toLong * 1000000000000L))
      }.reduce(_.unionByName(_))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    if (lanes("q1")) {
      // q1_agg's shape over 6G rows: group states are 6 rows; everything
      // is map-side combine + one tiny exchange
      val li = virtualTable("lineitem", "l_orderkey")
      timings += "q1_virtual" -> time(noop(
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))))
    }
    if (lanes("q6")) {
      val li = virtualTable("lineitem", "l_orderkey")
      timings += "q6_virtual" -> time(noop(
        li.filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
            count(lit(1)).as("n"))))
    }
    if (lanes("embedgen")) {
      // MATERIALIZE a fourth-decade embeddings table (20M vectors ≈ 5 GB —
      // the one big table that fits the disk): 10 copies of sf100, copy i
      // under a PER-DIMENSION SIGN-FLIP isometry D_i (dim k of copy i
      // negated iff bit 16 of the Knuth multiplicative hash of i·64+k is
      // set). D_i is orthogonal and DIAGONAL: within a copy,
      // (D_i a)·(D_i b) = a·b exactly — each copy reproduces sf100's
      // near-dup geometry bit-for-bit (true output = 10× sf100's, never a
      // clone-mass explosion) — while a cross-copy dot picks up
      // independent ± signs per dimension, which decorrelates even
      // ANISOTROPIC data. The round-12 generator used cyclic shifts here,
      // whose cross-class promise ("generic ~0 cosines") held only for
      // isotropic vectors: on this round's structured embeddings a
      // shift-by-7 pair keeps cos > 0.3 at mass — one probed slice showed
      // 86% of same-bucket candidates SURVIVING the threshold (~4B output
      // pairs, SCALING.md round 13), turning the probe into an
      // output-materialization test of a degenerate everything-matches
      // corpus rather than the intended 10×-linear one. Run
      // `Bench SPARK_GRAFT_ONLY=dedup_embedding` with SPARK_GRAFT_SF_DIR
      // pointed at the output dir afterwards.
      val out = s"${sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "target/scale/sf1000e")}/embeddings.parquet"
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val flipped = (0 until copies).map { i =>
        val e = if (i == 0) col("embedding")
          else expr(
            s"transform(embedding, (x, k) -> CASE WHEN " +
              s"pmod(floor(pmod(($i * 64 + k) * 2654435761, 4294967296) / 65536), 2) = 1 " +
              "THEN -x ELSE x END)")
        emb.select((col("vec_id") + lit(i.toLong * 1000000000000L)).as("vec_id"),
          e.as("embedding"), col("label"))
      }.reduce(_.unionByName(_))
      timings += "embedgen" -> time(
        flipped.repartition(64).write.mode("overwrite").parquet(out))
    }
    if (lanes("dedup")) {
      // dedup_sha256's shape at 50M docs: the exchange carries one row per
      // DISTINCT hash after map-side combine — clone mass collapses before
      // the wire, which is the property being verified another decade up
      val docs = virtualTable("documents", "doc_id")
      timings += "dedup_sha256_virtual" -> time(noop(
        docs.groupBy(sha2(col("text"), 256).as("h"))
          .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
          .filter(col("n_copies") > 1)))
    }

    val line = timings.map { case (k, v) => f""""$k":$v%.1f""" }
      .mkString(s"""{"copies":$copies,"sf_dir":"$sfDir",""", ",", "}")
    println(line)
    spark.stop()
  }
}
