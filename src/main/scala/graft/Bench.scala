package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // process-private managed tables (see graft.core.EphemeralWarehouse)
      .config("spark.sql.warehouse.dir", graft.core.EphemeralWarehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: touch every table (footer read + full scan) so per-query
    // timings measure the query, not first-read I/O or codegen JIT.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => () }
      }
    // SPARK_GRAFT_ONLY=a,b,c restricts the run (iteration aid; driver unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // full materialization via the noop sink: count() lets Spark prune
      // unused projections, under-timing projection-heavy queries
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop this query's persisted intermediates: several operators
      // persist() (LSH bands, inverted indexes) and the handles go out of
      // scope when the query returns — left cached, 150 queries' blocks
      // accumulate and later queries in the run pay eviction + GC (measured:
      // late-alphabet queries 2-3x slower in a full run than in isolation)
      spark.catalog.clearCache()
      name -> dt
    }
    def dict(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // paths are interpolated into JSON — escape them (a dir with a quote
    // or backslash must not produce an unparseable round record)
    def jstr(v: String): String =
      "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val total = results.map(_._2).sum
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":${dict(results)},"sf":${jstr(sfDir)}}"""
    // The COMPLETE per-query record goes to a file: the driver captures only
    // the last ~2000 chars of the sbt log, and 150 query names alone exceed
    // that, so a full dict on stdout can never survive the tail window.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.out")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // stdout gets a line SIZED TO PARSE from the tail window (~1.9k budget):
    // the TPC-H headline dict + the slowest 25 queries (the regression
    // signal) + a pointer to the complete record. Rounded to ms.
    def ms(v: Double): Double = math.rint(v * 1000) / 1000
    val headline = results.filter { case (n, _) => n.matches("^q\\d+_.*") }
      .map { case (n, v) => n -> ms(v) }
    val slowest = results.sortBy(-_._2).take(25).map { case (n, v) => n -> ms(v) }
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec"""" +
      s""","queries":${dict(headline)},"slowest":${dict(slowest)}""" +
      s""","n_queries":${results.size},"full_record":${jstr(outPath)},"sf":${jstr(sfDir)}}"""
    println(line)
    spark.stop()
  }
}
