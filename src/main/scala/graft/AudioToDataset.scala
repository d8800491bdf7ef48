package graft

import graft.core._
import graft.functions.Wav
import graft.operators.Sharding
import graft.sinks.{DuckDbShardSink, ParquetShardSink}
import graft.sources.{AudioScan, Metadata}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end pipeline — the Spark re-expression of the reference CLI
  * (reference: main(), src/main.rs:615-860). Declarative plan:
  *
  *   binaryFile scan (S1, F1–F5)
  *     → WAV parse (P5) → audio struct assembly (P6)
  *     → 3-level broadcast metadata join (J1/J2, P7/P8)
  *     → deterministic shard assignment (X1)
  *     → exact-name Parquet (K1) or DuckDB (K2) shards
  *
  * All defaults mirror the reference's clap args (src/main.rs:55-95).
  */
object AudioToDataset {

  final case class Config(
      input: String,
      output: String,
      metadataFile: Option[String] = None,
      format: String = "parquet",                   // parquet | duckdb
      filesPerShard: Int = Sharding.DefaultFilesPerShard, // --files-per-db, 500
      maxDepth: Int = AudioScan.DefaultMaxDepth,    // --max-depth-size, 50
      checkMimeType: Boolean = false,               // --check-mime-type
      parquetCompression: String = "snappy",        // --parquet-compression
      // Engine extensions beyond the reference CLI:
      // F2 opt-out (--follow-symlinks) — the canonical-path check is
      // local-fs-only; on object stores it self-disables, and name-based
      // pruning is available on ANY scheme via --path-glob (binaryFile's
      // listing-time pathGlobFilter).
      excludeSymlinks: Boolean = true,              // --follow-symlinks clears
      pathGlobFilter: Option[String] = None,        // --path-glob
      // zip bundles explode into entries in-executor (bang-notation paths)
      expandArchives: Boolean = false)              // --expand-archives

  /** The logical plan up to (but excluding) the sink: returns the dataframe
    * with columns `audio, duration, <metadata keys sorted>, shard_id` and the
    * resolved metadata schema. */
  def plan(spark: SparkSession, cfg: Config): (DataFrame, Metadata.MetaSchema) = {
    val (df, sch, _) = planWithCount(spark, cfg)
    (df, sch)
  }

  /** [[plan]] plus the post-filter file count (free: it is the shard
    * ranking's pass-1 grand total) — the CLI sink path sizes its shard
    * repartition from it WITHOUT a second scan. The reference lists the
    * input exactly once (src/main.rs:662-712); so do we. */
  private[graft] def planWithCount(
      spark: SparkSession, cfg: Config): (DataFrame, Metadata.MetaSchema, Long) = {
    val (metaDf, metaSchema) = cfg.metadataFile match {
      case Some(mf) =>
        val (df, sch) = Metadata.load(spark, mf)
        (Some(df), sch)
      case None =>
        (None, Metadata.MetaSchema(
          scala.collection.immutable.TreeMap("transcription" -> (MString: MetadataType))))
    }
    val files = AudioScan.scan(spark, cfg.input, cfg.maxDepth, cfg.metadataFile,
      cfg.checkMimeType, cfg.excludeSymlinks, cfg.pathGlobFilter, cfg.expandArchives)
      .withColumn("wav", Wav.parseCol(col("content"))) // P5

    val joined = metaDf match {
      case Some(m) => Metadata.joinFiles(files, m, metaSchema)
      case None    => files.withColumn("transcription", lit("-"))
    }
    val assembled = joined.select(
      Seq(
        struct( // P6 — Parquet field order bytes, sampling_rate, path (src/main.rs:465-470)
          col("content").as("bytes"),
          col("wav.sampling_rate").as("sampling_rate"),
          col("relative_path").as("path")).as("audio"),
        col("wav.duration").as("duration")) ++
        metaSchema.keys.map(col): _*)
    // X1: scan order defined as relative-path order (documented divergence
    // from the platform-dependent directory iterator, SURVEY.md §7.4).
    // Ranks come from the skinny-path two-phase ranking so audio bytes never
    // pass through a single-partition window.
    val (sharded, nFiles) = Sharding.shardConsecutiveByKeyCounted(
      assembled.withColumn("_order", col("audio.path")),
      "_order", cfg.filesPerShard)
    (sharded.drop("_order"), metaSchema, nFiles)
  }

  def run(spark: SparkSession, cfg: Config): Unit = {
    val (sharded, metaSchema, nFiles) = planWithCount(spark, cfg)
    val metaTypes = metaSchema.types.toSeq
    // shard count = ceil(post-filter files / filesPerShard), carried out of
    // the plan's own ranking pass — no second listing, and (unlike the old
    // count-only rescan) it reflects EVERY filter including the MIME sniff
    val nShards = Some(math.max(1, math.ceil(nFiles.toDouble / cfg.filesPerShard).toInt))
    cfg.format match {
      case "parquet" =>
        ParquetShardSink.writeShards(
          sharded, cfg.output, cfg.parquetCompression,
          footerKv = Map("huggingface" -> ParquetShardSink.hfFeaturesJson(metaTypes)),
          orderCols = Seq("audio.path"), numShards = nShards)
      case "duckdb" =>
        DuckDbShardSink.writeShards(sharded, cfg.output, metaTypes, numShards = nShards)
      case "webdataset" => // engine extension: tar shards for training loaders
        graft.sinks.TarShardSink.writeShards(
          sharded, cfg.output, metaSchema.keys.toSeq,
          orderCols = Seq("audio.path"), numShards = nShards)
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }
  }

  /** CLI mirroring the reference's flags. */
  def main(args: Array[String]): Unit = {
    def arg(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(k, v) if k == s"--$name" => v }
    val cfg = Config(
      input = arg("input").getOrElse(sys.error("--input required")),
      output = arg("output").getOrElse(sys.error("--output required")),
      metadataFile = arg("metadata-file"),
      format = arg("format").getOrElse("parquet"),
      filesPerShard = arg("files-per-db").map(_.toInt).getOrElse(Sharding.DefaultFilesPerShard),
      maxDepth = arg("max-depth-size").map(_.toInt).getOrElse(AudioScan.DefaultMaxDepth),
      checkMimeType = args.contains("--check-mime-type"),
      parquetCompression = arg("parquet-compression").getOrElse("snappy"),
      excludeSymlinks = !args.contains("--follow-symlinks"),
      pathGlobFilter = arg("path-glob"),
      expandArchives = args.contains("--expand-archives"))
    // --num-threads mirrors the reference's rayon pool size (src/main.rs:79-81);
    // in Spark terms it sizes local parallelism + shuffle partitions.
    val numThreads = arg("num-threads").map(_.toInt)
    val builder = SparkSession.builder()
      .appName("audios-to-dataset-spark")
      .config("spark.sql.shuffle.partitions",
        numThreads.map(_.toString).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
    // Under spark-submit the master comes from the launcher; standalone runs
    // (sbt runMain, plain java -jar) default to all local cores.
    if (sys.props.get("spark.master").isEmpty && sys.env.get("MASTER").isEmpty)
      builder.master(numThreads.map(n => s"local[$n]")
        .getOrElse(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]")))
    val spark = builder.getOrCreate()
    try run(spark, cfg) finally spark.stop()
  }
}
