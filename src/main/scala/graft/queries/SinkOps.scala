package graft.queries

import graft.AudioToDataset
import graft.functions.Wav
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Util._

/** K1/X1/X4/P5/P6 end-to-end inside the oracle gate: synthesize a WAV corpus
  * from the documents table, run the REAL pipeline (scan → parse → shard →
  * exact-name Parquet sink), read the shards back and verify duration /
  * sampling rate / shard assignment against a pure-SQL reconstruction.
  */
object SinkOps {
  type Q = (SparkSession, String) => DataFrame

  private val NDocs = 50
  private val FilesPerShard = 20

  private def fixture(s: SparkSession, dir: String): (String, String) = {
    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft-sink-" + dir.replaceAll("[^a-zA-Z0-9.]", "_"))
    val in = new java.io.File(base, "in"); val out = new java.io.File(base, "out")
    if (!new java.io.File(in, "docs/doc0.wav").exists()) {
      in.mkdirs()
      (0 until NDocs).foreach { id =>
        val sr = Seq(8000, 16000, 22050, 44100)(id % 4)
        val f = new java.io.File(in, s"docs/doc$id.wav")
        f.getParentFile.mkdirs()
        java.nio.file.Files.write(f.toPath, Wav.synthWav(sr, sr / 2)) // 0.5 s
      }
    }
    (in.getAbsolutePath, out.getAbsolutePath)
  }

  /** Run the pipeline, then read every shard back and project the parsed
    * audio facts plus the shard id from the file name. */
  val k1SinkRoundtrip: Q = (s, dir) => {
    val (in, out) = fixture(s, dir)
    AudioToDataset.run(s, AudioToDataset.Config(
      input = in, output = out, filesPerShard = FilesPerShard))
    s.read.parquet(out)
      .withColumn("shard_id",
        regexp_extract(input_file_name(), "(\\d+)\\.parquet", 1).cast("int"))
      .select(
        regexp_extract(col("audio.path"), "doc(\\d+)\\.wav", 1).cast("long").as("doc_id"),
        col("duration"), col("audio.sampling_rate").as("sampling_rate"),
        col("transcription"), col("shard_id"))
  }
  // Reconstruction: shard = consecutive chunks of 20 in LEXICOGRAPHIC
  // relative-path order (the engine's defined scan order).
  val k1SinkRoundtripSql =
    s"""SELECT doc_id, 0.5 AS duration,
       |  CASE WHEN doc_id % 4 = 0 THEN 8000 WHEN doc_id % 4 = 1 THEN 16000
       |       WHEN doc_id % 4 = 2 THEN 22050 ELSE 44100 END AS sampling_rate,
       |  '-' AS transcription,
       |  CAST(floor((row_number() OVER (ORDER BY 'docs/doc' || doc_id || '.wav') - 1) / $FilesPerShard) AS INT) AS shard_id
       |FROM (SELECT doc_id FROM documents WHERE doc_id < $NDocs)""".stripMargin

  def defs: Map[String, (Q, Option[String])] = Map(
    "k1_sink_roundtrip" -> (k1SinkRoundtrip, Some(k1SinkRoundtripSql)),
  )
}
