package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed view of the pipeline's fixed columns (reference: struct File,
  * src/main.rs:23-35). Metadata columns are dynamic and stay in DataFrame
  * land; this facade gives compile-time safety for the invariant part —
  * useful for downstream Dataset-typed consumers and tests.
  */
final case class Audio(bytes: Array[Byte], sampling_rate: Int, path: String)
final case class AudioRecord(audio: Audio, duration: Double, transcription: String)

object AudioRecord {
  implicit val encoder: Encoder[AudioRecord] = Encoders.product[AudioRecord]

  /** Project the typed core out of any pipeline output frame. */
  def fromFrame(df: DataFrame): Dataset[AudioRecord] =
    df.select("audio", "duration", "transcription").as[AudioRecord](encoder)
}
