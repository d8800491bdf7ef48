package graft.queries

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Util._

/** Multimodal-column verification queries: the documents' text bytes stand in
  * for opaque media payloads (the container has no codecs); the Spark-side
  * plumbing — binary schema, mapPartitions batching, frame slicing — is the
  * real thing being verified.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** mapPartitions decode of a binary column (stub kernel): n_bytes and the
    * byte-fold checksum must match the oracle computed from the text. */
  val mmDecode: Q = (s, dir) => {
    val bin = table(s, dir, "documents").filter(col("doc_id") < 500)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    Multimodal.decodeBinary(bin, "payload")
      .select(col("doc_id"),
        col("decoded.n_bytes").as("n_bytes"),
        col("decoded.checksum").as("checksum"),
        col("decoded.width").as("width"),
        round(col("decoded.rms"), 4).as("rms"))
  }
  // ASCII text ⇒ byte-fold == char-fold and byte values == char codes,
  // so the oracle can recompute both checksum and rms from the text.
  val mmDecodeSql =
    s"""SELECT doc_id, strlen(text) AS n_bytes, ${charFoldHashSql("text")} AS checksum,
       |  strlen(text) % 640 AS width,
       |  round(sqrt(list_sum(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS DOUBLE) * ascii(c))) / strlen(text)), 4) AS rms
       |FROM documents WHERE doc_id < 500""".stripMargin

  /** REAL WAV decode through the multimodal kernel: synthesize integer-PCM
    * WAV payloads in-query (rate and length derived from doc_id, like
    * p5_wav_parse), decode via mapPartitions, and verify the true PCM sample
    * RMS, sampling rate, and duration. The samples are pure integer
    * arithmetic — sample i = ((i*2654435761) mod 65536) - 32768 — so the
    * oracle recomputes them exactly; squares sum below 2^53, so the double
    * accumulation is exact in both engines. */
  val mmDecodeWav: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        (lit(8000) + (col("doc_id") % 4) * 4000).cast("int").as("sr"),
        (lit(50) + col("doc_id") % 64).cast("int").as("len"))
    val wav = docs.select(col("doc_id"),
      graft.functions.Wav.synthPcmUdf(col("sr"), col("len")).as("payload"))
    Multimodal.decodeBinary(wav, "payload")
      .select(col("doc_id"),
        col("decoded.n_bytes").as("n_bytes"),
        col("decoded.sampling_rate").as("sampling_rate"),
        round(col("decoded.duration"), 6).as("duration"),
        round(col("decoded.rms"), 4).as("rms"))
  }
  val mmDecodeWavSql =
    """SELECT doc_id, 44 + 2*len AS n_bytes, sr AS sampling_rate,
      |  round(CAST(len AS DOUBLE)/sr, 6) AS duration,
      |  round(sqrt(list_sum(list_transform(range(len), i ->
      |    CAST((i*2654435761) % 65536 - 32768 AS DOUBLE)
      |      * ((i*2654435761) % 65536 - 32768))) / len), 4) AS rms
      |FROM (SELECT doc_id, CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sr,
      |             CAST(50 + doc_id % 64 AS INT) AS len
      |      FROM documents WHERE doc_id < 200)""".stripMargin

  /** REAL FLAC STREAMINFO decode through the multimodal kernel: synthesize
    * header-only FLAC payloads in-query (rate and total samples derived from
    * doc_id), decode via mapPartitions, and verify the parsed rate and the
    * exact duration = total_samples / rate. Integer header fields → the
    * oracle recomputes bit-exactly (the double division is IEEE-identical
    * in both engines, as in mm_decode_wav). */
  val mmDecodeFlac: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        (lit(8000) + (col("doc_id") % 4) * 4000).cast("int").as("sr"),
        (lit(1000) + (col("doc_id") * 37) % 100000).cast("long").as("total"))
    val flac = docs.select(col("doc_id"),
      graft.functions.Flac.synthUdf(col("sr"), col("total")).as("payload"))
    Multimodal.decodeBinary(flac, "payload")
      .select(col("doc_id"),
        col("decoded.n_bytes").as("n_bytes"),
        col("decoded.sampling_rate").as("sampling_rate"),
        round(col("decoded.duration"), 6).as("duration"))
  }
  val mmDecodeFlacSql =
    """SELECT doc_id, 42 AS n_bytes, sr AS sampling_rate,
      |  round(CAST(total AS DOUBLE)/sr, 6) AS duration
      |FROM (SELECT doc_id, CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sr,
      |             CAST(1000 + (doc_id * 37) % 100000 AS BIGINT) AS total
      |      FROM documents WHERE doc_id < 200)""".stripMargin

  /** REAL OGG/Vorbis header decode through the multimodal kernel:
    * synthesize header-only OGG payloads in-query (rate and total samples
    * derived from doc_id), decode via mapPartitions, and verify the parsed
    * rate and the exact duration = last-page granule / rate. Integer header
    * fields → the oracle recomputes bit-exactly (fixture is always 85
    * bytes: BOS page + Vorbis id header + empty EOS page). */
  val mmDecodeOgg: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        (lit(8000) + (col("doc_id") % 4) * 4000).cast("int").as("sr"),
        (lit(1000) + (col("doc_id") * 53) % 100000).cast("long").as("total"))
    val ogg = docs.select(col("doc_id"),
      graft.functions.Ogg.synthUdf(col("sr"), col("total")).as("payload"))
    Multimodal.decodeBinary(ogg, "payload")
      .select(col("doc_id"),
        col("decoded.n_bytes").as("n_bytes"),
        col("decoded.sampling_rate").as("sampling_rate"),
        round(col("decoded.duration"), 6).as("duration"))
  }
  val mmDecodeOggSql =
    """SELECT doc_id, 85 AS n_bytes, sr AS sampling_rate,
      |  round(CAST(total AS DOUBLE)/sr, 6) AS duration
      |FROM (SELECT doc_id, CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sr,
      |             CAST(1000 + (doc_id * 53) % 100000 AS BIGINT) AS total
      |      FROM documents WHERE doc_id < 200)""".stripMargin

  /** REAL MP3 frame-chain decode through the multimodal kernel: synthesize
    * mono 128 kbps MPEG-1 Layer III streams in-query (rate cycling the
    * MPEG-1 table, frame count derived from doc_id), walk the chain via
    * mapPartitions, and verify total bytes (n_frames · 144·128000/rate)
    * and exact duration (n_frames · 1152 / rate) — the oracle recomputes
    * both from the same integer parameters. */
  val mmDecodeMp3: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        element_at(array(lit(44100), lit(48000), lit(32000)),
          (col("doc_id") % 3 + 1).cast("int")).as("sr"),
        (lit(1) + col("doc_id") % 40).cast("int").as("nf"))
    val mp3 = docs.select(col("doc_id"),
      graft.functions.Mp3.synthUdf(col("sr"), col("nf")).as("payload"))
    Multimodal.decodeBinary(mp3, "payload")
      .select(col("doc_id"),
        col("decoded.n_bytes").as("n_bytes"),
        col("decoded.sampling_rate").as("sampling_rate"),
        round(col("decoded.duration"), 6).as("duration"))
  }
  val mmDecodeMp3Sql =
    """SELECT doc_id, CAST(nf * ((144*128000) // sr) AS INT) AS n_bytes,
      |  sr AS sampling_rate,
      |  round(CAST(nf * 1152 AS DOUBLE)/sr, 6) AS duration
      |FROM (SELECT doc_id,
      |        ([44100, 48000, 32000])[CAST(doc_id % 3 AS INT) + 1] AS sr,
      |        CAST(1 + doc_id % 40 AS INT) AS nf
      |      FROM documents WHERE doc_id < 200)""".stripMargin

  /** REAL AIFF COMM-chunk decode through the multimodal kernel: synthesize
    * header-only FORM/AIFF/COMM payloads in-query (rate and total frames
    * derived from doc_id, rate encoded as the 80-bit extended float the
    * format mandates), decode via mapPartitions, and verify the parsed
    * rate and the exact duration = frames / rate. Fixture is always 38
    * bytes; integer header fields → bit-exact oracle recompute. */
  val mmDecodeAiff: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        (lit(8000) + (col("doc_id") % 4) * 4000).cast("int").as("sr"),
        (lit(1000) + (col("doc_id") * 41) % 100000).cast("long").as("total"))
    val aiff = docs.select(col("doc_id"),
      graft.functions.Aiff.synthUdf(col("sr"), col("total")).as("payload"))
    Multimodal.decodeBinary(aiff, "payload")
      .select(col("doc_id"),
        col("decoded.n_bytes").as("n_bytes"),
        col("decoded.sampling_rate").as("sampling_rate"),
        round(col("decoded.duration"), 6).as("duration"))
  }
  val mmDecodeAiffSql =
    """SELECT doc_id, 38 AS n_bytes, sr AS sampling_rate,
      |  round(CAST(total AS DOUBLE)/sr, 6) AS duration
      |FROM (SELECT doc_id, CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sr,
      |             CAST(1000 + (doc_id * 41) % 100000 AS BIGINT) AS total
      |      FROM documents WHERE doc_id < 200)""".stripMargin

  /** REAL AAC ADTS frame-chain decode through the multimodal kernel:
    * synthesize mono AAC-LC header-only frame chains in-query (rate
    * cycling the MPEG-4 table, frame count derived from doc_id), walk the
    * chain via mapPartitions, and verify total bytes (7·n_frames) and
    * exact duration (n_frames · 1024 / rate) — the oracle recomputes both
    * from the same integer parameters. */
  val mmDecodeAdts: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        element_at(array(lit(48000), lit(44100), lit(24000), lit(16000), lit(8000)),
          (col("doc_id") % 5 + 1).cast("int")).as("sr"),
        (lit(1) + col("doc_id") % 40).cast("int").as("nf"))
    val adts = docs.select(col("doc_id"),
      graft.functions.Adts.synthUdf(col("sr"), col("nf")).as("payload"))
    Multimodal.decodeBinary(adts, "payload")
      .select(col("doc_id"),
        col("decoded.n_bytes").as("n_bytes"),
        col("decoded.sampling_rate").as("sampling_rate"),
        round(col("decoded.duration"), 6).as("duration"))
  }
  val mmDecodeAdtsSql =
    """SELECT doc_id, CAST(nf * 7 AS INT) AS n_bytes, sr AS sampling_rate,
      |  round(CAST(nf * 1024 AS DOUBLE)/sr, 6) AS duration
      |FROM (SELECT doc_id,
      |        ([48000, 44100, 24000, 16000, 8000])[CAST(doc_id % 5 AS INT) + 1] AS sr,
      |        CAST(1 + doc_id % 40 AS INT) AS nf
      |      FROM documents WHERE doc_id < 200)""".stripMargin

  /** Audio frame-energy segmentation over REAL PCM16 WAV payloads: per-doc
    * 16-sample frame |amplitude| sums, silent-frame count (sum below
    * 16·16384), and mean |sample| — the silence-detection / segmentation
    * shape of audio feature extraction, all integer-exact so the oracle
    * recomputes the samples (same fixture family as mm_decode_wav). */
  val audioFrameEnergy: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 300)
      .select(col("doc_id"), (lit(64) + col("doc_id") % 100).cast("int").as("len"))
    docs.select(col("doc_id"), col("len"),
        graft.functions.Wav.frameStatsUdf(
          graft.functions.Wav.synthPcmUdf(lit(16000), col("len"))).as("fs"))
      .select(col("doc_id"),
        col("fs._1").as("n_frames"),
        col("fs._2").as("n_silent"),
        round(col("fs._3").cast("double") / (col("fs._1") * 16), 4).as("mean_abs"))
  }
  val audioFrameEnergySql =
    """WITH d AS (SELECT doc_id, 64 + doc_id % 100 AS len FROM documents WHERE doc_id < 300),
      |f AS (SELECT doc_id, len // 16 AS n_frames FROM d)
      |SELECT doc_id, CAST(n_frames AS INT) AS n_frames,
      |  CAST(len(list_filter(range(n_frames), fr ->
      |    list_sum(list_transform(range(fr*16, fr*16 + 16), i ->
      |      abs((i*2654435761) % 65536 - 32768))) < 262144)) AS INT) AS n_silent,
      |  round(CAST(list_sum(list_transform(range(n_frames*16), i ->
      |    abs((i*2654435761) % 65536 - 32768))) AS DOUBLE) / (n_frames*16), 4) AS mean_abs
      |FROM f""".stripMargin

  /** Frame sampling: 4 consecutive 16-byte slices from each payload; verify
    * count and per-frame lengths (slices run off the end → shorter tails).
    * Lengths emitted as JSON text: the driver comparator hashes scalar
    * columns only (array cells crash its pandas sort). */
  val mmFrameSample: Q = (s, dir) =>
    table(s, dir, "documents").filter(col("doc_id") < 500)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"),
        Multimodal.frameSlices(col("payload"), 4, 16).as("frames"))
      .select(col("doc_id"), size(col("frames")).as("n_frames"),
        to_json(transform(col("frames"), f => length(f))).as("frame_lens"))
  val mmFrameSampleSql =
    """SELECT doc_id, 4 AS n_frames,
      |  CAST(to_json(list_transform([0,1,2,3], i -> CASE
      |    WHEN strlen(text) - i*16 >= 16 THEN 16
      |    WHEN strlen(text) - i*16 > 0 THEN strlen(text) - i*16
      |    ELSE 0 END)) AS VARCHAR) AS frame_lens
      |FROM documents WHERE doc_id < 500""".stripMargin

  /** Audio near-duplicate detection end to end: synthesize per-doc PCM WAVs
    * (content keyed by `doc_id % 50` — distinct phase-shifted recordings,
    * each present in ~6 copies here), run the REAL RIFF/PCM16 decode +
    * energy-delta fingerprint kernel
    * ([[graft.functions.Wav.pcm16Fingerprint]]), and group by fingerprint —
    * the audio twin of `dedup_exact`/`dedup_sha256`, except the key is
    * CONTENT-derived (frame-energy deltas, gain-invariant) rather than
    * byte-exact. The oracle replays the deterministic seeded PCM formula
    * and the same delta-bit assembly as integer SQL.
    *
    * Scale shape: one narrow decode+fingerprint pass (the kernel is a
    * single compiled loop per row, no intermediate energy arrays
    * materialized in the plan), then one map-side-combining groupBy on an
    * 8-byte key — exactly `dedup_sha256`'s shuffle profile, with 100 TB of
    * audio reduced to one long per file before any exchange. */
  val audioFingerprint: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 300)
      .select(col("doc_id"), (col("doc_id") % 50).cast("long").as("seed"))
    docs.select(col("doc_id"),
        graft.functions.Wav.fingerprintUdf(
          graft.functions.Wav.synthPcmSeededUdf(lit(16000), lit(160), col("seed"))).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_id"))
      .filter(col("n_copies") >= 2)
  }
  val audioFingerprintSql =
    """WITH d AS (SELECT doc_id, doc_id % 50 AS seed
      |           FROM documents WHERE doc_id < 300),
      |es AS (SELECT doc_id, list_transform(range(10), f ->
      |    list_sum(list_transform(range(f*16, f*16 + 16), i ->
      |      abs(((i + seed)*2654435761) % 65536 - 32768)))) AS e FROM d),
      |fp AS (SELECT doc_id, CAST(coalesce(list_sum(list_transform(range(9), f ->
      |    CASE WHEN e[f+1] > e[f+2] THEN CAST(1 AS BIGINT) << CAST(f AS INT)
      |         ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS fp FROM es)
      |SELECT fp, count(*) AS n_copies, min(doc_id) AS canonical_id
      |FROM fp GROUP BY fp HAVING count(*) >= 2""".stripMargin

  /** REAL BMP image decode through the multimodal kernel: synthesize 24-bpp
    * DIB payloads in-query (dims derived from doc_id, pixel channels pure
    * integer formulas — [[graft.functions.Bmp.synthBmp]]), parse the
    * container via mapPartitions for true width/height, and decode every
    * pixel for per-channel means. The image twin of mm_decode_wav: the
    * oracle recomputes dims, byte size (4-byte row padding included), and
    * exact channel sums from the same formulas. */
  val mmDecodeBmp: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        (lit(8) + col("doc_id") % 9).cast("int").as("w"),
        (lit(6) + col("doc_id") % 7).cast("int").as("h"))
    val bmp = docs.select(col("doc_id"),
      graft.functions.Bmp.synthUdf(col("w"), col("h")).as("payload"))
    Multimodal.decodeBinary(bmp, "payload")
      .select(col("doc_id"), col("payload"),
        col("decoded.n_bytes").as("n_bytes"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"))
      .withColumn("st", graft.functions.Bmp.statsUdf(col("payload")))
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        round(col("st.sum_r").cast("double") / (col("width") * col("height")), 4).as("mean_r"),
        round(col("st.sum_g").cast("double") / (col("width") * col("height")), 4).as("mean_g"),
        round(col("st.sum_b").cast("double") / (col("width") * col("height")), 4).as("mean_b"))
  }
  val mmDecodeBmpSql =
    """WITH d AS (SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
      |                  CAST(6 + doc_id % 7 AS INT) AS h
      |           FROM documents WHERE doc_id < 200)
      |SELECT doc_id, CAST(54 + ((w*3 + 3) // 4) * 4 * h AS INT) AS n_bytes,
      |  w AS width, h AS height,
      |  round(CAST(list_sum(list_transform(range(h), y -> list_sum(
      |    list_transform(range(w), x -> (7*x + 23*y + 13) % 256)))) AS DOUBLE) / (w*h), 4) AS mean_r,
      |  round(CAST(list_sum(list_transform(range(h), y -> list_sum(
      |    list_transform(range(w), x -> (13*x + 29*y + 11) % 256)))) AS DOUBLE) / (w*h), 4) AS mean_g,
      |  round(CAST(list_sum(list_transform(range(h), y -> list_sum(
      |    list_transform(range(w), x -> (31*x + 17*y + 7) % 256)))) AS DOUBLE) / (w*h), 4) AS mean_b
      |FROM d""".stripMargin

  /** REAL PPM (P6) decode through the multimodal kernel — the second image
    * container ([[graft.functions.Ppm]]: strict-canonical header parse +
    * full pixel decode), carrying the SAME image content as the BMP
    * fixtures: identical pixel formulas, so the oracle's channel means are
    * the BMP oracle's expressions while n_bytes follows the ASCII-header
    * layout (9 + digits(w) + digits(h) + 3wh, no row padding). Container
    * parsing and content statistics verified independently per format. */
  val mmDecodePpm: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        (lit(8) + col("doc_id") % 9).cast("int").as("w"),
        (lit(6) + col("doc_id") % 7).cast("int").as("h"))
    val ppm = docs.select(col("doc_id"),
      graft.functions.Ppm.synthUdf(col("w"), col("h")).as("payload"))
    Multimodal.decodeBinary(ppm, "payload")
      .select(col("doc_id"), col("payload"),
        col("decoded.n_bytes").as("n_bytes"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"))
      .withColumn("st", graft.functions.Ppm.statsUdf(col("payload")))
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        round(col("st.sum_r").cast("double") / (col("width") * col("height")), 4).as("mean_r"),
        round(col("st.sum_b").cast("double") / (col("width") * col("height")), 4).as("mean_b"))
  }
  val mmDecodePpmSql =
    """WITH d AS (SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
      |                  CAST(6 + doc_id % 7 AS INT) AS h
      |           FROM documents WHERE doc_id < 200)
      |SELECT doc_id,
      |  CAST(9 + strlen(CAST(w AS VARCHAR)) + strlen(CAST(h AS VARCHAR)) + 3*w*h AS INT) AS n_bytes,
      |  w AS width, h AS height,
      |  round(CAST(list_sum(list_transform(range(h), y -> list_sum(
      |    list_transform(range(w), x -> (7*x + 23*y + 13) % 256)))) AS DOUBLE) / (w*h), 4) AS mean_r,
      |  round(CAST(list_sum(list_transform(range(h), y -> list_sum(
      |    list_transform(range(w), x -> (31*x + 17*y + 7) % 256)))) AS DOUBLE) / (w*h), 4) AS mean_b
      |FROM d""".stripMargin

  /** Image RESIZE (nearest-neighbor ÷2) over real decoded BMP pixels: the
    * downsample transform of an image-preprocessing pipeline, verified by
    * recomputing the sampled pixel grid — output dims ceil(dim/2), output
    * pixel (x,y) = source (2x,2y) — in integer SQL. Runs as one narrow
    * decode+sample pass per payload, no intermediate image materialized. */
  val mmImageResize: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        (lit(8) + col("doc_id") % 9).cast("int").as("w"),
        (lit(6) + col("doc_id") % 7).cast("int").as("h"))
    docs.select(col("doc_id"),
        graft.functions.Bmp.resampleStatsUdf(
          graft.functions.Bmp.synthUdf(col("w"), col("h")), lit(2)).as("st"))
      .select(col("doc_id"),
        col("st.width").as("out_w"), col("st.height").as("out_h"),
        round(col("st.sum_r").cast("double") / (col("st.width") * col("st.height")), 4).as("mean_r"),
        round(col("st.sum_b").cast("double") / (col("st.width") * col("st.height")), 4).as("mean_b"))
  }
  val mmImageResizeSql =
    """WITH d AS (SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
      |                  CAST(6 + doc_id % 7 AS INT) AS h
      |           FROM documents WHERE doc_id < 200),
      |r AS (SELECT doc_id, (w + 1) // 2 AS ow, (h + 1) // 2 AS oh FROM d)
      |SELECT doc_id, CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
      |  round(CAST(list_sum(list_transform(range(oh), y -> list_sum(
      |    list_transform(range(ow), x -> (7*(2*x) + 23*(2*y) + 13) % 256)))) AS DOUBLE) / (ow*oh), 4) AS mean_r,
      |  round(CAST(list_sum(list_transform(range(oh), y -> list_sum(
      |    list_transform(range(ow), x -> (31*(2*x) + 17*(2*y) + 7) % 256)))) AS DOUBLE) / (ow*oh), 4) AS mean_b
      |FROM r""".stripMargin

  /** Audio RESAMPLE to 4 kHz over real decoded PCM16 WAV: nearest-index
    * decimation ([[graft.functions.Wav.pcm16Resample]]) — the
    * rate-normalization step before featurization in every speech pipeline.
    * Source rates cycle 8/12/16/20 kHz, so the decimation stride varies per
    * row; the oracle replays the integer index map and the exact PCM
    * formula. One narrow decode+decimate pass per payload. */
  val audioResample: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        (lit(8000) + (col("doc_id") % 4) * 4000).cast("int").as("sr"),
        (lit(200) + col("doc_id") % 256).cast("int").as("len"))
    docs.select(col("doc_id"),
        graft.functions.Wav.resampleUdf(
          graft.functions.Wav.synthPcmUdf(col("sr"), col("len")), lit(4000)).as("rs"))
      .select(col("doc_id"),
        col("rs._1").as("n_in"), col("rs._2").as("n_out"),
        lit(4000).as("sr_out"),
        round(col("rs._3"), 4).as("rms"))
  }
  val audioResampleSql =
    """WITH d AS (SELECT doc_id, CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sr,
      |                  CAST(200 + doc_id % 256 AS INT) AS len
      |           FROM documents WHERE doc_id < 200),
      |r AS (SELECT doc_id, sr, len, (len * 4000) // sr AS n_out FROM d)
      |SELECT doc_id, len AS n_in, CAST(n_out AS INT) AS n_out, 4000 AS sr_out,
      |  round(sqrt(CAST(list_sum(list_transform(range(n_out), i ->
      |    (((i*sr) // 4000) * 2654435761 % 65536 - 32768)
      |      * (((i*sr) // 4000) * 2654435761 % 65536 - 32768))) AS DOUBLE) / n_out), 4) AS rms
      |FROM r""".stripMargin

  /** Energy-gate VAD TRIM over real decoded PCM16 frames: voiced = frame
    * |amplitude| sum ≥ 16·16384 ([[graft.functions.Wav.pcm16VadTrim]], the
    * complement of audio_frame_energy's silence test), reporting the
    * voiced-frame count, first/last voiced frame, and the sample span the
    * trim keeps — the leading/trailing-silence cut before transcription.
    * Integer arithmetic throughout; the oracle recomputes the voiced set. */
  val audioVadTrim: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 300)
      .select(col("doc_id"), (lit(64) + (col("doc_id") * 3) % 200).cast("int").as("len"))
    docs.select(col("doc_id"),
        graft.functions.Wav.vadTrimUdf(
          graft.functions.Wav.synthPcmUdf(lit(16000), col("len"))).as("vt"))
      .select(col("doc_id"),
        col("vt._1").as("n_frames"), col("vt._2").as("n_voiced"),
        col("vt._3").as("first_voiced"), col("vt._4").as("last_voiced"),
        when(col("vt._2") > 0, (col("vt._4") - col("vt._3") + 1) * 16)
          .otherwise(0).as("kept_samples"))
  }
  val audioVadTrimSql =
    """WITH d AS (SELECT doc_id, 64 + (doc_id*3) % 200 AS len
      |           FROM documents WHERE doc_id < 300),
      |f AS (SELECT doc_id, len // 16 AS n_frames FROM d),
      |v AS (SELECT doc_id, n_frames, list_filter(range(n_frames), fr ->
      |    list_sum(list_transform(range(fr*16, fr*16 + 16), i ->
      |      abs((i*2654435761) % 65536 - 32768))) >= 262144) AS voiced FROM f)
      |SELECT doc_id, CAST(n_frames AS INT) AS n_frames,
      |  CAST(len(voiced) AS INT) AS n_voiced,
      |  CAST(CASE WHEN len(voiced) = 0 THEN -1 ELSE voiced[1] END AS INT) AS first_voiced,
      |  CAST(CASE WHEN len(voiced) = 0 THEN -1 ELSE voiced[len(voiced)] END AS INT) AS last_voiced,
      |  CAST(CASE WHEN len(voiced) = 0 THEN 0
      |       ELSE (voiced[len(voiced)] - voiced[1] + 1) * 16 END AS INT) AS kept_samples
      |FROM v""".stripMargin

  /** The audio-curation pipeline END TO END in one kernel pass
    * ([[graft.functions.Wav.pcm16Curate]]): real PCM decode → energy-gate
    * VAD trim → nearest-index resample of the kept span to 4 kHz → RMS of
    * the final signal — the audio twin of `pipeline_quality_filter` (the
    * per-file chain every speech-data pipeline runs before featurization),
    * with source rates cycling 8/12/16/20 kHz so the trim arithmetic and
    * the decimation stride interact per row. Integer-exact throughout; the
    * oracle replays the full chain (voiced set → span → index map → RMS).
    * Scale shape: ONE narrow scan+UDF pass, no exchange at all. */
  val pipelineAudioCurate: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 300)
      .select(col("doc_id"),
        (lit(8000) + (col("doc_id") % 4) * 4000).cast("int").as("sr"),
        (lit(64) + (col("doc_id") * 5) % 320).cast("int").as("len"))
    docs.select(col("doc_id"),
        graft.functions.Wav.curateUdf(
          graft.functions.Wav.synthPcmUdf(col("sr"), col("len")), lit(4000)).as("cu"))
      .select(col("doc_id"),
        col("cu._1").as("n_frames"), col("cu._2").as("n_voiced"),
        col("cu._3").as("kept_samples"), col("cu._4").as("n_out"),
        round(col("cu._5"), 4).as("rms"))
  }
  val pipelineAudioCurateSql =
    """WITH d AS (SELECT doc_id, CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sr,
      |                  CAST(64 + (doc_id * 5) % 320 AS INT) AS len
      |           FROM documents WHERE doc_id < 300),
      |f AS (SELECT doc_id, sr, len // 16 AS n_frames FROM d),
      |v AS (SELECT doc_id, sr, n_frames, list_filter(range(n_frames), fr ->
      |    list_sum(list_transform(range(fr*16, fr*16 + 16), i ->
      |      abs((i*2654435761) % 65536 - 32768))) >= 262144) AS voiced FROM f),
      |s AS (SELECT doc_id, sr, n_frames, len(voiced) AS nv,
      |        CASE WHEN len(voiced) = 0 THEN 0 ELSE voiced[1]*16 END AS span_start,
      |        CASE WHEN len(voiced) = 0 THEN 0
      |             ELSE (voiced[len(voiced)] - voiced[1] + 1) * 16 END AS span
      |      FROM v),
      |r AS (SELECT doc_id, sr, n_frames, nv, span_start, span,
      |        (span * 4000) // sr AS n_out FROM s)
      |SELECT doc_id, CAST(n_frames AS INT) AS n_frames, CAST(nv AS INT) AS n_voiced,
      |  CAST(span AS INT) AS kept_samples, CAST(n_out AS INT) AS n_out,
      |  CASE WHEN n_out = 0 THEN 0.0 ELSE
      |    round(sqrt(CAST(list_sum(list_transform(range(n_out), i ->
      |      ((span_start + (i*sr) // 4000) * 2654435761 % 65536 - 32768)
      |        * ((span_start + (i*sr) // 4000) * 2654435761 % 65536 - 32768))) AS DOUBLE) / n_out), 4)
      |  END AS rms
      |FROM r""".stripMargin

  /** Image near-duplicate detection end to end — the IMAGE twin of
    * `audio_fingerprint`: synthesize per-doc BMPs (content keyed by
    * `doc_id % 40` — distinct seeded images, each present in ~7 copies
    * here), run the REAL DIB decode + 8×8 average-hash perceptual
    * fingerprint ([[graft.functions.Bmp.ahash63]] — brightness-relative
    * bits, invariant under uniform brightness shift), and group by print.
    * The oracle replays the seeded pixel formulas and the integer
    * cross-multiplied mean comparison. Scale shape: one narrow
    * decode+hash pass, then one map-side-combining groupBy on an 8-byte
    * key — `dedup_sha256`'s shuffle profile with a CONTENT-derived key. */
  val dedupImagePhash: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 300)
      .select(col("doc_id"), (col("doc_id") % 40).cast("long").as("seed"))
    docs.select(col("doc_id"),
        graft.functions.Bmp.ahashUdf(
          graft.functions.Bmp.synthSeededUdf(lit(16), lit(12), col("seed"))).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_id"))
      .filter(col("n_copies") >= 2)
  }
  val dedupImagePhashSql =
    """WITH d AS (SELECT doc_id, doc_id % 40 AS seed
      |           FROM documents WHERE doc_id < 300),
      |g AS (SELECT doc_id, list_transform(range(64), k ->
      |      ((31*(2*(k%8)) + 17*((k//8)*12//8) + 7 + 5*seed) % 256)
      |    + ((13*(2*(k%8)) + 29*((k//8)*12//8) + 11 + 5*seed) % 256)
      |    + ((7*(2*(k%8)) + 23*((k//8)*12//8) + 13 + 5*seed) % 256)) AS s FROM d),
      |t AS (SELECT doc_id, s, list_sum(s) AS total FROM g),
      |fp AS (SELECT doc_id, CAST(coalesce(list_sum(list_transform(range(63), k ->
      |      CASE WHEN s[k+1]*64 > total THEN CAST(1 AS BIGINT) << CAST(k AS INT)
      |           ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS fp FROM t)
      |SELECT fp, count(*) AS n_copies, min(doc_id) AS canonical_id
      |FROM fp GROUP BY fp HAVING count(*) >= 2""".stripMargin

  /** Interleaved multimodal sample assembly — the MMC4/OBELICS dataset
    * builder: attach each media item (the embeddings table stands in as
    * the media registry: id + features + label) to its parent document and
    * pack the attachments into deterministically-ordered per-document
    * lists, one training sample per row. Attachment rule is the fixture's
    * synthetic FK `doc_id = (vec_id * 7) mod 500` (every registry row maps
    * to a stable document at every sf).
    *
    * Scale shape: one exchange per side on the document key, and the
    * pack-to-list agg REUSES the join's output partitioning (groupBy key
    * == join key, no third exchange). Item payloads would ride the same
    * rows in production; only doc-key + item columns shuffle here. Lists
    * are sorted by item id, so output is partitioning-independent, and
    * emitted as JSON TEXT (house rule: the driver comparator hashes
    * scalar columns only — see `agg_collect`). */
  val mmInterleave: Q = (s, dir) => {
    val docs = table(s, dir, "documents")
      .filter(col("doc_id") < 500).select(col("doc_id"))
    val items = table(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), ((col("vec_id") * 7) % 500).as("doc_id"))
    docs.join(items, Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_items"),
        sort_array(collect_list(struct(col("vec_id"), col("label")))).as("pk"))
      .select(col("doc_id"), col("n_items"),
        to_json(col("pk.vec_id")).as("item_ids"),
        to_json(col("pk.label")).as("item_labels"))
  }
  val mmInterleaveSql =
    """SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(to_json(list(e.vec_id ORDER BY e.vec_id)) AS VARCHAR) AS item_ids,
      |  CAST(to_json(list(e.label ORDER BY e.vec_id)) AS VARCHAR) AS item_labels
      |FROM documents d JOIN embeddings e ON d.doc_id = (e.vec_id * 7) % 500
      |WHERE d.doc_id < 500
      |GROUP BY d.doc_id""".stripMargin

  /** REAL PNG decode through the multimodal kernel — the third image
    * container and the first with true ENTROPY DECODING
    * ([[graft.functions.Png]]: IHDR parse, IDAT zlib inflate, full
    * scanline unfiltering). Fixtures are seeded greyscale PNGs whose
    * pixel formula is the BMP fixture's r-channel, so the oracle's mean
    * expression is shared; width/height flow through the kernel's real
    * container parse, the channel mean through the full
    * decompress-and-reconstruct pass. */
  val mmDecodePng: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        (lit(8) + col("doc_id") % 9).cast("int").as("w"),
        (lit(6) + col("doc_id") % 7).cast("int").as("h"),
        (col("doc_id") % 40).as("seed"))
    val png = docs.select(col("doc_id"), col("seed"),
      graft.functions.Png.synthSeededUdf(col("w"), col("h"), col("seed")).as("payload"))
    Multimodal.decodeBinary(png, "payload")
      .select(col("doc_id"), col("payload"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"))
      .withColumn("st", graft.functions.Png.statsUdf(col("payload")))
      .select(col("doc_id"), col("width"), col("height"),
        round(col("st.sum_r").cast("double") / (col("width") * col("height")), 4)
          .as("mean_gray"))
  }
  val mmDecodePngSql =
    """WITH d AS (SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
      |                  CAST(6 + doc_id % 7 AS INT) AS h,
      |                  doc_id % 40 AS seed
      |           FROM documents WHERE doc_id < 200)
      |SELECT doc_id, w AS width, h AS height,
      |  round(CAST(list_sum(list_transform(range(h), y -> list_sum(
      |    list_transform(range(w), x -> (7*x + 23*y + 13 + 5*seed) % 256)))) AS DOUBLE)
      |    / (w*h), 4) AS mean_gray
      |FROM d""".stripMargin

  /** REAL baseline JPEG decode through the multimodal kernel — the third
    * image family, with HUFFMAN entropy decoding ([[graft.functions.Jpeg]]:
    * marker walk, standard Annex-K Huffman tables, 0xFF00 unstuffing, DC
    * differential EXTEND, dequant, full 8×8 IDCT). Fixtures are
    * block-constant greyscale with even levels and a flat quant table, so
    * the lossy pipeline is bit-exact end to end and the oracle states the
    * decoded mean in closed form over the block grid. */
  val mmDecodeJpeg: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        (lit(1) + col("doc_id") % 4).cast("int").as("wb"),
        (lit(1) + col("doc_id") % 3).cast("int").as("hb"),
        (col("doc_id") % 40).as("seed"))
    val jpg = docs.select(col("doc_id"), col("wb"), col("hb"),
      graft.functions.Jpeg.synthSeededUdf(col("wb"), col("hb"), col("seed")).as("payload"))
    Multimodal.decodeBinary(jpg, "payload")
      .select(col("doc_id"), col("payload"), col("wb"), col("hb"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"))
      .withColumn("st", graft.functions.Jpeg.statsUdf(col("payload")))
      .select(col("doc_id"), col("width"), col("height"),
        round(col("st.sum_r").cast("double") / (col("width") * col("height")), 4)
          .as("mean_gray"))
  }
  val mmDecodeJpegSql =
    """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 4 AS INT) AS wb,
      |                  CAST(1 + doc_id % 3 AS INT) AS hb,
      |                  doc_id % 40 AS seed
      |           FROM documents WHERE doc_id < 200)
      |SELECT doc_id, 8 * wb AS width, 8 * hb AS height,
      |  round(CAST(list_sum(list_transform(range(hb), by -> list_sum(
      |    list_transform(range(wb), bx -> 2 * ((7*bx + 23*by + 13 + 5*seed) % 128)))))
      |    AS DOUBLE) / (wb * hb), 4) AS mean_gray
      |FROM d""".stripMargin

  /** REAL GIF decode through the multimodal kernel — the fourth image
    * container and the third entropy coder ([[graft.functions.Gif]]: LZW
    * with variable-width LSB-first codes, dictionary growth/CLEAR/KwKwK,
    * sub-block reassembly, palette expansion). The fixture synthesizer is
    * a real greedy LZW compressor over the PNG fixture's pixel formula, so
    * the oracle's closed-form mean is shared with [[mmDecodePng]] while the
    * kernel exercises a genuinely compressed stream. */
  val mmDecodeGif: Q = (s, dir) => {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        (lit(8) + col("doc_id") % 9).cast("int").as("w"),
        (lit(6) + col("doc_id") % 7).cast("int").as("h"),
        (col("doc_id") % 40).as("seed"))
    val gif = docs.select(col("doc_id"), col("seed"),
      graft.functions.Gif.synthSeededUdf(col("w"), col("h"), col("seed")).as("payload"))
    Multimodal.decodeBinary(gif, "payload")
      .select(col("doc_id"), col("payload"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"))
      .withColumn("st", graft.functions.Gif.statsUdf(col("payload")))
      .select(col("doc_id"), col("width"), col("height"),
        round(col("st.sum_r").cast("double") / (col("width") * col("height")), 4)
          .as("mean_gray"))
  }
  val mmDecodeGifSql =
    """WITH d AS (SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
      |                  CAST(6 + doc_id % 7 AS INT) AS h,
      |                  doc_id % 40 AS seed
      |           FROM documents WHERE doc_id < 200)
      |SELECT doc_id, w AS width, h AS height,
      |  round(CAST(list_sum(list_transform(range(h), y -> list_sum(
      |    list_transform(range(w), x -> (7*x + 23*y + 13 + 5*seed) % 256)))) AS DOUBLE)
      |    / (w*h), 4) AS mean_gray
      |FROM d""".stripMargin

  /** REAL G.711 companded-audio decode ([[graft.functions.G711]]): µ-law
    * and A-law WAVs (format tags 7/6) expanded to linear PCM through the
    * true ITU segment/mantissa formulas — the seventh audio family and the
    * first companded one. Codes-first fixtures keep synthesis trivial while
    * the decode side runs the full expansion; everything is integer, so
    * the oracle recomputes the exact decoded sums (the SQL twins of the
    * expanders live NEXT TO the Scala ones in G711.scala). One narrow
    * kernel pass per row, no exchange until the bounded output. */
  val audioG711Decode: Q = (s, dir) => {
    import graft.functions.G711
    val docs = table(s, dir, "documents").filter(col("doc_id") < 150)
      .select(col("doc_id"),
        (lit(50) + col("doc_id") % 100).cast("int").as("n"),
        (col("doc_id") % 40).as("seed"))
    docs
      .withColumn("mu", G711.decodeUdf(
        G711.synthUdf(lit(G711.MuLaw), lit(8000), col("n"), col("seed"))))
      .withColumn("al", G711.decodeUdf(
        G711.synthUdf(lit(G711.ALaw), lit(8000), col("n"), col("seed"))))
      .select(col("doc_id"), col("mu._3").as("n_samples"),
        col("mu._4").as("ulaw_sum_abs"), col("mu._5").as("ulaw_sum"),
        col("al._4").as("alaw_sum_abs"), col("al._5").as("alaw_sum"))
  }
  val audioG711DecodeSql = {
    import graft.functions.G711
    val code = "(37 * i + 11 + 5 * seed) % 256"
    val u = G711.ulawSql(code); val a = G711.alawSql(code)
    s"""WITH d AS (SELECT doc_id, CAST(50 + doc_id % 100 AS INT) AS n,
       |                  doc_id % 40 AS seed
       |           FROM documents WHERE doc_id < 150)
       |SELECT doc_id, CAST(n AS INT) AS n_samples,
       |  CAST(list_sum(list_transform(range(n), i -> abs($u))) AS BIGINT) AS ulaw_sum_abs,
       |  CAST(list_sum(list_transform(range(n), i -> $u)) AS BIGINT) AS ulaw_sum,
       |  CAST(list_sum(list_transform(range(n), i -> abs($a))) AS BIGINT) AS alaw_sum_abs,
       |  CAST(list_sum(list_transform(range(n), i -> $a)) AS BIGINT) AS alaw_sum
       |FROM d""".stripMargin
  }

  /** REAL IMA ADPCM decode ([[graft.functions.Adpcm]]): the PREDICTIVE
    * codec discipline — 4-bit adaptive-delta codes folded through the
    * standard 89-entry step table, block headers re-seeding the state.
    * The oracle replays the sequential fold exactly as a DuckDB
    * `list_reduce` over struct state generated from the same tables
    * (Adpcm.blockFoldSql, adjacent to the Scala step). Blocks are the
    * parallel unit at scale; the kernel runs one narrow pass. */
  val audioAdpcmDecode: Q = (s, dir) => {
    import graft.functions.Adpcm
    val docs = table(s, dir, "documents").filter(col("doc_id") < 150)
      .select(col("doc_id"), (lit(1) + col("doc_id") % 3).cast("int").as("nb"))
    docs
      .withColumn("d", Adpcm.decodeUdf(
        Adpcm.synthUdf(lit(8000), col("nb"), col("doc_id"))))
      .select(col("doc_id"), col("d._2").as("n_samples"),
        col("d._3").as("sum_abs"), col("d._4").as("sum_linear"))
  }
  val audioAdpcmDecodeSql = {
    val fold = graft.functions.Adpcm.blockFoldSql("doc_id", "b")
    s"""WITH d AS (SELECT doc_id, CAST(1 + doc_id % 3 AS INT) AS nb
       |           FROM documents WHERE doc_id < 150)
       |SELECT doc_id, CAST(nb * 17 AS INT) AS n_samples,
       |  CAST(list_sum(list_transform(range(nb), b -> ($fold).ta)) AS BIGINT) AS sum_abs,
       |  CAST(list_sum(list_transform(range(nb), b -> ($fold).t)) AS BIGINT) AS sum_linear
       |FROM d""".stripMargin
  }

  /** Long-audio TIME-WINDOW segmentation ([[graft.functions.Adpcm.chunkStats]])
    * — `text_chunk`'s audio twin: each fixture stream splits into
    * consecutive 2-block (34-sample) windows, each decoded INDEPENDENTLY
    * because ADPCM block headers re-seed the predictor — the property
    * that makes a byte-range task at 100 TB self-sufficient. One narrow
    * kernel pass per file, then a per-row explode into segment rows
    * (no shuffle, linear in corpus size); the oracle replays each
    * chunk's block folds via the shared [[graft.functions.Adpcm.blockFoldSql]]
    * generator. */
  val audioChunkSegments: Q = (s, dir) => {
    import graft.functions.Adpcm
    val docs = table(s, dir, "documents").filter(col("doc_id") < 120)
      .select(col("doc_id"), (lit(2) + col("doc_id") % 5).cast("int").as("nb"))
    docs
      .withColumn("ch", explode(Adpcm.chunkUdf(
        Adpcm.synthUdf(lit(8000), col("nb"), col("doc_id")), lit(2))))
      .select(col("doc_id"), col("ch.chunk_id").as("chunk_id"),
        col("ch.start_sample").as("start_sample"),
        col("ch.n_samples").as("n_samples"),
        col("ch.sum_abs").as("sum_abs"),
        col("ch.sum_linear").as("sum_linear"))
  }
  val audioChunkSegmentsSql = {
    val fold = graft.functions.Adpcm.blockFoldSql("doc_id", "b")
    s"""WITH d AS (SELECT doc_id, CAST(2 + doc_id % 5 AS INT) AS nb
       |           FROM documents WHERE doc_id < 120),
       |c AS (SELECT doc_id, nb, unnest(range((nb + 1) // 2)) AS chunk_id FROM d)
       |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       |  CAST(chunk_id * 34 AS BIGINT) AS start_sample,
       |  CAST((least(chunk_id * 2 + 2, nb) - chunk_id * 2) * 17 AS INT) AS n_samples,
       |  CAST(list_sum(list_transform(range(chunk_id * 2, least(chunk_id * 2 + 2, nb)),
       |    b -> ($fold).ta)) AS BIGINT) AS sum_abs,
       |  CAST(list_sum(list_transform(range(chunk_id * 2, least(chunk_id * 2 + 2, nb)),
       |    b -> ($fold).t)) AS BIGINT) AS sum_linear
       |FROM c""".stripMargin
  }

  /** VIDEO-modality frame sampling on a REAL multi-frame container:
    * animated GIF (89a graphic-control layout), every frame decoded
    * through the full LZW pipeline, then every 2nd frame sampled — the
    * frame-extraction shape of video curation (decode → sample → score),
    * with the generic [[mmFrameSample]]'s stub decode replaced by an
    * honest one. Per-asset work is bounded by frames × pixels; the plan
    * is one narrow kernel pass. */
  val mmFrameSampleGif: Q = (s, dir) => {
    import graft.functions.Gif
    val docs = table(s, dir, "documents").filter(col("doc_id") < 150)
      .select(col("doc_id"),
        (lit(6) + col("doc_id") % 5).cast("int").as("w"),
        (lit(4) + col("doc_id") % 4).cast("int").as("h"),
        (lit(2) + col("doc_id") % 5).cast("int").as("nf"),
        (col("doc_id") % 40).as("seed"))
    docs
      .withColumn("fr", Gif.framesUdf(
        Gif.synthAnimUdf(col("w"), col("h"), col("nf"), col("seed"))))
      .withColumn("sampled", expr("filter(fr, (x, i) -> i % 2 = 0)"))
      .select(col("doc_id"), size(col("fr")).as("n_frames"),
        size(col("sampled")).as("n_sampled"),
        round(expr("aggregate(sampled, 0L, (a, x) -> a + x._3)").cast("double")
          / (size(col("sampled")) * col("w") * col("h")), 4).as("mean_sampled"))
  }
  val mmFrameSampleGifSql =
    """WITH d AS (SELECT doc_id, CAST(6 + doc_id % 5 AS INT) AS w,
      |                  CAST(4 + doc_id % 4 AS INT) AS h,
      |                  CAST(2 + doc_id % 5 AS INT) AS nf,
      |                  doc_id % 40 AS seed
      |           FROM documents WHERE doc_id < 150)
      |SELECT doc_id, nf AS n_frames, CAST((nf + 1) // 2 AS INT) AS n_sampled,
      |  round(CAST(list_sum(list_transform(list_filter(range(nf), f -> f % 2 = 0),
      |      f -> list_sum(list_transform(range(h), y -> list_sum(
      |        list_transform(range(w), x -> (7*x + 23*y + 11*f + 5*seed) % 256))))))
      |    AS DOUBLE) / (((nf + 1) // 2) * w * h), 4) AS mean_sampled
      |FROM d""".stripMargin

  /** VIDEO frame sampling on the SECOND real multi-frame container:
    * RIFF/AVI with an MJPEG payload train ([[graft.functions.Avi]] — the
    * container family the reference already speaks for audio,
    * `/root/reference/src/main.rs:586-607` walks the same fourcc/chunk
    * discipline for WAV `fmt `). Every 2nd frame rides the FULL baseline
    * JPEG entropy pipeline ([[graft.functions.Jpeg]]: Annex-K Huffman,
    * EXTEND, dequant, IDCT); frame f carries seed `seed + f`, so the
    * oracle states each sampled frame's decoded block-grid mean in closed
    * form (the [[mmDecodeJpeg]] formula shifted per frame). One
    * count-and-sample kernel pass per row — unsampled frames never leave
    * the kernel, and the whole video reduces to a few stat structs before
    * any exchange. */
  val mmFrameSampleAvi: Q = (s, dir) => {
    import graft.functions.Avi
    val docs = table(s, dir, "documents").filter(col("doc_id") < 150)
      .select(col("doc_id"),
        (lit(1) + col("doc_id") % 4).cast("int").as("wb"),
        (lit(1) + col("doc_id") % 3).cast("int").as("hb"),
        (lit(2) + col("doc_id") % 5).cast("int").as("nf"),
        (col("doc_id") % 40).as("seed"))
    docs
      .withColumn("st", Avi.sampleUdf(
        Avi.synthUdf(col("wb"), col("hb"), col("nf"), col("seed")), lit(2)))
      .select(col("doc_id"), col("st._1").as("n_frames"),
        size(col("st._2")).as("n_sampled"),
        round(expr("aggregate(st._2, 0L, (a, x) -> a + x.sumGray)").cast("double")
          / (size(col("st._2")) * col("wb") * col("hb") * lit(64)), 4)
          .as("mean_sampled"))
  }
  val mmFrameSampleAviSql =
    """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 4 AS INT) AS wb,
      |                  CAST(1 + doc_id % 3 AS INT) AS hb,
      |                  CAST(2 + doc_id % 5 AS INT) AS nf,
      |                  doc_id % 40 AS seed
      |           FROM documents WHERE doc_id < 150)
      |SELECT doc_id, nf AS n_frames, CAST((nf + 1) // 2 AS INT) AS n_sampled,
      |  round(CAST(list_sum(list_transform(list_filter(range(nf), f -> f % 2 = 0),
      |      f -> list_sum(list_transform(range(hb), by -> list_sum(
      |        list_transform(range(wb), bx ->
      |          2 * ((7*bx + 23*by + 13 + 5*(seed+f)) % 128)))))))
      |    AS DOUBLE) / (((nf + 1) // 2) * wb * hb), 4) AS mean_sampled
      |FROM d""".stripMargin

  def defs: Map[String, (Q, Option[String])] = Map(
    "mm_interleave" -> (mmInterleave, Some(mmInterleaveSql)),
    "mm_frame_sample_avi" -> (mmFrameSampleAvi, Some(mmFrameSampleAviSql)),
    "audio_chunk_segments" -> (audioChunkSegments, Some(audioChunkSegmentsSql)),
    "audio_g711_decode" -> (audioG711Decode, Some(audioG711DecodeSql)),
    "audio_adpcm_decode" -> (audioAdpcmDecode, Some(audioAdpcmDecodeSql)),
    "mm_frame_sample_gif" -> (mmFrameSampleGif, Some(mmFrameSampleGifSql)),
    "mm_decode_png" -> (mmDecodePng, Some(mmDecodePngSql)),
    "mm_decode_jpeg" -> (mmDecodeJpeg, Some(mmDecodeJpegSql)),
    "mm_decode_gif" -> (mmDecodeGif, Some(mmDecodeGifSql)),
    "audio_fingerprint" -> (audioFingerprint, Some(audioFingerprintSql)),
    "dedup_image_phash" -> (dedupImagePhash, Some(dedupImagePhashSql)),
    "pipeline_audio_curate" -> (pipelineAudioCurate, Some(pipelineAudioCurateSql)),
    "audio_resample" -> (audioResample, Some(audioResampleSql)),
    "audio_vad_trim" -> (audioVadTrim, Some(audioVadTrimSql)),
    "mm_decode_bmp" -> (mmDecodeBmp, Some(mmDecodeBmpSql)),
    "mm_decode_ppm" -> (mmDecodePpm, Some(mmDecodePpmSql)),
    "mm_image_resize" -> (mmImageResize, Some(mmImageResizeSql)),
    "mm_decode" -> (mmDecode, Some(mmDecodeSql)),
    "mm_decode_wav" -> (mmDecodeWav, Some(mmDecodeWavSql)),
    "mm_decode_flac" -> (mmDecodeFlac, Some(mmDecodeFlacSql)),
    "mm_decode_ogg" -> (mmDecodeOgg, Some(mmDecodeOggSql)),
    "mm_decode_mp3" -> (mmDecodeMp3, Some(mmDecodeMp3Sql)),
    "mm_decode_aiff" -> (mmDecodeAiff, Some(mmDecodeAiffSql)),
    "mm_decode_adts" -> (mmDecodeAdts, Some(mmDecodeAdtsSql)),
    "audio_frame_energy" -> (audioFrameEnergy, Some(audioFrameEnergySql)),
    "mm_frame_sample" -> (mmFrameSample, Some(mmFrameSampleSql)),
  )
}
