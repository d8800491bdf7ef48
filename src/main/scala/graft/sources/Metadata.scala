package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.immutable.{SortedMap, TreeMap}
import scala.jdk.CollectionConverters._

/** Sidecar metadata subsystem (reference: src/main.rs:144-386).
  *
  * A metadata sidecar (CSV or JSONL) keys rows by `relative_path` and/or
  * `file_name`. The load fixes the output schema BEFORE the audio scan runs:
  *   - CSV: every non-reserved column is String (src/main.rs:309-314);
  *   - JSONL: per-value inference with the [[graft.core.MetadataType]] lattice
  *     merged across ALL rows — including rows later dropped for having no key
  *     (types-still-counted quirk, src/main.rs:321 / :376-380);
  *   - reserved keys `duration`/`audio`/`id` dropped (src/main.rs:245-247);
  *   - `transcription` always present, defaulting to "-" (src/main.rs:159-164);
  *   - duplicate keys: FIRST occurrence in file order wins (src/main.rs:178-193).
  *
  * Scale note: the sidecar is the small side of a broadcast join, but nothing
  * here materializes it on the driver except the inferred schema (a per-key
  * type vote reduced with `reduce` — bytes, not rows), so a multi-GB sidecar
  * still loads as a distributed DataFrame.
  */
object Metadata {

  sealed trait Format
  case object Csv extends Format
  case object Jsonl extends Format
  case object ParquetMeta extends Format

  /** reference: metadata_format_from_path, src/main.rs:266-277 —
    * `.jsonl`/`.json` → JSONL, anything else (incl. no extension) → CSV.
    * Engine extension: `.parquet` sidecars (large manifests) load natively. */
  def formatFromPath(path: String): Format = {
    val ext = path.split('.').lastOption.map(_.toLowerCase).getOrElse("")
    if (ext == "jsonl" || ext == "json") Jsonl
    else if (ext == "parquet") ParquetMeta
    else Csv
  }

  final case class MetaSchema(types: SortedMap[String, MetadataType]) {
    /** Sorted metadata keys; always includes transcription (src/main.rs:159-164). */
    def keys: Seq[String] = types.keys.toSeq
    def sparkFields: Seq[StructField] =
      types.map { case (k, t) => StructField(k, t.toSpark, nullable = true) }.toSeq
  }

  private def withTranscription(m: Map[String, MetadataType]): MetaSchema = {
    val base = m -- MetadataType.reservedKeys -- Seq("file_name", "relative_path")
    MetaSchema(TreeMap.empty[String, MetadataType] ++ base + ("transcription" -> MString))
  }

  /** Distributed JSONL type-inference pre-pass: one vote map per line, merged
    * with the reference lattice. Runs over ALL object lines (keyless rows
    * still vote — the F6 quirk). Equivalent to a treeAggregate; the data that
    * reaches the driver is one Map[String, MetadataType].
    */
  def inferJsonlSchema(spark: SparkSession, path: String): MetaSchema = {
    // RDD (java-serialized) rather than Dataset: the vote values are the
    // MetadataType ADT, which needs no Spark encoder on this reduce-to-driver path.
    val votes: Map[String, MetadataType] = spark.read.textFile(path).rdd
      .map { line =>
        val t = line.trim
        if (t.isEmpty) Map.empty[String, Option[MetadataType]]
        else {
          val node = try new ObjectMapper().readTree(t) catch { case _: Throwable => null }
          if (node == null || !node.isObject) Map.empty[String, Option[MetadataType]]
          else node.properties().asScala.map { e =>
            e.getKey -> MetadataType.inferJson(e.getValue)
          }.toMap
        }
      }
      // fold, not reduce: an EMPTY sidecar must yield the transcription-only
      // schema (the reference treats it as an empty store), not crash
      .fold(Map.empty[String, Option[MetadataType]]) { (a, b) =>
        (a.keySet ++ b.keySet).map { k =>
          val merged = (a.get(k).flatten, b.get(k).flatten) match {
            case (Some(x), Some(y)) => Some(x.merge(y))
            case (x, y)             => x.orElse(y)
          }
          k -> merged
        }.toMap
      }
      .collect { case (k, Some(t)) => k -> t }.toMap
    withTranscription(votes)
  }

  /** CSV schema = header columns, all String (src/main.rs:309-314). */
  def inferCsvSchema(spark: SparkSession, path: String): MetaSchema = {
    val header = spark.read.option("header", true).csv(path).columns
    withTranscription(header.map(_ -> (MString: MetadataType)).toMap)
  }

  private val mapper = new ObjectMapper()

  /** Load the sidecar into a DataFrame with columns
    * `relative_path, file_name, _meta_line, <metadata keys...>` conforming to
    * `schema`. Values are coerced per the reference (P7): scalars under a
    * String-typed column render as their JSON text; list elements likewise.
    */
  def load(spark: SparkSession, path: String, fmt: Format, schema: MetaSchema): DataFrame = {
    fmt match {
      case Csv         => loadCsv(spark, path, schema)
      case Jsonl       => loadJsonl(spark, path, schema)
      case ParquetMeta => loadParquetMeta(spark, path, schema)
    }
  }

  def load(spark: SparkSession, path: String): (DataFrame, MetaSchema) = {
    val fmt = formatFromPath(path)
    val schema = fmt match {
      case Csv         => inferCsvSchema(spark, path)
      case Jsonl       => inferJsonlSchema(spark, path)
      case ParquetMeta => inferParquetSchema(spark, path)
    }
    (load(spark, path, fmt, schema), schema)
  }

  /** Parquet sidecar: types map into the lattice from the file schema itself
    * (no data pass) — numerics → Float64, booleans → Bool, arrays → List,
    * everything else → String, reserved keys dropped. */
  def inferParquetSchema(spark: SparkSession, path: String): MetaSchema = {
    def toMeta(dt: org.apache.spark.sql.types.DataType): MetadataType = dt match {
      case org.apache.spark.sql.types.BooleanType => MBool
      case t if t.isInstanceOf[org.apache.spark.sql.types.NumericType] => MFloat64
      case org.apache.spark.sql.types.ArrayType(inner, _) => MList(toMeta(inner))
      case _ => MString
    }
    val fields = spark.read.parquet(path).schema
      .filterNot(f => f.name == "file_name" || f.name == "relative_path")
      .map(f => f.name -> toMeta(f.dataType)).toMap
    withTranscription(fields)
  }

  private def loadParquetMeta(spark: SparkSession, path: String, schema: MetaSchema): DataFrame = {
    val raw = spark.read.parquet(path)
      .withColumn("_meta_line", monotonically_increasing_id())
    val have = raw.columns.toSet
    val metaCols = schema.keys.map { k =>
      val base =
        if (!have(k)) lit(null)
        else schema.types(k) match {
          case MFloat64 => col(k).cast(DoubleType)
          case MBool    => col(k).cast(BooleanType)
          case MString  => col(k).cast(StringType)
          case l: MList => col(k).cast(l.toSpark)
        }
      val c = if (k == "transcription") coalesce(base.cast(StringType), lit("-")) else base
      c.as(k)
    }
    keyCols(raw).select(
      col("relative_path") +: col("file_name") +: col("_meta_line") +: metaCols: _*)
  }

  private def keyCols(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    val rel = if (cols("relative_path")) PathNorm.normalizeCol(col("relative_path")) else lit(null).cast(StringType)
    val name = if (cols("file_name")) col("file_name") else lit(null).cast(StringType)
    df.withColumn("relative_path", rel).withColumn("file_name", name)
      // F6: rows with neither key are dropped from the join side
      // (schema votes were already counted) — src/main.rs:323-325 / :378-380.
      .filter(coalesce(col("relative_path"), col("file_name")).isNotNull)
  }

  private def loadCsv(spark: SparkSession, path: String, schema: MetaSchema): DataFrame = {
    val raw = spark.read.option("header", true).csv(path)
      .withColumn("_meta_line", monotonically_increasing_id())
    val have = raw.columns.toSet
    val metaCols = schema.keys.map { k =>
      val c =
        if (k == "transcription")
          // default injected at load time (src/main.rs:317-319)
          coalesce(if (have(k)) col(k) else lit(null).cast(StringType), lit("-"))
        else if (have(k)) col(k)
        else lit(null).cast(StringType)
      c.as(k)
    }
    keyCols(raw).select(col("relative_path") +: col("file_name") +: col("_meta_line") +: metaCols: _*)
  }

  /** JSON value → the text the reference stores under a String column (P7):
    * strings render bare, everything else as its JSON serialization. */
  private def jsonText(v: JsonNode): String =
    if (v == null || v.isNull) null
    else if (v.isTextual) v.asText()
    else v.toString

  private def convertJson(v: JsonNode, t: MetadataType): Any = t match {
    case _ if v == null || v.isNull => null
    case MString  => jsonText(v)
    case MBool    => if (v.isBoolean) v.asBoolean() else null
    case MFloat64 => if (v.isNumber) v.asDouble() else null
    case MList(inner) =>
      if (!v.isArray) null
      else v.elements().asScala.map(e => convertJson(e, inner)).toSeq
  }

  private def loadJsonl(spark: SparkSession, path: String, schema: MetaSchema): DataFrame = {
    // Parse against the driver-computed schema; blank and non-object lines are
    // skipped (src/main.rs:340-348). Distributed parse over the text RDD with
    // an explicit schema — value coercion per P7 (non-string scalars under a
    // String column render as JSON text).
    val fields = StructType(
      Seq(
        StructField("relative_path", StringType),
        StructField("file_name", StringType),
        StructField("_meta_line", LongType)) ++ schema.sparkFields)
    val types = schema.types.toSeq
    val rows = spark.read.textFile(path).rdd.zipWithIndex().flatMap { case (line, lineNo) =>
      val t = line.trim
      if (t.isEmpty) None
      else {
        val node = try mapper.readTree(t) catch { case _: Throwable => null }
        if (node == null || !node.isObject) None
        else {
          val rel = Option(node.get("relative_path")).map(jsonText).map(PathNorm.normalize).orNull
          val name = Option(node.get("file_name")).map(jsonText).orNull
          val metaVals = types.map { case (k, ty) =>
            if (k == "transcription")
              Option(node.get(k)).map(jsonText).getOrElse("-") // src/main.rs:372-374
            else convertJson(node.get(k), ty)
          }
          Some(org.apache.spark.sql.Row.fromSeq(rel +: name +: lineNo +: metaVals))
        }
      }
    }
    val parsed = spark.createDataFrame(rows, fields)
    keyCols(parsed).select(
      col("relative_path") +: col("file_name") +: col("_meta_line") +:
        schema.keys.map(col): _*)
  }

  /** J2 — first occurrence in file order wins for a given key column
    * (reference: insert_record, src/main.rs:178-193). */
  def firstWins(df: DataFrame, key: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("_meta_line"))
    df.filter(col(key).isNotNull)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** J1 — the 3-level priority metadata join (reference: metadata_for_file,
    * src/main.rs:195-209): per audio file, metadata resolves by
    *   1. by_relative_path[relpath]
    *   2. by_name[file_name]
    *   3. by_name[relpath]
    * with per-column COALESCE across the three, then `transcription` defaults
    * to "-" when no level matched (P8, src/main.rs:204-208).
    *
    * Shape: three BROADCAST left joins (sidecar ≪ corpus), so the 100 TB scan
    * never shuffles — each task resolves metadata map-side.
    */
  def joinFiles(files: DataFrame, meta: DataFrame, schema: MetaSchema): DataFrame = {
    val byRel = firstWins(meta, "relative_path")
    val byName = firstWins(meta, "file_name")
    def pick(side: DataFrame, alias: String, fileKey: Column, metaKey: String) = {
      val proj = side.select(
        col(metaKey).as(s"${alias}_key") +: schema.keys.map(k => col(k).as(s"${alias}_$k")): _*)
      (broadcast(proj), fileKey === col(s"${alias}_key"))
    }
    val (m1, c1) = pick(byRel, "m1", col("relative_path"), "relative_path")
    val (m2, c2) = pick(byName, "m2", col("file_name"), "file_name")
    val (m3, c3) = pick(byName, "m3", col("relative_path"), "file_name")
    val joined = files.join(m1, c1, "left").join(m2, c2, "left").join(m3, c3, "left")
    val matched1 = col("m1_key").isNotNull
    val matched2 = col("m2_key").isNotNull
    val resolved = schema.keys.map { k =>
      // Whole-row priority, not per-column: level 2 is consulted only when
      // level 1 missed entirely (matches the reference's map lookup).
      val c = when(matched1, col(s"m1_$k"))
        .when(matched2, col(s"m2_$k"))
        .otherwise(col(s"m3_$k"))
      val withDefault = if (k == "transcription") coalesce(c, lit("-")) else c
      withDefault.as(k)
    }
    joined.select(files.columns.map(col).toSeq ++ resolved: _*)
  }
}
