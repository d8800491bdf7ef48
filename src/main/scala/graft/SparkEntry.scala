package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full verification surface: every operator from
  * SURVEY.md §2 plus the LLM-data-pipeline operators, each paired (where SQL
  * can express it) with a DuckDB oracle in [[oracleSql]]. Implementations
  * live in graft.queries.*, grouped by family.
  */
object SparkEntry {

  private val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    ReferenceOps.defs ++ MetadataOps.defs ++ SinkOps.defs ++ Analytics.defs ++ TpchOps.defs ++
      TextOps.defs ++ VectorOps.defs ++ MultimodalOps.defs ++ LakeOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, (q, _)) => k -> q }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, (_, Some(sql))) => k -> sql }
}
