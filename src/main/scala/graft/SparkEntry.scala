package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, CdcQueries, Inference, PipelineOps, PropertyChecks, QueryDef, Relational, TpchShapes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory = SURVEY §2 reference-parity operators (graft.queries
  * .Relational) + north-star pipeline operators (graft.queries.PipelineOps).
  * Streaming forms of the CDC operators live in graft.cdc with ScalaTest
  * coverage; the entries here are their deterministic batch equivalents so
  * the DuckDB oracle can grade them.
  */
object SparkEntry {
  val all: Seq[QueryDef] =
    Relational.defs ++ TpchShapes.defs ++ PipelineOps.defs ++ CdcQueries.defs ++
      PropertyChecks.defs ++ Analytics.defs ++ Inference.defs

  /** Flagship query (reference CustomJob.java:194 analog: live count per key
    * over the compacted changelog) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("t5_changelog_count")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (hash
    * signatures not reproducible in DuckDB) → driver does rows-only check. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
