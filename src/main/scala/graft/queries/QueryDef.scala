package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate query: a Spark build plus (when SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables.
  *
  * Determinism contract (driver hashes values after sorting columns by name):
  *  - every query ends with a total ORDER BY on a unique key prefix, mirrored
  *    in the oracle;
  *  - float aggregates are computed in DECIMAL (exact, associative) and cast
  *    to a fixed precision/scale on both sides;
  *  - no raw sub-second timestamps in outputs (bucketed times are emitted as
  *    'yyyy-MM-dd HH:mm:ss' strings, whole days as DATE);
  *  - counts/sizes are cast to BIGINT on both sides (Spark `size()` is INT,
  *    DuckDB `len()` is BIGINT).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Helper: register the sf-dir tables then build from temp views. */
  def views(name: String, oracle: String)(
      f: SparkSession => DataFrame): QueryDef =
    QueryDef(name, (spark, dir) => {
      graft.Tables.registerAll(spark, dir)
      f(spark)
    }, Option(oracle).filter(_.nonEmpty))
}
