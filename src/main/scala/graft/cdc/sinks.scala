package graft.cdc

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Sinks mirroring the reference's two output paths. */
object Sinks {

  /** K1: keyed-JSON wire format (reference Pulsar sink, CustomJob.java:
    * 93-118): message key = event key bytes, value = JSON of the typed
    * event. Returns a two-column DataFrame `(key, value)` ready for any
    * Kafka-shaped `writeStream` sink; at-least-once under micro-batch
    * replay, as in the reference (PulsarSinkSemantic.AT_LEAST_ONCE :103). */
  def keyedJson[T](events: Dataset[T], fields: Seq[String]): DataFrame =
    events.toDF().select(
      col("key").cast("string").as("key"),
      to_json(struct(fields.map(col): _*)).as("value"))

  /** K2: JDBC upsert writer (reference CustomJob.java:183-193 +
    * setup_sink_db1.sql). Spark's jdbc writer has no upsert, so this is a
    * `foreachBatch` writer: each micro-batch becomes one `INSERT ... ON
    * CONFLICT (pk) DO UPDATE` statement batch — idempotent by PK, so
    * at-least-once replay is safe (reference's effective semantics).
    *
    * No Postgres exists in this container: `apply` renders the SQL that a
    * JDBC connection would execute, and [[MemoryUpsertTable]] gives specs a
    * real observable sink with the same PK-upsert contract.
    */
  final class UpsertWriter(table: String, pk: String, columns: Seq[String]) {
    def upsertSql: String = {
      val collist = columns.mkString(", ")
      val placeholders = columns.map(_ => "?").mkString(", ")
      val sets = columns.filterNot(_ == pk)
        .map(c => s"$c = EXCLUDED.$c").mkString(", ")
      s"INSERT INTO $table ($collist) VALUES ($placeholders) " +
        s"ON CONFLICT ($pk) DO UPDATE SET $sets"
    }

    /** foreachBatch body against an in-memory PK table. */
    def writeBatch(batch: DataFrame, target: MemoryUpsertTable): Unit = {
      val cols = columns
      val k = pk
      // One upsert per row of the micro-batch output. In the JDBC
      // deployment this is executeBatch of `upsertSql`; semantics match.
      batch.select(cols.map(col): _*).collect().foreach { row =>
        val m = cols.zipWithIndex.map { case (c, i) => c -> row.get(i) }.toMap
        target.upsert(m(k).toString, m)
      }
    }
  }

  /** PK-keyed in-memory table with upsert semantics (test stand-in for the
    * Postgres sink table user_count_by_pgschema, setup_sink_db1.sql:1-4). */
  final class MemoryUpsertTable {
    private val rows = new ConcurrentHashMap[String, Map[String, Any]]()
    def upsert(key: String, row: Map[String, Any]): Unit = rows.put(key, row)
    def delete(key: String): Unit = rows.remove(key)
    def snapshot: Map[String, Map[String, Any]] = rows.asScala.toMap
  }
}
