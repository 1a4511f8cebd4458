package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.{streaming => rstreaming}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Layout

/** Tail-the-snapshot-table as a stream, `format("graft-snapshot")` —
  * the DSv2 MicroBatchStream over [[graft.ops.Layout]]'s
  * manifest-committed table: offsets ARE snapshot ids, and each
  * micro-batch's input partitions are exactly the data files introduced
  * between two ids (the [[Layout.readSnapshotChanges]] planning rule:
  * exact for appends, full image for rewrites). This closes the
  * lakehouse produce/consume loop the way GraftTopic closes the keyed
  * topic's — the reference's whole topology is tail-a-changing-table
  * into a streaming job (StreamingJob.java:44-62, CDC table → stream);
  * here the table is the engine's own snapshot format, so a batch
  * writer ([[Layout.appendSnapshot]]) and a streaming consumer
  * compose without a broker. Delta calls this `startingVersion`
  * streaming; Iceberg, incremental scan.
  *
  * Scale shape: offset probes and batch planning are driver-side
  * manifest metadata (|files|-bounded text, never a data scan); row
  * reading fans out ONE partition PER DATA FILE, so a 1000-file append
  * consumes on 1000 cores. Options:
  *  - `path` (required): the snapshot table root;
  *  - `startingSnapshot` (default 0): first batch covers
  *    `(startingSnapshot, head]` — 0 replays all history;
  *  - `maxSnapshotsPerTrigger` (default 1): admission control — at
  *    most this many snapshot transitions per micro-batch, so commit
  *    boundaries stay visible to the consumer (and a restart resumes
  *    at the checkpointed id, never re-reading a consumed commit).
  *
  * Batch reads (`spark.read.format("graft-snapshot")`) serve the
  * current head (or `asOfSnapshot`) through the same per-file readers.
  * The reader decodes parquet via the parquet-hadoop Group API against
  * the MANIFEST-recorded schema — atomic types only (the table's own
  * writer records what it wrote, so a mismatch is a corrupt table, not
  * a cast decision).
  */
class GraftSnapshotProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-snapshot requires a table root: .load(<path>)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Layout.snapshotSchema(SparkSession.active, path(options))
      .getOrElse(throw new IllegalArgumentException(
        s"graft-snapshot: no committed snapshot at ${path(options)} to " +
          "infer a schema from (commit first, or pass .schema(...))"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftSnapshotTable(properties.get("path"), schema)
}

final class GraftSnapshotTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  require(path != null && path.nonEmpty,
    "graft-snapshot requires a table root: .load(<path>)")
  SnapshotFileReaderFactory.validate(tableSchema)

  override def name(): String = s"graft-snapshot:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = tableSchema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] = {
          val spark = SparkSession.active
          val to = Option(options.get("asOfSnapshot")).map(_.toInt)
            .getOrElse(Layout.headId(spark, path))
          Layout.changedFilePaths(spark, path, 0, to)
            .map(SnapshotFilePartition(_): InputPartition).toArray
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new SnapshotFileReaderFactory(tableSchema)
      }
      override def toMicroBatchStream(
          checkpointLocation: String): rstreaming.MicroBatchStream =
        new SnapshotMicroBatchStream(path, tableSchema,
          Option(options.get("startingSnapshot")).map(_.toInt).getOrElse(0),
          math.max(1, Option(options.get("maxSnapshotsPerTrigger"))
            .map(_.toInt).getOrElse(1)))
    }
}

/** The stream offset IS the snapshot id — the manifest sequence is the
  * log, so offset arithmetic and time travel share one number line. */
final case class SnapshotOffset(id: Int) extends rstreaming.Offset {
  override def json(): String = id.toString
}

final class SnapshotMicroBatchStream(path: String, schema: StructType,
    startingSnapshot: Int, maxPerTrigger: Int)
    extends rstreaming.MicroBatchStream
    with rstreaming.SupportsAdmissionControl {

  private def spark = SparkSession.active

  override def initialOffset(): rstreaming.Offset =
    SnapshotOffset(startingSnapshot)

  // Admission control caps each micro-batch at `maxPerTrigger` snapshot
  // TRANSITIONS, so one trigger never flattens several commits into an
  // indistinguishable blob (and processAllAvailable() still drains to
  // the head, one commit-window at a time).
  override def getDefaultReadLimit: rstreaming.ReadLimit =
    rstreaming.ReadLimit.allAvailable()
  override def latestOffset(start: rstreaming.Offset,
      limit: rstreaming.ReadLimit): rstreaming.Offset = {
    val s = start.asInstanceOf[SnapshotOffset].id
    SnapshotOffset(math.min(Layout.headId(spark, path),
      s.toLong + maxPerTrigger).toInt)
  }
  override def reportLatestOffset(): rstreaming.Offset =
    SnapshotOffset(Layout.headId(spark, path))
  override def latestOffset(): rstreaming.Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: rstreaming.Offset,
      end: rstreaming.Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotOffset].id
    val e = end.asInstanceOf[SnapshotOffset].id
    if (e <= s) Array.empty
    else Layout.changedFilePaths(spark, path, s, e)
      .map(SnapshotFilePartition(_): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotFileReaderFactory(schema)
  override def deserializeOffset(json: String): rstreaming.Offset =
    SnapshotOffset(json.toInt)
  override def commit(end: rstreaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class SnapshotFilePartition(file: String) extends InputPartition

object SnapshotFileReaderFactory {
  private[sources] val supported: Set[DataType] = Set(LongType,
    IntegerType, DoubleType, FloatType, BooleanType, StringType)
  def validate(schema: StructType): Unit = schema.fields.foreach { f =>
    require(supported.contains(f.dataType),
      s"graft-snapshot: unsupported column type ${f.dataType.sql} for " +
        s"'${f.name}' (supported: BIGINT, INT, DOUBLE, FLOAT, BOOLEAN, " +
        "STRING)")
  }
}

/** One reader per committed data file (executor-side): parquet-hadoop's
  * Group API decoded straight into InternalRow against the
  * manifest-recorded schema. Field positions are resolved once from the
  * first record's file schema, then reused for every row. */
final class SnapshotFileReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[SnapshotFilePartition].file
    val conf = new org.apache.hadoop.conf.Configuration()
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        new org.apache.hadoop.fs.Path(file))
      .withConf(conf).build()
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      private var idx: Array[Int] = _
      override def next(): Boolean = {
        val g = reader.read()
        if (g == null) false
        else {
          if (idx == null)
            idx = schema.fields.map(f => g.getType.getFieldIndex(f.name))
          val vals = new Array[Any](schema.length)
          var i = 0
          while (i < schema.length) {
            vals(i) =
              if (g.getFieldRepetitionCount(idx(i)) == 0) null
              else schema.fields(i).dataType match {
                case LongType => g.getLong(idx(i), 0)
                case IntegerType => g.getInteger(idx(i), 0)
                case DoubleType => g.getDouble(idx(i), 0)
                case FloatType => g.getFloat(idx(i), 0)
                case BooleanType => g.getBoolean(idx(i), 0)
                case StringType =>
                  UTF8String.fromBytes(g.getBinary(idx(i), 0).getBytes)
                case other => throw new IllegalStateException(
                  s"unreachable: $other passed validate()")
              }
            i += 1
          }
          cur = new GenericInternalRow(vals)
          true
        }
      }
      override def get(): InternalRow = cur
      override def close(): Unit = reader.close()
    }
  }
}
