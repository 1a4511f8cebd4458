package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, EOFException, FileInputStream, FileOutputStream, IOException}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite,
  Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Packed-shard binary files, `format("graft-shards")` — the trainer
  * interchange boundary: the packed sequences a curation pipeline ends
  * with ([[graft.ops.TextOps.assembleSequences]] → token ids) written as
  * dense length-prefixed binary a training job can stream or mmap
  * without a columnar reader, the role tfrecord/megatron-bin files play
  * in public training stacks.
  *
  * File format `GSH1` (big-endian, self-describing):
  * magic "GSH1", then per record
  * `[i64 shard][i64 window_id][i32 n][n × i32 token_id]` until EOF.
  *
  * Spark-native on both sides:
  *  - WRITE is a real DSv2 two-phase commit: each task streams its rows
  *    to a uniquely-named temp file (task attempts never collide),
  *    the driver's `BatchWrite.commit` renames exactly the committed
  *    attempts into place and stamps `_SUCCESS` — speculative or failed
  *    attempts leave nothing visible. One file per partition: the
  *    caller picks file granularity with `repartition`/`sortWithin
  *    Partitions`, the same contract as every file sink.
  *  - READ plans one InputPartition per committed file (file-granular
  *    parallelism, no driver funnel) and streams records off a buffered
  *    DataInputStream — at 100 TB the layout is thousands of
  *    shard files scanned independently, exactly like parquet splits.
  *
  * Deployment constraint: IO goes through java.nio, so `path` must be
  * a filesystem shared by driver and executors (local mode, NFS, a
  * fuse-mounted object store). Porting to the Hadoop FS API — temp
  * object + driver-side completion instead of rename — is mechanical;
  * the commit protocol and record format don't change.
  */
object ShardFiles {
  val Magic: Array[Byte] = "GSH1".getBytes("US-ASCII")

  val schema: StructType = StructType(Seq(
    StructField("shard", LongType, nullable = false),
    StructField("window_id", LongType, nullable = false),
    StructField("token_ids", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  /** Library convenience: append `df` (must carry exactly the shard
    * schema's columns) at `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val cols = schema.fieldNames.toSeq
    require(df.columns.toSeq == cols,
      s"ShardFiles.write: need columns $cols, got ${df.columns.toSeq}")
    df.write.format("graft-shards").mode("append").save(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-shards").load(path)

  /** Directory listings: `Files.list` holds an open directory handle
    * until the stream is closed — always drain inside a closing scope
    * or repeated commits/reads leak file descriptors. */
  private[sources] def withListing[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  private[graft] def listCommitted(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else withListing(dir)(_.filter(p =>
        p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".gsh"))
      .toSeq.sortBy(_.getFileName.toString))
}

class ShardFilesProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-shards"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardFiles.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(schema == ShardFiles.schema,
      s"graft-shards has a fixed schema ${ShardFiles.schema}, got $schema")
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-shards: missing path"))
    new ShardFilesTable(path)
  }
}

final class ShardFilesTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-shards:$path"
  override def schema(): StructType = ShardFiles.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = ShardFiles.schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          ShardFiles.listCommitted(Paths.get(path))
            .map(p => ShardFilePartition(p.toString): InputPartition).toArray
        override def createReaderFactory(): PartitionReaderFactory =
          new ShardFileReaderFactory
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // names + types must match; nullability flags vary freely across
    // upstream plans (a projection often re-marks fields nullable), so
    // they're not part of the contract — actual nulls fail in the writer
    require(info.schema().fields.toSeq.map(f => (f.name, f.dataType.sql)) ==
      ShardFiles.schema.fields.toSeq.map(f => (f.name, f.dataType.sql)),
      s"graft-shards write: need schema ${ShardFiles.schema.simpleString}, " +
        s"got ${info.schema().simpleString}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ShardBatchWrite(path,
          java.util.UUID.randomUUID().toString)
        override def toStreaming: StreamingWrite =
          new ShardStreamingWrite(path, info.queryId())
      }
    }
  }
}

final case class ShardFilePartition(file: String) extends InputPartition

final class ShardFileReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[ShardFilePartition].file
    new PartitionReader[InternalRow] {
      private val in = new DataInputStream(
        new BufferedInputStream(new FileInputStream(file), 1 << 16))
      locally {
        val m = new Array[Byte](4)
        in.readFully(m)
        if (!util.Arrays.equals(m, ShardFiles.Magic))
          throw new IOException(s"$file: bad magic " +
            s"${m.map(b => f"$b%02x").mkString} (want GSH1)")
      }
      private var cur: InternalRow = _
      override def next(): Boolean = {
        val shard = try in.readLong() catch {
          case _: EOFException => return false
        }
        // a partial record past this point is corruption, not EOF
        val window = in.readLong()
        val n = in.readInt()
        if (n < 0) throw new IOException(s"$file: negative record length $n")
        val ids = new Array[Int](n)
        var i = 0
        while (i < n) { ids(i) = in.readInt(); i += 1 }
        cur = new GenericInternalRow(
          Array[Any](shard, window, ArrayData.toArrayData(ids)))
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = in.close()
    }
  }
}

/** Two-phase commit: tasks write `_tmp-<job>/attempt-<partition>-<task>
  * .gsh`; the driver renames the SINGLE committed attempt per partition
  * to `part-<job>-<partition>.gsh` (job id in the final name keeps
  * repeated appends from colliding), then stamps `_SUCCESS` and drops
  * the temp dir with any uncommitted attempts still in it. */
final class ShardBatchWrite(path: String, jobId: String) extends BatchWrite {
  private def tmpDir = Paths.get(path, s"_tmp-$jobId")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(tmpDir)
    new ShardWriterFactory(tmpDir.toString)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    messages.collect { case m: ShardCommitMessage => m }.foreach { m =>
      Files.move(Paths.get(m.tempFile),
        dir.resolve(f"part-$jobId-${m.partitionId}%05d.gsh"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    cleanup()
    Files.write(dir.resolve("_SUCCESS"), Array.empty[Byte])
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit =
    if (Files.isDirectory(tmpDir)) {
      ShardFiles.withListing(tmpDir)(_.toSeq).foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(tmpDir)
    }
}

/** Per-epoch two-phase commit for `writeStream.format("graft-shards")`:
  * the streaming tail of the pipeline (continuous assembly) lands in
  * the same trainer files as the batch path. Spark's sink contract is
  * at-least-once epoch delivery; visibility is made effectively-once by
  * an epoch MARKER written after the renames — a replayed epoch whose
  * marker exists renames nothing, and a crash mid-commit re-renames
  * with REPLACE on the (epoch, partition)-keyed names, so re-commits
  * converge instead of duplicating. */
final class ShardStreamingWrite(path: String, queryId: String)
    extends StreamingWrite {
  private def tmpDir = Paths.get(path, s"_tmp-stream-$queryId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    Files.createDirectories(tmpDir)
    val dir = tmpDir.toString
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] =
        ShardWriterFactory.newWriter(
          Paths.get(dir, s"attempt-$epochId-$partitionId-$taskId.gsh"),
          partitionId)
    }
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    val marker = dir.resolve(s"_epoch-$queryId-$epochId")
    if (!Files.exists(marker)) {
      messages.collect { case m: ShardCommitMessage => m }.foreach { m =>
        Files.move(Paths.get(m.tempFile),
          dir.resolve(f"part-$queryId-$epochId-${m.partitionId}%05d.gsh"),
          StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      }
      Files.write(marker, Array.empty[Byte])
    }
    cleanupEpoch(epochId)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = cleanupEpoch(epochId)

  private def cleanupEpoch(epochId: Long): Unit =
    if (Files.isDirectory(tmpDir)) {
      ShardFiles.withListing(tmpDir)(
        _.filter(_.getFileName.toString.startsWith(s"attempt-$epochId-"))
          .toSeq).foreach(Files.deleteIfExists(_))
    }
}

final case class ShardCommitMessage(partitionId: Int, tempFile: String)
    extends WriterCommitMessage

final class ShardWriterFactory(tmpDir: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    ShardWriterFactory.newWriter(
      Paths.get(tmpDir, s"attempt-$partitionId-$taskId.gsh"), partitionId)
}

object ShardWriterFactory {
  /** One record-streaming writer over a temp attempt file — shared by
    * the batch and per-epoch streaming factories. */
  private[sources] def newWriter(tempFile: Path,
      partitionId: Int): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val out = new DataOutputStream(new BufferedOutputStream(
        new FileOutputStream(tempFile.toFile), 1 << 16))
      out.write(ShardFiles.Magic)

      override def write(r: InternalRow): Unit = {
        if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))
          throw new IllegalStateException(
            "graft-shards: null shard/window_id/token_ids row")
        out.writeLong(r.getLong(0))
        out.writeLong(r.getLong(1))
        val ids = r.getArray(2).toIntArray()
        out.writeInt(ids.length)
        var i = 0
        while (i < ids.length) { out.writeInt(ids(i)); i += 1 }
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        ShardCommitMessage(partitionId, tempFile.toString)
      }
      override def abort(): Unit = {
        out.close()
        Files.deleteIfExists(tempFile)
      }
      override def close(): Unit = ()
    }
}
