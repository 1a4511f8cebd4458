package graft.sources

/** Transport abstraction over the logical-replication connection — the
  * seam between "how frames arrive" and "what they mean" (decoding stays
  * in [[PgOutputSession]] / the jsonl parser regardless of transport).
  *
  * The production implementation speaks the walsender protocol over a
  * socket (`START_REPLICATION SLOT ... LOGICAL`, XLogData frames in,
  * standby-status-update acks out — reference source S1's connector does
  * exactly this under Debezium, StreamingJob.java:44-62). The container
  * has no Postgres, so [[FileWalTransport]] replays a captured log with
  * identical semantics: LSN-ordered frames, a head-LSN probe for offset
  * planning, and an ack that stands in for confirmed_flush_lsn. Everything
  * above this trait (offset math, range partitioning, admission control,
  * decoders) is transport-agnostic.
  */
trait WalTransport extends java.io.Closeable {
  /** Frames with lsn strictly greater than `afterLsn`, in LSN order.
    * Stateful decoders (pgoutput Relation/Begin metadata) should pass
    * `Long.MinValue` and filter emitted envelopes instead. */
  def frames(afterLsn: Long): Iterator[(Long, Array[Byte])]

  /** Highest LSN currently available — the `latestOffset` probe. */
  def headLsn(): Long

  /** Acknowledge durable processing through `lsn` (the replication
    * slot's confirmed_flush_lsn advance; lets upstream discard WAL). */
  def ack(lsn: Long): Unit

  override def close(): Unit = ()
}

object WalTransport {
  /** The file transport, `walFormat` "jsonl" or "pgoutput". */
  def open(path: String, walFormat: String): WalTransport =
    new FileWalTransport(path, walFormat)
}

/** Captured-log replay: each line is one frame — `<lsn> <base64(bytes)>`
  * for pgoutput, a JSON envelope (frame = line bytes) for jsonl. Acks are
  * recorded but nothing is discarded (a file is its own retention). */
final class FileWalTransport(path: String, walFormat: String)
    extends WalTransport {
  @volatile private var acked = Long.MinValue

  private def all(): Seq[(Long, Array[Byte])] =
    if (walFormat == "pgoutput") CdcFileMicroBatchStream.readBinaryFrames(path)
    else CdcFileMicroBatchStream.readLines(path)
      .map { case (lsn, line) => lsn -> line.getBytes("UTF-8") }

  override def frames(afterLsn: Long): Iterator[(Long, Array[Byte])] =
    all().filter(_._1 > afterLsn).sortBy(_._1).iterator

  override def headLsn(): Long = {
    val lsns = CdcFileMicroBatchStream.readLsns(path, walFormat)
    if (lsns.isEmpty) 0L else lsns.max
  }

  override def ack(lsn: Long): Unit = acked = math.max(acked, lsn)

  /** Observable for specs; a socket transport would have sent this
    * watermark upstream in a standby status update. */
  def ackedLsn: Long = acked
}
