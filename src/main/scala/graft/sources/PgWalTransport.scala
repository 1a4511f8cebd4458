package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal PostgreSQL frontend/backend (v3) protocol client — just the
  * slice a logical-replication consumer needs: startup + trust auth,
  * simple queries (text format), and CopyBoth for START_REPLICATION.
  * Wire format per the public PostgreSQL protocol documentation
  * ("Frontend/Backend Protocol", "Streaming Replication Protocol");
  * no JDBC driver involved — the socket is the dependency.
  *
  * One request/response conversation at a time per connection; callers
  * synchronize. */
private[sources] object PgProto {
  /** ErrorResponse/NoticeResponse payload → severity + human message. */
  def errText(p: Array[Byte]): String = {
    val b = ByteBuffer.wrap(p)
    val sb = new StringBuilder
    var code = b.get()
    while (code != 0) {
      val s = {
        val o = new java.io.ByteArrayOutputStream(32)
        var c = b.get()
        while (c != 0) { o.write(c.toInt); c = b.get() }
        new String(o.toByteArray, UTF_8)
      }
      if (code == 'S' || code == 'M') { sb ++= s; sb += ' ' }
      code = b.get()
    }
    sb.result().trim
  }
}

private[sources] final class PgProto(host: String, port: Int, db: String,
    user: String, replication: Boolean) extends java.io.Closeable {
  private val sock = new java.net.Socket()
  sock.connect(new java.net.InetSocketAddress(host, port), 5000)
  sock.setSoTimeout(15000)
  private val out = new java.io.DataOutputStream(
    new java.io.BufferedOutputStream(sock.getOutputStream))
  private val in = new java.io.DataInputStream(
    new java.io.BufferedInputStream(sock.getInputStream))

  locally {
    // StartupMessage: Int32 len, Int32 196608 (protocol 3.0), then
    // "key\0value\0" pairs, terminated by a single NUL. The
    // `replication=database` parameter opens a logical-replication
    // session bound to `db` (replication verbs AND SQL both work).
    val buf = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = { buf.write(s.getBytes(UTF_8)); buf.write(0) }
    put("user"); put(user)
    put("database"); put(db)
    if (replication) { put("replication"); put("database") }
    buf.write(0)
    out.writeInt(buf.size() + 8)
    out.writeInt(196608)
    buf.writeTo(out)
    out.flush()
    awaitReady()
  }

  def setTimeout(ms: Int): Unit = sock.setSoTimeout(ms)

  /** One backend message: (tag, payload past the length word). */
  def readMessage(): (Char, Array[Byte]) = {
    val tag = in.readByte().toChar
    val payload = new Array[Byte](in.readInt() - 4)
    in.readFully(payload)
    (tag, payload)
  }

  private def errText(p: Array[Byte]): String = PgProto.errText(p)
  /** Consume messages through ReadyForQuery; trust-auth only (the spec
    * provisions its cluster that way; password flows are out of scope). */
  private def awaitReady(): Unit = {
    var done = false
    while (!done) readMessage() match {
      case ('R', p) =>
        val code = ByteBuffer.wrap(p).getInt
        require(code == 0,
          s"PgProto supports trust auth only (AuthenticationOk), got code $code")
      case ('Z', _) => done = true
      case ('E', p) =>
        throw new java.io.IOException(s"postgres error: ${errText(p)}")
      case _ => () // ParameterStatus / BackendKeyData / notices
    }
  }

  /** Send a simple-protocol Query message (no response handling). */
  def sendQuery(sql: String): Unit = {
    val bytes = sql.getBytes(UTF_8)
    out.writeByte('Q'); out.writeInt(bytes.length + 5)
    out.write(bytes); out.writeByte(0); out.flush()
  }

  /** Simple query → text-format rows; consumes through ReadyForQuery. */
  def query(sql: String): Seq[Seq[Option[String]]] = {
    sendQuery(sql)
    val rows = Seq.newBuilder[Seq[Option[String]]]
    var err: String = null
    var done = false
    while (!done) readMessage() match {
      case ('D', p) =>
        val b = ByteBuffer.wrap(p)
        val n = b.getShort().toInt
        rows += Seq.fill(n) {
          val len = b.getInt()
          if (len < 0) None
          else {
            val bytes = new Array[Byte](len)
            b.get(bytes)
            Some(new String(bytes, UTF_8))
          }
        }
      case ('Z', _) => done = true
      case ('E', p) => err = errText(p)
      case _ => () // RowDescription / CommandComplete / notices
    }
    if (err != null) throw new java.io.IOException(s"postgres error: $err")
    rows.result()
  }

  /** Simple query → affected-row count from the CommandComplete tag
    * ("INSERT 0 1" / "UPDATE 2" → trailing integer). */
  def execUpdate(sql: String): Int = {
    sendQuery(sql)
    var affected = 0
    var err: String = null
    var done = false
    while (!done) readMessage() match {
      case ('C', p) =>
        // NUL-terminated command tag
        val tag = new String(p, 0, math.max(0, p.length - 1), UTF_8).trim
        val last = tag.substring(tag.lastIndexOf(' ') + 1)
        affected = scala.util.Try(last.toInt).getOrElse(0)
      case ('Z', _) => done = true
      case ('E', p) => err = errText(p)
      case _ => ()
    }
    if (err != null) throw new java.io.IOException(s"postgres error: $err")
    affected
  }

  /** CopyData from the frontend (standby status updates live here). */
  def sendCopyData(payload: Array[Byte]): Unit = {
    out.writeByte('d'); out.writeInt(payload.length + 4)
    out.write(payload); out.flush()
  }

  override def close(): Unit = {
    try { out.writeByte('X'); out.writeInt(4); out.flush() }
    catch { case _: java.io.IOException => () }
    sock.close()
  }
}

/** [[WalTransport]] over a LIVE PostgreSQL server — the real thing the
  * reference's connector does (StreamingJob.java:44-62: pgoutput plugin +
  * replication slot): `START_REPLICATION SLOT <slot> LOGICAL` on a
  * replication connection, XLogData frames in, standby status updates
  * out. Decoding stays in [[PgOutputSession]] — the frames this transport
  * yields are the server's actual pgoutput bytes.
  *
  * LSN assignment: every frame of a transaction carries the
  * transaction's COMMIT LSN — the final_lsn field of the pgoutput Begin
  * payload — matching the captured-log convention the rest of the
  * source stack plans ranges with ([[FileWalTransport]]: "Begin/DML/
  * Commit share their transaction's LSN"). Raw XLogData walStart values
  * are NOT usable as range keys: the next transaction's first change
  * reuses the previous commit record's position, so filtering
  * `> max(seen walStart)` silently drops the boundary transaction
  * (observed on a live PG 15). Begin/Relation frames are always
  * emitted — parallel/stateful decoders need the metadata, and
  * replaying it is idempotent — while row-bearing frames honor the
  * (afterLsn, endInclusive] contract transactionally.
  *
  * `frames` opens one replication session per call (exactly how
  * walsender clients scale: one session per reader) and drains until the
  * server goes quiet (read timeout after the catch-up burst) or the
  * range end is passed. `ack` advances the slot's confirmed_flush_lsn
  * via `pg_replication_slot_advance` on a control connection — the same
  * WAL-retention release a standby status update grants. */
final class PgWalTransport(host: String, port: Int, db: String,
    user: String, slot: String, publication: String,
    quietMs: Int = 500) extends WalTransport {

  private lazy val ctl = new PgProto(host, port, db, user, replication = false)

  private def lsnStr(l: Long): String =
    f"${l >>> 32}%X/${l & 0xffffffffL}%X"
  private def parseLsn(s: String): Long = {
    val i = s.indexOf('/')
    (java.lang.Long.parseLong(s.substring(0, i), 16) << 32) |
      java.lang.Long.parseLong(s.substring(i + 1), 16)
  }

  override def headLsn(): Long = synchronized {
    parseLsn(ctl.query("SELECT pg_current_wal_lsn()").head.head.get)
  }

  override def ack(lsn: Long): Unit = synchronized {
    // pg_replication_slot_advance refuses to move backwards; an ack at
    // or below confirmed_flush is a no-op, as on the wire.
    try { ctl.query(s"SELECT pg_replication_slot_advance(" +
      s"'$slot', '${lsnStr(lsn)}')"); () }
    catch { case _: java.io.IOException => () }
  }

  /** A logical slot admits ONE active walsender; back-to-back sessions
    * (plan probe, then reader) can race the server's release of the
    * previous one. Retry briefly on the "slot is active" error — the
    * same discipline a reconnecting replication client applies. */
  override def frames(afterLsn: Long,
      endInclusive: Long = Long.MaxValue): Iterator[(Long, Array[Byte])] = {
    var attempt = 0
    while (true) {
      try return framesOnce(afterLsn, endInclusive)
      catch {
        // "is active": slot release race with the previous session.
        // "drain stalled": a slow catch-up outlived the quiet-window cap
        // (framesOnce refuses to return a truncated range). Both are
        // transient; a fresh session resumes from the slot's restart
        // point, so retrying re-reads the same frames — idempotent.
        case e: java.io.IOException
            if attempt < 4 && e.getMessage != null &&
              (e.getMessage.contains("is active") ||
                e.getMessage.contains("drain stalled")) =>
          attempt += 1
          Thread.sleep(250L * attempt)
      }
    }
    Iterator.empty // unreachable
  }

  private def framesOnce(afterLsn: Long,
      endInclusive: Long): Iterator[(Long, Array[Byte])] = {
    // caught-up target: everything committed before this call must
    // arrive before a quiet period may end the drain (the walsender
    // re-scans WAL from the slot's restart point on connect, so the
    // first bytes of a fresh session can lag the connection by more
    // than one quiet window)
    val target = headLsn()
    val conn = new PgProto(host, port, db, user, replication = true)
    try {
      val start = math.max(afterLsn, 0L)
      conn.sendQuery(s"START_REPLICATION SLOT $slot LOGICAL " +
        s"${lsnStr(start)} (proto_version '1', publication_names '$publication')")
      conn.setTimeout(quietMs)
      val buf = Vector.newBuilder[(Long, Array[Byte])]
      var txnLsn = 0L // current transaction's commit LSN (Begin.final_lsn)
      var pos = start
      var seenEnd = 0L // highest walEnd reported (XLogData or keepalive)
      var quietRounds = 0
      var open = true
      while (open) {
        try conn.readMessage() match {
          case ('d', p) if p(0) == 'w' =>
            // XLogData: 'w' walStart(8) walEnd(8) serverTs(8) payload
            quietRounds = 0 // only CONSECUTIVE quiet windows end the drain
            seenEnd = math.max(seenEnd, ByteBuffer.wrap(p, 9, 8).getLong)
            val frame = java.util.Arrays.copyOfRange(p, 25, p.length)
            val tag = frame(0).toChar
            if (tag == 'B') txnLsn = ByteBuffer.wrap(frame, 1, 8).getLong
            val lsn =
              if (txnLsn != 0L) txnLsn
              else math.max(pos, ByteBuffer.wrap(p, 1, 8).getLong)
            pos = math.max(pos, lsn)
            if (pos > endInclusive) open = false
            else if (lsn > afterLsn || tag == 'B' || tag == 'R')
              buf += lsn -> frame
          case ('d', p) if p(0) == 'k' =>
            // keepalive: 'k' walEnd(8) serverTs(8) replyRequested(1)
            quietRounds = 0
            seenEnd = math.max(seenEnd, ByteBuffer.wrap(p, 1, 8).getLong)
            if (p(17) != 0) conn.sendCopyData(standbyStatus(seenEnd))
          case ('E', p) =>
            throw new java.io.IOException(
              s"postgres replication error: ${PgProto.errText(p)}")
          case _ => () // CopyBothResponse / notices
        } catch {
          case _: java.net.SocketTimeoutException =>
            quietRounds += 1
            if (seenEnd >= target) open = false // quiet AND caught up: done
            else if (quietRounds >= 10) {
              // NOT caught up to the connect-time head after 10 CONSECUTIVE
              // quiet windows. Returning now would silently truncate the
              // planned (afterLsn, endInclusive] range — CdcFileSource
              // would advance offsets past frames that never arrived, a
              // permanent data loss (possibly mid-transaction). Fail loud;
              // the caller retries with the same range, losing nothing.
              throw new java.io.IOException(
                s"replication drain stalled: walsender quiet for " +
                  s"$quietRounds×${quietMs}ms with seenEnd=${lsnStr(seenEnd)}" +
                  s" < head=${lsnStr(target)}; refusing to truncate range")
            } else
              // Prompt the server for an immediate keepalive (standby
              // status with replyRequested=1) so seenEnd converges to the
              // head even when only non-published WAL is flowing and the
              // walsender's own keepalive cadence is slower than quietMs.
              conn.sendCopyData(standbyStatus(seenEnd, requestReply = true))
        }
      }
      buf.result().iterator
    } finally conn.close()
  }

  /** Standby Status Update: 'r' written(8) flushed(8) applied(8)
    * clock(8, µs since PG epoch 2000-01-01) replyRequested(1).
    *
    * flushed/applied are reported as 0 (InvalidXLogRecPtr = "no update"):
    * confirmed_flush must only move through [[ack]] once the source's
    * offset log has durably committed the range — reporting seenEnd as
    * flushed here would let the server release WAL the reader has merely
    * buffered. replyRequested=1 asks the walsender for an immediate
    * keepalive (used by the quiet-window probe to learn the true head). */
  private def standbyStatus(lsn: Long, requestReply: Boolean = false)
      : Array[Byte] = {
    val b = ByteBuffer.allocate(34)
    b.put('r'.toByte)
    b.putLong(lsn); b.putLong(0L); b.putLong(0L)
    b.putLong((System.currentTimeMillis() - 946684800000L) * 1000L)
    b.put(if (requestReply) 1.toByte else 0.toByte)
    b.array()
  }

  override def close(): Unit = ctl.close()
}
