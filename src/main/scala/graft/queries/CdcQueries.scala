package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.{CdcEnvelope, Changelog, CompactionDelta, Sinks}
import graft.sources.PgOutputFrames

/** CORRECTNESS-graded batch entries for the custom engine pieces:
  *
  *  - cdc1_source_batch — S1, the `format("graft-cdc")` DataSource V2
  *    source itself (reference StreamingJob.java:44-62). A deterministic
  *    WAL fixture is derived from the `events` table, written in BOTH wal
  *    formats (jsonl envelopes and binary pgoutput frames), batch-read
  *    through the source with parallel LSN-range readers, and projected
  *    to plain columns. The DuckDB oracle computes the same envelope
  *    projection directly from `events` — so a green row proves the file
  *    writer→wire format→decoder→DSv2 reader path end to end, byte-level
  *    pgoutput decoding included.
  *
  *  - cdc2_upsert_replay — the upsert/changelog compaction semantics the
  *    K2 sink applies (reference CustomJob.java:156-194): latest record
  *    per key by LSN wins, a trailing delete removes the key. Expressed
  *    as the partial-agg-friendly max_by formulation (not a window sort)
  *    over the envelopes read through the source; the oracle is the
  *    row_number()-window SQL over the same synthesized changelog.
  *
  *  - cdc3_snapshot_stream — the snapshot→incremental handoff every real
  *    CDC consumer exercises first: the connector emits one `op='r'`
  *    (snapshot read) envelope per pre-existing row, then the live c/u/d
  *    stream (reference CustomJob.java:237-240 — Debezium's op set is
  *    {c,u,d,r}). Snapshot records sit at low LSNs (a snapshot completes
  *    before the slot's first streamed transaction), so the same
  *    latest-by-LSN compaction yields: stream-untouched keys survive as
  *    'r' rows, streamed keys take the stream's last image, trailing
  *    deletes drop the key even when it existed in the snapshot.
  *
  * Envelope derivation from `events` (expressible in both engines):
  * lsn = event_id, tx_id = event_id // 100, ts_ms = event_id * 1000,
  * op = 'd' when event_id % 7 = 0, 'c' for signups, else 'u';
  * deletes carry only the key in `before`, other ops carry
  * {id, event_type} in `after`.
  */
object CdcQueries {

  /** Writes the WAL fixture pair (wal.jsonl + wal.pgoutput) for an sf dir
    * once, atomically, under java.io.tmpdir; returns the fixture dir.
    * Derivation is deterministic, so concurrent/repeat calls are safe. */
  def ensureFixture(spark: SparkSession, sfDir: String): String = {
    // Cache key includes a fingerprint of the source parquet (size+mtime,
    // recursive for multi-file tables): regenerated test data must never
    // hit a stale fixture — the oracle reads the live table.
    def fp(f: java.io.File): Long =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName).map(fp).foldLeft(17L)(31 * _ + _)
      else 31L * f.length() + f.lastModified()
    // v2: bump when the derivation itself changes (v2 added the snapshot
    // segment's ghost keys), so cached fixtures from older code miss.
    val src = new java.io.File(s"$sfDir/events.parquet")
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_") +
      "-v2-" + java.lang.Long.toHexString(fp(src))
    val dir = Paths.get(sys.props("java.io.tmpdir"), s"graft-cdc-fixture-$key")
    val jsonl = dir.resolve("wal.jsonl")
    val pgout = dir.resolve("wal.pgoutput")
    val snap = dir.resolve("wal_snap.jsonl")
    if (Files.exists(jsonl) && Files.exists(pgout) && Files.exists(snap))
      return dir.toString

    graft.Tables.registerAll(spark, sfDir)
    // Only the three narrow columns leave the executors; at a real 100 TB
    // deployment the WAL is the upstream database's, not derived — this
    // driver-side write exists purely to fabricate a deterministic log.
    val rows = spark.table("events")
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("event_type"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    def op(eventId: Long, eventType: String): String =
      if (eventId % 7 == 0) "d" else if (eventType == "signup") "c" else "u"

    Files.createDirectories(dir)
    val enc = java.util.Base64.getEncoder

    val tmpJ = Files.createTempFile(dir, "wal", ".jsonl.tmp")
    val wj = Files.newBufferedWriter(tmpJ)
    try rows.foreach { case (id, uid, et) =>
      val o = op(id, et)
      val before = if (o == "d") s"""{"id":"$uid"}""" else "{}"
      val after =
        if (o == "d") "{}" else s"""{"id":"$uid","event_type":"$et"}"""
      wj.write(s"""{"lsn":$id,"txId":${id / 100},"tsMs":${id * 1000},""" +
        s""""op":"$o","db":"experiment","schema":"public","table":"users",""" +
        s""""before":$before,"after":$after}""")
      wj.newLine()
    } finally wj.close()

    val tmpP = Files.createTempFile(dir, "wal", ".pgoutput.tmp")
    val wp = Files.newBufferedWriter(tmpP)
    try {
      val oid = 101
      // Relation metadata precedes all DML, as on a real replication
      // socket; Begin/Commit share the DML frame's LSN (they emit no
      // envelope — stable sort keeps file order within an LSN).
      wp.write("0 " + enc.encodeToString(
        PgOutputFrames.relation(oid, "public", "users",
          Seq("id", "event_type"))))
      wp.newLine()
      def frame(lsn: Long, bytes: Array[Byte]): Unit = {
        wp.write(s"$lsn " + enc.encodeToString(bytes)); wp.newLine()
      }
      rows.foreach { case (id, uid, et) =>
        frame(id, PgOutputFrames.begin((id / 100).toInt, id * 1000))
        op(id, et) match {
          case "c" => frame(id, PgOutputFrames.insert(oid,
            Seq(Some(uid.toString), Some(et))))
          case "u" => frame(id, PgOutputFrames.update(oid, None,
            Seq(Some(uid.toString), Some(et))))
          case _ => frame(id, PgOutputFrames.delete(oid,
            Seq(Some(uid.toString), None)))
        }
        frame(id, PgOutputFrames.commit())
      }
    } finally wp.close()

    // wal_snap.jsonl — the cdc3 log: an initial snapshot segment (op='r',
    // one envelope per pre-existing key, lsn = key id — all below
    // SnapStreamBase), then the same c/u/d stream shifted up by
    // SnapStreamBase so every streamed change outranks every snapshot read.
    // Snapshot membership: every user_id % 2 = 0 (keys the stream then
    // updates/deletes — handoff), plus a ghost key user_id + 100000 per
    // user_id % 5 = 0 (keys the stream never touches — these MUST survive
    // compaction as op='r' rows, the snapshot-survival half of the grade).
    val tmpS = Files.createTempFile(dir, "wal", ".snap.tmp")
    val ws = Files.newBufferedWriter(tmpS)
    try {
      val uids = rows.map(_._2).distinct
      val snapIds = (uids.filter(_ % 2 == 0) ++
        uids.filter(_ % 5 == 0).map(_ + 100000L)).sorted
      snapIds.foreach { sid =>
        ws.write(s"""{"lsn":$sid,"txId":0,"tsMs":0,"op":"r",""" +
          s""""db":"experiment","schema":"public","table":"users",""" +
          s""""before":{},"after":{"id":"$sid","event_type":"snapshot"}}""")
        ws.newLine()
      }
      rows.foreach { case (id, uid, et) =>
        val o = op(id, et)
        val lsn = SnapStreamBase + id
        val before = if (o == "d") s"""{"id":"$uid"}""" else "{}"
        val after =
          if (o == "d") "{}" else s"""{"id":"$uid","event_type":"$et"}"""
        ws.write(s"""{"lsn":$lsn,"txId":${id / 100},"tsMs":${id * 1000},""" +
          s""""op":"$o","db":"experiment","schema":"public","table":"users",""" +
          s""""before":$before,"after":$after}""")
        ws.newLine()
      }
    } finally ws.close()

    try {
      Files.move(tmpJ, jsonl, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmpP, pgout, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmpS, snap, StandardCopyOption.ATOMIC_MOVE)
    } catch { case _: java.nio.file.FileAlreadyExistsException => // racer won
      Files.deleteIfExists(tmpJ); Files.deleteIfExists(tmpP)
      Files.deleteIfExists(tmpS)
    }
    dir.toString
  }

  /** LSN offset separating the cdc3 snapshot segment from its stream:
    * snapshot reads use lsn = user_id (bounded by the key space), streamed
    * changes use lsn = SnapStreamBase + event_id. */
  private val SnapStreamBase = 1000000000L

  private def readWal(spark: SparkSession, fixtureDir: String, mode: String) = {
    val file = if (mode == "pgoutput") "wal.pgoutput" else "wal.jsonl"
    spark.read.format("graft-cdc")
      .option("path", s"$fixtureDir/$file")
      .option("walFormat", mode)
      .option("numPartitions", "8")
      .load()
      .withColumn("mode", lit(mode))
  }

  /** Oracle CTE: the same envelope derivation in DuckDB SQL. */
  private val envCte =
    """WITH env AS (
      |  SELECT event_id AS lsn, event_id // 100 AS tx_id,
      |         event_id * 1000 AS ts_ms,
      |         CASE WHEN event_id % 7 = 0 THEN 'd'
      |              WHEN event_type = 'signup' THEN 'c' ELSE 'u' END AS op,
      |         CASE WHEN event_id % 7 = 0 THEN NULL
      |              ELSE CAST(user_id AS VARCHAR) END AS after_id,
      |         CASE WHEN event_id % 7 = 0 THEN NULL
      |              ELSE event_type END AS after_event_type,
      |         CASE WHEN event_id % 7 = 0 THEN CAST(user_id AS VARCHAR)
      |              END AS before_id,
      |         user_id
      |  FROM events)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("cdc1_source_batch",
      (spark, dir) => {
        val fix = ensureFixture(spark, dir)
        readWal(spark, fix, "jsonl")
          .unionByName(readWal(spark, fix, "pgoutput"))
          .select(col("mode"), col("lsn"), col("txId").as("tx_id"),
            col("tsMs").as("ts_ms"), col("op"), col("db"),
            col("schema").as("pg_schema"), col("table").as("tbl"),
            element_at(col("after"), "id").as("after_id"),
            element_at(col("after"), "event_type").as("after_event_type"),
            element_at(col("before"), "id").as("before_id"))
          .orderBy("mode", "lsn")
      },
      Some(envCte +
        """
          |, proj AS (
          |  SELECT lsn, tx_id, ts_ms, op, 'experiment' AS db,
          |         'public' AS pg_schema, 'users' AS tbl,
          |         after_id, after_event_type, before_id
          |  FROM env)
          |SELECT 'jsonl' AS mode, * FROM proj
          |UNION ALL
          |SELECT 'pgoutput' AS mode, * FROM proj
          |ORDER BY mode, lsn""".stripMargin)),

    QueryDef("cdc2_upsert_replay",
      (spark, dir) => {
        val fix = ensureFixture(spark, dir)
        // Compaction as aggregation: latest envelope per key by LSN (map-
        // side partial agg → one row per key crosses the shuffle), then
        // deletes drop the key — the batch twin of graft.cdc.Changelog.
        readWal(spark, fix, "jsonl")
          .withColumn("id", coalesce(element_at(col("after"), "id"),
            element_at(col("before"), "id")).cast("long"))
          .groupBy("id")
          .agg(max_by(struct(col("lsn"), col("op"),
            element_at(col("after"), "event_type").as("et")),
            col("lsn")).as("last"))
          .filter(col("last.op") =!= "d")
          .select(col("id"), col("last.lsn").as("last_lsn"),
            col("last.op").as("last_op"), col("last.et").as("last_event_type"))
          .orderBy("id")
      },
      Some(envCte +
        """
          |, r AS (
          |  SELECT user_id AS id, lsn, op, after_event_type,
          |         row_number() OVER (PARTITION BY user_id
          |                            ORDER BY lsn DESC) AS rn
          |  FROM env)
          |SELECT id, lsn AS last_lsn, op AS last_op,
          |       after_event_type AS last_event_type
          |FROM r WHERE rn = 1 AND op != 'd'
          |ORDER BY id""".stripMargin)),

    QueryDef("cdc3_snapshot_stream",
      (spark, dir) => {
        val fix = ensureFixture(spark, dir)
        // Snapshot (op='r') + incremental stream, compacted with the SAME
        // operator as cdc2 — nothing special-cases 'r': any non-delete is
        // an upsert, and snapshot LSNs all sit below stream LSNs, so the
        // handoff falls out of latest-by-LSN. Keys only the snapshot saw
        // survive as 'r'/'snapshot' rows; streamed keys take the stream's
        // last image; deletes drop the key even if snapshotted.
        spark.read.format("graft-cdc")
          .option("path", s"$fix/wal_snap.jsonl")
          .option("numPartitions", "8")
          .load()
          .withColumn("id", coalesce(element_at(col("after"), "id"),
            element_at(col("before"), "id")).cast("long"))
          .groupBy("id")
          .agg(max_by(struct(col("lsn"), col("op"),
            element_at(col("after"), "event_type").as("et")),
            col("lsn")).as("last"))
          .filter(col("last.op") =!= "d")
          .select(col("id"), col("last.lsn").as("last_lsn"),
            col("last.op").as("last_op"), col("last.et").as("last_event_type"))
          .orderBy("id")
      },
      Some(envCte +
        s"""
          |, snap AS (
          |  SELECT DISTINCT user_id AS sid FROM events WHERE user_id % 2 = 0
          |  UNION
          |  SELECT DISTINCT user_id + 100000 FROM events WHERE user_id % 5 = 0)
          |, log AS (
          |  SELECT sid AS id, CAST(sid AS BIGINT) AS lsn,
          |         'r' AS op, 'snapshot' AS after_event_type
          |  FROM snap
          |  UNION ALL
          |  SELECT user_id AS id, $SnapStreamBase + lsn AS lsn,
          |         op, after_event_type
          |  FROM env)
          |, r AS (
          |  SELECT *, row_number() OVER (PARTITION BY id
          |                               ORDER BY lsn DESC) AS rn
          |  FROM log)
          |SELECT id, lsn AS last_lsn, op AS last_op,
          |       after_event_type AS last_event_type
          |FROM r WHERE rn = 1 AND op != 'd'
          |ORDER BY id""".stripMargin)),

    // st1 — the flagship pipeline run AS A STREAM and graded by the
    // DuckDB oracle: the WAL fixture replayed through the DSv2 source
    // with admission control forcing multiple micro-batches, compacted
    // by the stateful flatMapGroupsWithState operator, each batch's
    // per-key final state PK-upserted through the K2 writer (ledger
    // claims keyed by batchId = exactly-once under replay). The graded
    // output is t5's semantics — live count per event_type — computed
    // by real micro-batch execution end to end, closing the loop the
    // batch twins (t5, cdc2) grade only statically. Driver-side
    // materialization at the END is the grading seam only: per-batch
    // writes go through foreachPartition/executeBatch (no driver
    // funnel), and the same writer is live-graded against a real
    // Postgres in PgLiveReplicationSpec.
    QueryDef("st1_stream_changelog_count", (spark, dir) => {
      import spark.implicits._
      implicit val s: SparkSession = spark
      val fix = ensureFixture(spark, dir)
      // Admission control sized from the log so EVERY sf replays in ~3
      // micro-batches: a fixed cap either degenerates to one batch at
      // small sf (no micro-batch plurality left to grade) or explodes
      // into dozens at large sf (per-trigger state/checkpoint overhead
      // dominating the bench). Line count is a driver-side metadata
      // probe of the fixture, not a data read.
      val walLines = {
        val s = Files.lines(Paths.get(fix, "wal.jsonl"))
        try s.count() finally s.close()
      }
      val events = spark.readStream.format("graft-cdc")
        .option("walFormat", "jsonl")
        .option("numPartitions", "8")
        .option("maxEventsPerBatch", math.max(500L, (walLines + 2) / 3).toString)
        .load(s"$fix/wal.jsonl").as[CdcEnvelope]
      val ns = s"st1-${java.util.UUID.randomUUID()}"
      val sink = Sinks.MemoryDb.table(ns, "live_keys")
      val writer = new Sinks.UpsertWriter("live_keys", "key",
        Seq("key", "alive", "event_type"), runId = ns)
      val factory = Sinks.MemoryDb.factory(ns)
      val q = Changelog.compact(events).writeStream
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-st1-ckpt").toString)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[CompactionDelta],
              batchId: Long) =>
            writer.writeBatch(batch.select(col("key"), col("alive"),
              try_element_at(col("image"), lit("event_type"))
                .as("event_type")), factory, batchId)
        }
        .start()
      q.processAllAvailable(); q.stop()
      val live = sink.snapshot.values.toSeq
        .filter(_("alive") == true).map(_("event_type").toString)
      live.toDF("event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).cast("bigint").as("live_users"))
        .orderBy("event_type")
    }, Some(
      """WITH latest AS (
        |  SELECT user_id, event_type, event_id, row_number() OVER
        |    (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS live_users
        |FROM latest WHERE rn = 1 AND event_id % 7 != 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // st2 — incremental view maintenance beyond counts: a continuous
    // per-group SUM/COUNT/AVG over the changelog, run as real micro-
    // batches through [[graft.cdc.Changelog.compactValue]]. The value
    // (lsn % 997, micro-units) CHANGES on every update and the grouping
    // field (event_type) MOVES across a user's events, so the two deltas
    // plain count-IVM never exercises are both load-bearing here: an
    // update retracts its previous value (new − old telescopes within a
    // micro-batch), a group move retracts from the old group and adds to
    // the new, and a delete subtracts the value recorded in state — the
    // delete envelope itself carries neither group nor value. Each
    // micro-batch pre-aggregates its deltas per group (|groups| rows,
    // not |keys|, cross the sink boundary) and additively upserts
    // through the ledgered K2 writer (exactly-once under replay). The
    // oracle computes the same aggregate statically from latest-per-user.
    QueryDef("st2_stream_changelog_sum", (spark, dir) => {
      import spark.implicits._
      implicit val s: SparkSession = spark
      val fix = ensureFixture(spark, dir)
      val walLines = {
        val st = Files.lines(Paths.get(fix, "wal.jsonl"))
        try st.count() finally st.close()
      }
      val events = spark.readStream.format("graft-cdc")
        .option("walFormat", "jsonl")
        .option("numPartitions", "8")
        .option("maxEventsPerBatch", math.max(500L, (walLines + 2) / 3).toString)
        .load(s"$fix/wal.jsonl").as[CdcEnvelope]
      val ns = s"st2-${java.util.UUID.randomUUID()}"
      val sink = Sinks.MemoryDb.table(ns, "live_sums")
      val writer = new Sinks.UpsertWriter("live_sums", "event_type",
        Seq("event_type", "n_live", "sum_value_micro"),
        additive = Set("n_live", "sum_value_micro"), runId = ns)
      val factory = Sinks.MemoryDb.factory(ns)
      val deltas = Changelog.compactValue(events,
        e => e.image.getOrElse("event_type", ""),
        e => e.lsn % 997L)
      val q = deltas.writeStream
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-st2-ckpt").toString)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[graft.cdc.ValueDelta],
              batchId: Long) =>
            writer.writeBatch(batch.groupBy(col("group").as("event_type"))
              .agg(sum(col("dCount")).as("n_live"),
                sum(col("dValueMicro")).as("sum_value_micro")),
              factory, batchId)
        }
        .start()
      q.processAllAvailable(); q.stop()
      val rows = sink.snapshot.values.toSeq.map(r =>
        (r("event_type").toString, r("n_live").toString.toLong,
          r("sum_value_micro").toString.toLong))
        .filter(_._2 > 0)
      rows.toDF("event_type", "n_live", "sum_value_micro")
        .select(col("event_type"), col("n_live"), col("sum_value_micro"),
          expr("sum_value_micro div n_live").as("avg_value_micro"))
        .orderBy("event_type")
    }, Some(envCte +
      """
        |, r AS (
        |  SELECT user_id, lsn, op, after_event_type,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY lsn DESC) AS rn
        |  FROM env)
        |SELECT after_event_type AS event_type,
        |       CAST(count(*) AS BIGINT) AS n_live,
        |       CAST(sum(lsn % 997) AS BIGINT) AS sum_value_micro,
        |       CAST(sum(lsn % 997) // count(*) AS BIGINT) AS avg_value_micro
        |FROM r WHERE rn = 1 AND op != 'd'
        |GROUP BY 1 ORDER BY event_type""".stripMargin))
  )
}
