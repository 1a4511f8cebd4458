package graft.sources

import java.nio.file.{Files, Paths}
import java.util.Base64

import graft.SparkSpec
import graft.cdc.{CdcEnvelope, CdcPipeline, Sinks}

/** pgoutput wire-format decoding: byte-exact frames built per the public
  * PostgreSQL "Logical Replication Message Formats" spec, decoded into
  * CdcEnvelopes, and driven end-to-end through the DSv2 source in binary
  * WAL mode. */
class PgOutputSpec extends SparkSpec {
  import PgOutputFrames._

  private val usersOid = 16385
  private val ts0 = 1600000000000L

  test("decoder: relation registry + insert/update/delete with tx context") {
    val session = new PgOutputSession()
    assert(session.decode(begin(xid = 731, tsMs = ts0), 1L).isEmpty)
    assert(session.decode(
      relation(usersOid, "schema1", "users", Seq("id", "full_name")), 1L).isEmpty)

    val ins = session.decode(
      insert(usersOid, Seq(Some("1"), Some("susan smith"))), 2L)
    assert(ins == Seq(CdcEnvelope(2L, 731L, ts0, "c", "experiment",
      "schema1", "users", Map.empty,
      Map("id" -> "1", "full_name" -> "susan smith"))))

    val upd = session.decode(
      update(usersOid, Some(Seq(Some("1"), Some("susan smith"))),
        Seq(Some("1"), Some("sue smith"))), 3L)
    assert(upd.head.op == "u")
    assert(upd.head.before("full_name") == "susan smith")
    assert(upd.head.after("full_name") == "sue smith")

    val del = session.decode(
      delete(usersOid, Seq(Some("1"), Some("sue smith"))), 4L)
    assert(del.head.op == "d")
    assert(del.head.after.isEmpty)
    assert(del.head.before("id") == "1")

    assert(session.decode(commit(), 4L).isEmpty)
    // null column → omitted from the image
    val insNull = session.decode(
      insert(usersOid, Seq(Some("9"), None)), 5L)
    assert(insNull.head.after == Map("id" -> "9"))
  }

  test("binary WAL end-to-end: pgoutput frames through format(graft-cdc)") {
    def line(lsn: Long, frame: Array[Byte]): String =
      s"$lsn ${Base64.getEncoder.encodeToString(frame)}"
    val wal = Seq(
      line(1, begin(731, ts0)),
      line(1, relation(usersOid, "schema1", "users", Seq("id", "full_name"))),
      line(2, insert(usersOid, Seq(Some("1"), Some("susan smith")))),
      line(3, insert(usersOid, Seq(Some("2"), Some("anne smith")))),
      line(4, commit()),
      line(5, begin(732, ts0 + 1000)),
      line(5, relation(usersOid + 1, "schema2", "users", Seq("id", "full_name"))),
      line(6, insert(usersOid + 1, Seq(Some("1"), Some("bob smith")))),
      line(7, delete(usersOid, Seq(Some("2"), Some("anne smith")))),
      line(8, commit()))
    val log = Paths.get(tmpDir("pgout"), "wal.bin")
    Files.write(log, wal.mkString("\n").getBytes)

    // batch read
    val df = spark.read.format("graft-cdc")
      .option("walFormat", "pgoutput").load(log.toString)
    assert(df.count() == 4) // 3 inserts + 1 delete
    import spark.implicits._
    val envs = df.as[CdcEnvelope].collect().sortBy(_.lsn)
    assert(envs.map(_.op).toSeq == Seq("c", "c", "c", "d"))
    assert(envs.head.txId == 731L && envs.last.schema == "schema1")

    // streaming: compaction counts deletes correctly off the binary WAL
    val ns = s"pgout-${java.util.UUID.randomUUID()}"
    val sink = Sinks.MemoryDb.table(ns, CdcPipeline.countTable)
    val q = CdcPipeline.liveCountPerSchema(
      spark.readStream.format("graft-cdc")
        .option("walFormat", "pgoutput").load(log.toString).as[CdcEnvelope],
      Sinks.MemoryDb.factory(ns), tmpDir("pgout-ckpt"))
    q.processAllAvailable(); q.stop()
    assert(sink.snapshot.view.mapValues(_("user_count")).toMap ==
      Map("schema1" -> 1L, "schema2" -> 1L))
  }
}
