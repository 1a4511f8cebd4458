package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.cdc.{CdcEnvelope, Demux}
import org.apache.spark.sql.functions._

/** The `malformed` policy of the jsonl CDC source: one corrupt line in a
  * 100 TB replay must be a routed, auditable event — not a stream-killer
  * (quarantine) — unless the operator wants stop-the-world (fail, the
  * default). Structurally corrupt lines (no parseable LSN) are indexed
  * at their predecessor's LSN so offset accounting stays monotone and
  * the stream advances past the damage either way. */
class MalformedWalSpec extends SparkSpec {
  import spark.implicits._

  private def writeWal(lines: Seq[String]): String = {
    val p = Paths.get(tmpDir("bad-wal"), "wal.jsonl")
    Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  private def good(lsn: Long, id: Long): String =
    s"""{"lsn":$lsn,"txId":$lsn,"tsMs":$lsn,"op":"c","db":"d",""" +
      s""""schema":"s1","table":"users","before":{},""" +
      s""""after":{"id":"$id","full_name":"u$id"}}"""

  private val wal = Seq(
    good(1, 1),
    good(2, 2),
    """{"oops this is not json at all""", // structural: no LSN → rides lsn 2
    """{"lsn":4,"txId":4,"tsMs":4,"before":{},"after":{"id":"9"}}""", // no op
    good(5, 3))

  test("quarantine: damage becomes _quarantine rows, good rows intact") {
    val df = spark.read.format("graft-cdc")
      .option("malformed", "quarantine")
      .load(writeWal(wal))
    assert(df.count() == 5)
    val bad = df.filter(col("table") === "_quarantine")
      .select("lsn", "op", "after").collect()
    assert(bad.length == 2)
    assert(bad.forall(_.getString(1) == "bad"))
    // structural line is indexed at its predecessor's LSN (2); the
    // shape-damaged line keeps its own (4); both preserve the raw text
    assert(bad.map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
    assert(bad.forall(r =>
      r.getMap[String, String](2).get("raw").exists(_.nonEmpty)))
    // typed consumers never see quarantine rows: the T3 demux contract
    // (unknown tables drop) already routes them away
    assert(Demux.users(df.as[CdcEnvelope]).count() == 3)
  }

  test("fail (default): the corrupt line stops the world with context") {
    val df = spark.read.format("graft-cdc").load(writeWal(wal))
    val ex = intercept[Exception] { df.count() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        messages(e.getCause))
    assert(messages(ex).exists(_.contains("malformed CDC envelope")),
      s"unexpected failure: ${messages(ex).take(3).mkString(" | ")}")
  }

  test("streaming quarantine: offsets advance past the damage") {
    val events = spark.readStream.format("graft-cdc")
      .option("malformed", "quarantine")
      .option("maxEventsPerBatch", "2") // damage lands mid-batch sequence
      .load(writeWal(wal)).as[CdcEnvelope]
    val q = events.writeStream
      .outputMode("append")
      .option("checkpointLocation", tmpDir("bad-wal-ckpt"))
      .format("memory").queryName("bad_wal_stream").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("bad_wal_stream")
    assert(rows.count() == 5, "stream must deliver all lines incl. DLQ rows")
    assert(rows.filter(col("table") === "_quarantine").count() == 2)
    assert(rows.agg(max("lsn")).head().getLong(0) == 5L,
      "the stream must reach the post-damage tail")
  }
}
