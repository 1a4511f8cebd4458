package graft.sources

import graft.SparkSpec
import graft.cdc.{CdcEnvelope, CdcPipeline}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** K1 exercised through a REAL `writeStream` sink boundary (reference
  * FlinkPulsarSink, CustomJob.java:93-118), and the written topic read
  * back as a keyed changelog with metadata columns — the reference's
  * `upsert-pulsar` round trip (CustomJob.java:156-174). */
class GraftTopicSpec extends SparkSpec {
  import spark.implicits._

  private def users(lsn: Long, op: String, schema: String, id: Long,
      name: String): CdcEnvelope =
    CdcEnvelope(lsn, lsn, 1600000000000L + lsn, op, "experiment", schema,
      "users",
      before = if (op == "c") Map.empty
        else Map("id" -> id.toString, "full_name" -> name),
      after = if (op == "d") Map.empty
        else Map("id" -> id.toString, "full_name" -> name))

  test("K1 end to end: demux -> keyed JSON -> writeStream -> topic") {
    TopicStore.clear("users-topic")
    val input = MemoryStream[CdcEnvelope]
    val frame = CdcPipeline.usersTopicFrame(input.toDS())
    val q = frame.writeStream
      .format("graft-topic").option("topic", "users-topic")
      .option("checkpointLocation", tmpDir("topic-k1"))
      .start()
    input.addData(Seq(
      users(1, "c", "schema1", 1, "susan smith"),
      users(2, "c", "schema1", 2, "anne smith")))
    q.processAllAvailable()
    input.addData(Seq(users(3, "u", "schema1", 1, "sue smith")))
    q.processAllAvailable()
    q.stop()

    val msgs = TopicStore.read("users-topic")
    assert(msgs.map(_.key) == Seq("schema1|1", "schema1|2", "schema1|1"))
    // sequence ids are assigned at commit, monotone per topic
    assert(msgs.map(_.sequenceId) == Seq(0L, 1L, 2L))
    assert(msgs.head.value ==
      """{"key":"schema1|1","op":"c","schema":"schema1","table":"users","fullName":"susan smith","id":1}""")
  }

  test("S3 round trip: topic read back as changelog, latest sequenceId wins") {
    // the written topic consumed exactly like the reference's
    // upsert-pulsar source: batch read with metadata columns, then
    // latest-per-key compaction on the sequence id
    val df = spark.read.format("graft-topic").option("topic", "users-topic").load()
    assert(df.columns.toSeq == Seq("key", "value", "topic", "sequenceId"))
    val latest = df
      .groupBy("key")
      .agg(max_by(col("value"), col("sequenceId")).as("value"))
      .withColumn("full_name", get_json_object(col("value"), "$.fullName"))
      .select("key", "full_name")
      .as[(String, String)].collect().toMap
    assert(latest == Map(
      "schema1|1" -> "sue smith", // the update superseded the insert
      "schema1|2" -> "anne smith"))
  }

  test("S3 live: topic streams back incrementally into compaction") {
    TopicStore.clear("live-topic")
    val input = MemoryStream[CdcEnvelope]
    // producer: CDC -> keyed JSON -> topic sink
    val producer = CdcPipeline.usersTopicFrame(input.toDS())
      .writeStream.format("graft-topic").option("topic", "live-topic")
      .option("checkpointLocation", tmpDir("live-prod"))
      .start()
    // consumer: the written topic as a STREAM -> latest-per-key counts
    val latest = spark.readStream.format("graft-topic")
      .option("topic", "live-topic").load()
      .select(col("key"), col("sequenceId"),
        get_json_object(col("value"), "$.op").as("op"))
    val consumer = latest.writeStream
      .outputMode("append")
      .format("memory").queryName("live_feed")
      .option("checkpointLocation", tmpDir("live-cons"))
      .start()

    input.addData(Seq(
      users(1, "c", "schema1", 1, "susan smith"),
      users(2, "c", "schema1", 2, "anne smith")))
    producer.processAllAvailable()
    consumer.processAllAvailable()
    assert(spark.table("live_feed").count() == 2)

    input.addData(Seq(users(3, "d", "schema1", 2, null)))
    producer.processAllAvailable()
    consumer.processAllAvailable() // only the NEW sequence id arrives
    producer.stop(); consumer.stop()

    val feed = spark.table("live_feed")
      .select("key", "sequenceId", "op")
      .as[(String, Long, String)].collect().sortBy(_._2).toSeq
    assert(feed.map(_._2) == Seq(0L, 1L, 2L)) // incremental, no replays
    // upsert view over the feed: delete removes schema1|2
    val live = feed.groupBy(_._1).map { case (k, rows) => k -> rows.last._3 }
      .filter(_._2 != "d").keys.toSet
    assert(live == Set("schema1|1"))
  }

  test("batch produce (backfill path): write round-trips through a " +
      "batch read with dense sequence ids") {
    import org.apache.spark.sql.functions._
    TopicStore.clear("backfill-topic")
    (1 to 5).map(i => (s"k$i", s"v$i")).toDF("key", "value")
      .repartition(3)
      .write.format("graft-topic").option("topic", "backfill-topic")
      .mode("append").save()
    val back = spark.read.format("graft-topic")
      .option("topic", "backfill-topic").load()
      .select("key", "value", "sequenceId")
      .as[(String, String, Long)].collect().sortBy(_._3)
    assert(back.length == 5)
    assert(back.map(_._3).toSeq == (0L until 5L)) // dense ids
    assert(back.map(t => (t._1, t._2)).toSet ==
      (1 to 5).map(i => (s"k$i", s"v$i")).toSet)
    // a second batch job APPENDS (backfill semantics), ids keep rising
    Seq(("k9", "v9")).toDF("key", "value")
      .write.format("graft-topic").option("topic", "backfill-topic")
      .mode("append").save()
    assert(TopicStore.size("backfill-topic") == 6L)
    assert(TopicStore.read("backfill-topic").last.sequenceId == 5L)
  }

  test("epoch replay is dropped: sink commit is idempotent per (query, epoch)") {
    TopicStore.clear("replay-topic")
    TopicStore.commit("replay-topic", "q1", 0L, Seq(("k1", "v1")))
    TopicStore.commit("replay-topic", "q1", 0L, Seq(("k1", "v1"))) // retry
    TopicStore.commit("replay-topic", "q1", 1L, Seq(("k2", "v2")))
    TopicStore.commit("replay-topic", "q2", 0L, Seq(("k3", "v3"))) // other query
    assert(TopicStore.read("replay-topic").map(m => (m.key, m.sequenceId)) ==
      Seq(("k1", 0L), ("k2", 1L), ("k3", 2L)))
  }
}
