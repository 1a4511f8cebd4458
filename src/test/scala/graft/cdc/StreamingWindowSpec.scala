package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming forms of T6 (flatMap word split) and T7 (tumbling window +
  * sum) — the reference's commented-out intended capability
  * (StreamingJob.java:89-100), with event-time + watermark (closing the
  * reference's `eventTime` TODO, CustomJob.java:201). */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("T6/T7: tumbling 5s window word count over a stream") {
    val input = MemoryStream[(Timestamp, String)]
    val words = input.toDF().toDF("ts", "line")
      .withWatermark("ts", "10 seconds")
      .select(col("ts"), explode(split(col("line"), " ")).as("word"))
      .groupBy(window(col("ts"), "5 seconds"), col("word"))
      .agg(count(lit(1)).as("n"))

    val q = words.writeStream
      .outputMode("update")
      .format("memory").queryName("wordcounts")
      .option("checkpointLocation", tmpDir("t7"))
      .start()

    def t(s: Long) = new Timestamp(1600000000000L + s * 1000)
    input.addData(Seq(
      (t(0), "to be or not"), (t(1), "to be"),
      (t(7), "be be")))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("wordcounts")
      .select(col("window.start").cast("long").as("start"),
        col("word"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    val w0 = 1600000000L
    val w1 = 1600000005L
    assert(out.contains((w0, "to", 2L)))
    assert(out.contains((w0, "be", 2L)))
    assert(out.contains((w0, "or", 1L)))
    assert(out.contains((w0, "not", 1L)))
    assert(out.contains((w1, "be", 2L)))
  }

  test("sliding window: overlapping assignment with watermark state") {
    // size 10s / slide 5s: an event at t lands in the window starting at
    // its 5s bucket AND the one before it — t8's streaming twin
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds", "5 seconds"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .outputMode("update")
      .format("memory").queryName("sliding")
      .option("checkpointLocation", tmpDir("t8"))
      .start()
    def t(s: Long) = new Timestamp(1600000000000L + s * 1000)
    input.addData(Seq((t(1), "a"), (t(6), "a"), (t(7), "b")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sliding")
      .select(col("window.start").cast("long").as("start"), col("k"),
        col("n"))
      .as[(Long, String, Long)].collect().toSet
    val b = 1600000000L
    // event@1 -> windows [-5,5) start b-5 and [0,10) start b;
    // event@6 -> [0,10) start b and [5,15) start b+5
    assert(out.contains((b - 5, "a", 1L)))
    assert(out.contains((b, "a", 2L)))
    assert(out.contains((b + 5, "a", 1L)))
    assert(out.contains((b + 5, "b", 1L)))
  }

  test("session window: gap-based sessionization per key") {
    val input = MemoryStream[(Timestamp, String, Double)]
    val sessions = input.toDF().toDF("ts", "user", "v")
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window(col("ts"), "5 seconds"), col("user"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))

    val q = sessions.writeStream
      .outputMode("complete")
      .format("memory").queryName("sessions")
      .option("checkpointLocation", tmpDir("sess"))
      .start()

    def t(s: Long) = new Timestamp(1600000000000L + s * 1000)
    // u1: events at 0,3,6 (one session: gaps < 5s), then 20 (new session)
    input.addData(Seq(
      (t(0), "u1", 1.0), (t(3), "u1", 1.0), (t(6), "u1", 1.0),
      (t(20), "u1", 5.0),
      (t(0), "u2", 2.0)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions")
      .select(col("user"), col("n"), col("sv"))
      .as[(String, Long, Double)].collect().toSet
    assert(out == Set(("u1", 3L, 3.0), ("u1", 1L, 5.0), ("u2", 1L, 2.0)))
  }

  test("T7 processing-time emulation: ingestion-time column + tumbling window") {
    // Spark windows are event-time; the reference's processing-time window
    // (StreamingJob.java:94-100) is emulated by stamping an ingestion-time
    // column at the source and windowing on it (SURVEY §7.5 #4).
    val input = MemoryStream[String]
    val counted = input.toDF().toDF("word")
      .withColumn("ingest_ts", current_timestamp())
      .groupBy(window(col("ingest_ts"), "5 seconds"), col("word"))
      .agg(count(lit(1)).as("n"))
    val q = counted.writeStream
      .outputMode("complete")
      .format("memory").queryName("proctime")
      .option("checkpointLocation", tmpDir("proctime"))
      .start()
    input.addData("a", "b", "a")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("proctime").select("word", "n")
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }

  test("T7 processing-time emulation over a rate-limited source") {
    // The same ingestion-time emulation driven by Spark's rate-limited
    // source (rate-micro-batch: a fixed row budget per micro-batch —
    // the backpressured-ingest shape). Assertions are structural, not
    // timing-dependent: windows are 5s-aligned, and in complete mode
    // every emitted value is counted exactly once, so Σn must equal
    // max(value)+1 (rate emits consecutive values from 0).
    val rated = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", 5).load()
      .withColumn("ingest_ts", current_timestamp())
      .groupBy(window(col("ingest_ts"), "5 seconds"))
      .agg(count(lit(1)).as("n"), max("value").as("max_v"))
    val q = rated.writeStream
      .outputMode("complete")
      .format("memory").queryName("ratewin")
      .option("checkpointLocation", tmpDir("ratewin"))
      .start()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    def total(): Long = spark.table("ratewin")
      .agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
    while (total() < 15 && System.nanoTime() < deadline) Thread.sleep(200)
    q.stop()
    val rows = spark.table("ratewin")
      .select(unix_timestamp(col("window.start")).as("ws"),
        unix_timestamp(col("window.end")).as("we"), col("n"), col("max_v"))
      .collect()
    assert(rows.nonEmpty, "no windows produced within the deadline")
    assert(rows.forall(r => r.getLong(0) % 5 == 0 &&
      r.getLong(1) - r.getLong(0) == 5), "windows not 5s-aligned tumbles")
    val sumN = rows.map(_.getLong(2)).sum
    val maxV = rows.map(_.getLong(3)).max
    assert(sumN == maxV + 1,
      s"count conservation broken: sum(n)=$sumN, max(value)=$maxV")
  }

  test("watermark drops data later than the threshold") {
    val input = MemoryStream[(Timestamp, String)]
    val counts = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "5 seconds"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream
      .outputMode("update")
      .format("memory").queryName("latecheck")
      .option("checkpointLocation", tmpDir("late"))
      .start()
    def t(s: Long) = new Timestamp(1600000000000L + s * 1000)
    input.addData(Seq((t(0), "a")))
    q.processAllAvailable()
    input.addData(Seq((t(200), "a"))) // advances watermark to ~190s
    q.processAllAvailable()
    input.addData(Seq((t(0), "a")))   // far later than watermark → dropped
    q.processAllAvailable()
    q.stop()
    val w0 = spark.table("latecheck")
      .filter(col("window.start").cast("long") === 1600000000L)
      .select("n").as[Long].collect()
    // the t=0 window still counts exactly 1 — the late replay was dropped
    assert(w0.toSeq == Seq(1L))
  }

  test("streaming exact dedup: dropDuplicates keeps first occurrence across batches") {
    val input = MemoryStream[(String, String)]
    val q = input.toDF().toDF("key", "payload")
      .dropDuplicates("key")
      .writeStream
      .outputMode("append")
      .format("memory").queryName("deduped")
      .option("checkpointLocation", tmpDir("dedup"))
      .start()
    input.addData(("k1", "a"), ("k2", "b"), ("k1", "c"))
    q.processAllAvailable()
    input.addData(("k1", "d"), ("k3", "e")) // k1 already seen (state)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("deduped").as[(String, String)].collect().toMap
    assert(out.keySet == Set("k1", "k2", "k3"))
    assert(out("k1") == "a") // first occurrence wins
  }

  test("dedup within watermark on RocksDB: bounded state, eviction re-admits") {
    // dropDuplicates holds every key forever; WithinWatermark bounds the
    // state to the delay window — the scale-correct streaming dedup. Run
    // on the RocksDB provider (the backend for 100 TB key cardinalities).
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Timestamp, String, String)]
      val deduped = graft.ops.Dedup.streamingDedupWithinWatermark(
        input.toDF().toDF("ts", "key", "payload"), "ts", "10 seconds",
        Seq("key"))
      val q = deduped.writeStream
        .outputMode("append")
        .format("memory").queryName("wmdedup")
        .option("checkpointLocation", tmpDir("wmdedup"))
        .start()
      def t(s: Long) = new Timestamp(1600000000000L + s * 1000)
      input.addData((t(0), "k1", "a"), (t(1), "k1", "b"), (t(2), "k2", "c"))
      q.processAllAvailable()
      // duplicate within the window: suppressed
      input.addData(Seq((t(3), "k1", "d")))
      q.processAllAvailable()
      // advance event time far past the delay → k1 state evicted
      input.addData(Seq((t(300), "k3", "e")))
      q.processAllAvailable()
      // same key re-arrives AFTER eviction → admitted again (bounded
      // state trades exactly-once-ever for exactly-once-per-window)
      input.addData(Seq((t(301), "k1", "f")))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("wmdedup").as[(Timestamp, String, String)]
        .collect().map(r => (r._2, r._3)).toSeq.sorted
      assert(out == Seq(("k1", "a"), ("k1", "f"), ("k2", "c"), ("k3", "e")))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming simhash near-dedup: cross-batch state drops repeats, keeps novel docs") {
    graft.functions.GraftFunctions.register(spark)
    val input = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val votes = graft.ops.Dedup.streamingSimhashVotes(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = votes.writeStream
      .outputMode("append")
      .option("checkpointLocation", tmpDir("simdedup"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.ops.SimVote], id: Long) =>
        val ids = graft.ops.Dedup.keptFromVotes(batch.toDF())
          .select("doc_id").as[Long].collect()
        kept.synchronized { kept ++= ids }
        ()
      }
      .start()
    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    val b = "completely different words about spark catalyst codegen and shuffles"
    input.addData((1L, a), (2L, a), (3L, b)) // 2 is an exact near-dup of 1
    q.processAllAvailable()
    input.addData((4L, a), (5L, "yet another entirely novel document body here"))
    q.processAllAvailable() // 4 dups against batch-1 STATE, 5 is novel
    q.stop()
    assert(kept.sorted.toSeq == Seq(1L, 3L, 5L))
  }

  test("streaming canonical-URL dedup: tracking variants collapse in-flight") {
    // WebOps.canonicalize is a stateless projection, so it lifts onto
    // readStream unchanged; composed with watermark-bounded dedup it is
    // the crawl-frontier gate — the same page fetched with different
    // tracking params or case is admitted once per window.
    val input = MemoryStream[(Timestamp, Long, String)]
    val gated = graft.ops.Dedup.streamingDedupWithinWatermark(
      graft.ops.WebOps.canonicalize(
        input.toDF().toDF("ts", "doc_id", "url"), "url"),
      "ts", "10 seconds", Seq("canon_url"))
    val q = gated.writeStream
      .outputMode("append")
      .format("memory").queryName("urlgate")
      .option("checkpointLocation", tmpDir("urlgate"))
      .start()
    def t(s: Long) = new Timestamp(1600000000000L + s * 1000)
    input.addData(
      (t(0), 1L, "https://News.Example.com/a?q=1&utm_source=x"),
      (t(1), 2L, "https://news.example.com/a/?q=1#top"),   // same page
      (t(2), 3L, "https://news.example.com/b?q=1"))        // different path
    q.processAllAvailable()
    input.addData(Seq((t(3), 4L, "HTTPS://news.example.com/a?ref=tw&q=1")))
    q.processAllAvailable() // still the same canonical page → suppressed
    q.stop()
    val got = spark.table("urlgate")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L),
      s"canonical gate admitted the wrong fetches: $got")
  }

  test("T1 streaming: union of two streams into one sink") {
    val a = MemoryStream[String]
    val b = MemoryStream[String]
    val q = a.toDS().union(b.toDS()).writeStream
      .format("memory").queryName("unioned")
      .option("checkpointLocation", tmpDir("t1"))
      .start()
    a.addData("x", "y")
    b.addData("z")
    q.processAllAvailable()
    q.stop()
    assert(spark.table("unioned").as[String].collect().toSet == Set("x", "y", "z"))
  }
}
