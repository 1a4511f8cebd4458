package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The curation ops are stateless projections/filters, so they lift onto
  * streaming DataFrames unchanged — a continuously-curating ingest
  * pipeline (file stream → quality gate → normalized output). */
class StreamingCurationSpec extends SparkSpec {

  test("quality + normalize run over a file stream") {
    // stage the documents parquet as a streamed directory
    val dir = tmpDir("stream-docs")
    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    src.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(src.schema).parquet(dir)
    val curated = TextOps.quality(stream, "doc_id", "text", "n_chars",
        Seq("the", "and", "of"))
      .filter(col("quality_ok"))
    val q = curated.writeStream
      .outputMode("append")
      .format("memory").queryName("curated_stream")
      .option("checkpointLocation", tmpDir("cur-ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("curated_stream").count()
    val batch = TextOps.quality(src, "doc_id", "text", "n_chars",
      Seq("the", "and", "of")).filter(col("quality_ok")).count()
    assert(streamed == batch && streamed > 0,
      s"stream=$streamed batch=$batch")
  }

  test("classifier gate runs over a file stream (stateless lift)") {
    val dir = tmpDir("clf-docs")
    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    src.write.mode("overwrite").parquet(dir)
    val w = Map("fast" -> 150000L, "slow" -> -140000L)
    val stream = spark.readStream.schema(src.schema).parquet(dir)
    val gated = TextOps.classifierScore(stream, "doc_id", "text", w,
      thresholdMicro = 1L).filter(col("keep"))
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("clf_stream")
      .option("checkpointLocation", tmpDir("clf-ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("clf_stream").count()
    val batch = TextOps.classifierScore(src, "doc_id", "text", w,
      thresholdMicro = 1L).filter(col("keep")).count()
    assert(streamed == batch && streamed > 0,
      s"stream=$streamed batch=$batch")
  }

  test("WARC stream -> parse -> URL gate -> classifier gate composes") {
    // a crawl firehose: two archive files of real WARC records
    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(40)
      .withColumn("url", concat(
        lit("https://"),
        when(col("doc_id") % 4 === 0, "blocked.example").otherwise("ok.org"),
        lit("/doc/"), col("doc_id").cast("string")))
      .withColumn("wdate", lit("2026-01-01T00:00:00Z"))
    val recs = src.select(col("doc_id"),
      WebOps.warcResponse("url", "wdate", "text").as("rec"))
    val dir = tmpDir("warc-stream")
    recs.filter(col("doc_id") % 2 === 0)
      .select(concat_ws("", collect_list(col("rec"))).as("f"))
      .collect().headOption.foreach(r => java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "a.warc"), r.getString(0).getBytes))
    recs.filter(col("doc_id") % 2 === 1)
      .select(concat_ws("", collect_list(col("rec"))).as("f"))
      .collect().headOption.foreach(r => java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "b.warc"), r.getString(0).getBytes))

    def curate(rows: org.apache.spark.sql.DataFrame) = {
      val parsed = WebOps.parseWarc(rows, "value").filter(col("warc_ok"))
      val allowed = WebOps
        .urlFilter(parsed, "target_uri", Seq("blocked.example"), Nil)
        .filter(col("url_ok"))
      TextOps.classifierScore(allowed, "target_uri", "payload",
        Map("fast" -> 1L), thresholdMicro = 1L)
    }
    val stream = spark.readStream
      .option("lineSep", "WARC/1.1\r\n").text(dir)
      .filter(length(col("value")) > 0)
    val q = curate(stream).writeStream.outputMode("append")
      .format("memory").queryName("warc_curated")
      .option("checkpointLocation", tmpDir("warc-ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    val batchRows = spark.read.option("lineSep", "WARC/1.1\r\n").text(dir)
      .filter(length(col("value")) > 0)
    val streamed = spark.table("warc_curated").count()
    val batch = curate(batchRows).count()
    assert(streamed == batch && streamed == 30,
      s"stream=$streamed batch=$batch") // 40 records minus the 10 blocked
  }

  test("mixture sampling + z-order key run over a file stream") {
    val dir = tmpDir("stream-docs-mix")
    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    src.write.mode("overwrite").parquet(dir)

    val weights = Map("src0" -> 1000, "src1" -> 500)
    val stream = spark.readStream.schema(src.schema).parquet(dir)
    val sampled = Layout.zorder(
      TextOps.mixtureSample(stream, "source", "text", weights, defaultPm = 0)
        .select(col("doc_id"), col("source"),
          col("n_chars").as("x"), (col("doc_id") % 1024).as("y")),
      Seq("x", "y"), bits = 10)
    val q = sampled.writeStream
      .outputMode("append")
      .format("memory").queryName("mixture_stream")
      .option("checkpointLocation", tmpDir("mix-ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("mixture_stream")
    val batch = Layout.zorder(
      TextOps.mixtureSample(src, "source", "text", weights, defaultPm = 0)
        .select(col("doc_id"), col("source"),
          col("n_chars").as("x"), (col("doc_id") % 1024).as("y")),
      Seq("x", "y"), bits = 10)
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    // content-hash sampling is deterministic: the kept doc ids and their
    // z keys match the batch run exactly
    assert(streamed.select("doc_id", "z_value").exceptAll(
      batch.select("doc_id", "z_value")).count() == 0)
  }

  test("BPE tokenize + id encode run over a file stream (stateless lift)") {
    // the train-once/apply-forever split: the model is a batch artifact,
    // the apply is a pure projection — so a crawl ingest stream can
    // tokenize continuously with no state and no re-training
    val dir = tmpDir("bpe-docs")
    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    src.write.mode("overwrite").parquet(dir)
    val model = Tokenizer.trainBpe(src, "text", numMerges = 40)

    val stream = spark.readStream.schema(src.schema).parquet(dir)
    val ids = Tokenizer.encodeIds(
      Tokenizer.tokenize(stream, "doc_id", "text", model),
      "doc_id", "tokens", model)
    val q = ids.writeStream.outputMode("append")
      .format("memory").queryName("bpe_stream")
      .option("checkpointLocation", tmpDir("bpe-ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("bpe_stream")
      .select(sum(size(col("token_ids")))).collect()(0).getLong(0)
    val batch = Tokenizer.encodeIds(
      Tokenizer.tokenize(src, "doc_id", "text", model),
      "doc_id", "tokens", model)
      .select(sum(size(col("token_ids")))).collect()(0).getLong(0)
    assert(streamed == batch && streamed > 0)
  }

  test("semantic decontamination runs over an embedding stream") {
    val dir = tmpDir("sem-vecs")
    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    src.write.mode("overwrite").parquet(dir)
    val bench = src.filter(col("vec_id") % 50 === 0)

    val stream = spark.readStream.schema(src.schema).parquet(dir)
    val marked = Similarity.semanticDecontam(
      stream.filter(col("vec_id") % 50 =!= 0), bench,
      "vec_id", "embedding", minCos = 0.25)
    val q = marked.writeStream.outputMode("append")
      .format("memory").queryName("sem_stream")
      .option("checkpointLocation", tmpDir("sem-ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sem_stream")
    val want = Similarity.semanticDecontam(
      src.filter(col("vec_id") % 50 =!= 0), bench,
      "vec_id", "embedding", minCos = 0.25)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.filter(col("contaminated")).count() ==
      want.filter(col("contaminated")).count())
  }

  test("native sketches aggregate over a stream (state-store merge path)") {
    graft.functions.GraftFunctions.register(spark)
    val dir = tmpDir("stream-docs-sk")
    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    src.write.mode("overwrite").parquet(dir)

    // global streaming aggregation in complete mode: the sketch buffers
    // serialize into the state store and merge across micro-batches —
    // the TypedImperativeAggregate path a continuous corpus monitor uses
    val stream = spark.readStream.schema(src.schema).parquet(dir)
    val agg = stream.groupBy(col("lang"))
      .agg(expr("kll_quantiles(CAST(n_chars AS DOUBLE), 256, array(0.5D))")
        .as("p50"),
        expr("mg_topk(source, 8)").as("hot_sources"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory").queryName("sketch_stream")
      .option("checkpointLocation", tmpDir("sk-ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sketch_stream")
      .select(col("lang"), element_at(col("p50"), 1).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(streamed.nonEmpty)
    // one file, one batch -> estimates must equal the batch run's
    val batch = src.groupBy(col("lang"))
      .agg(expr("kll_quantiles(CAST(n_chars AS DOUBLE), 256, array(0.5D))")
        .as("p50"))
      .select(col("lang"), element_at(col("p50"), 1).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("Observation metrics ride a batch curation pass without a second job") {
    // production telemetry: observe() attaches aggregates to the SAME
    // action (no extra pass over the corpus) — here a quality gate
    // reports volume in/out and mean length from one write
    import org.apache.spark.sql.Observation
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val obs = Observation("gate")
    val gated = TextOps.quality(docs, "doc_id", "text", "n_chars",
        Seq("the", "and", "of"))
      .observe(obs, count(lit(1)).as("rows_in"),
        sum(col("quality_ok").cast("long")).as("rows_kept"),
        avg(col("n_tokens")).as("mean_tokens"))
      .filter(col("quality_ok"))
    val kept = gated.count()
    val m = obs.get
    assert(m("rows_in") == docs.count())
    assert(m("rows_kept") == kept)
    assert(m("mean_tokens").asInstanceOf[Double] > 0)
  }

  test("transformWithState keep-rate monitor: running per-stratum totals") {
    // the Spark 4 arbitrary-state API (StatefulProcessor) behind a
    // curation monitor: state is one counter pair per stratum, updated
    // across micro-batches on the RocksDB provider
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.StreamMonitor.{GateEvent, GateStats}
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[GateEvent]
      val q = StreamMonitor.keepRate(input.toDS()).writeStream
        .outputMode("update")
        .format("memory").queryName("keep_rate")
        .option("checkpointLocation", tmpDir("tws-ckpt"))
        .start()
      input.addData(Seq(GateEvent("web", kept = true),
        GateEvent("web", kept = false), GateEvent("books", kept = true)))
      q.processAllAvailable()
      input.addData(Seq(GateEvent("web", kept = true),
        GateEvent("web", kept = true)))
      q.processAllAvailable()
      q.stop()
      // memory sink in update mode appends each update; the LAST row per
      // stratum carries the running totals across both batches
      val last = spark.table("keep_rate").as[GateStats].collect()
        .groupBy(_.stratum).map { case (s, rows) =>
          s -> rows.maxBy(_.seen) }
      assert(last("web") == GateStats("web", 4L, 3L, 750L))
      assert(last("books") == GateStats("books", 1L, 1L, 1000L))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming sequence assembly: full windows across micro-batches") {
    // continuous training-batch production: per-shard partial windows
    // carry across micro-batches (O(shards×budget) state, RocksDB),
    // and monotone-id arrival reproduces the batch layout exactly
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.StreamAssembler.{PackedSeq, TokDoc}
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select($"doc_id", ($"doc_id" % 2).as("shard"),
          expr("filter(split(text, ' '), x -> length(x) > 0)").as("tokens"))
        .as[TokDoc].collect().sortBy(_.doc_id)
      val budget = 128
      val input = MemoryStream[TokDoc]
      val q = StreamAssembler.assemble(input.toDS(), budget).writeStream
        .outputMode("append")
        .format("memory").queryName("packed_stream")
        .option("checkpointLocation", tmpDir("asm-ckpt"))
        .start()
      val (first, second) = docs.splitAt(docs.length / 2)
      input.addData(first); q.processAllAvailable()
      input.addData(second); q.processAllAvailable()
      q.stop()
      val got = spark.table("packed_stream").as[PackedSeq].collect()
        .sortBy(p => (p.shard, p.window_id))
      // every emitted window is exactly `budget` tokens, ids gapless
      assert(got.nonEmpty)
      got.foreach(p => assert(p.n_tokens == budget &&
        p.tokens.length == budget))
      got.groupBy(_.shard).foreach { case (_, ws) =>
        assert(ws.map(_.window_id).toSeq == ws.indices.map(_.toLong)) }
      // monotone arrival ⇒ identical windows to the batch form
      // (batch keeps tails; the stream holds tails in state)
      val batch = TextOps.assembleSequences(
        docs.toSeq.toDF("doc_id", "shard", "tokens")
          .withColumnRenamed("tokens", "toks"),
        "doc_id", "toks", budget = budget, shards = 2)
        .filter($"n_tokens" === budget)
        .select($"shard", $"window_id", $"tokens").as[(Long, Long, Seq[String])]
        .collect().sortBy(p => (p._1, p._2))
      assert(batch.length == got.length)
      batch.zip(got).foreach { case ((s, w, toks), p) =>
        assert(s == p.shard && w == p.window_id && toks == p.tokens) }
      // conservation: emitted + carried == total input tokens
      val total = docs.map(_.tokens.length.toLong).sum
      val emitted = got.map(_.n_tokens).sum
      assert(emitted <= total && total - emitted < 2L * budget)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("assembled windows stream into binary trainer shards (graft-shards)") {
    // the topology's LAST hop: continuously produced packed windows
    // land in the same GSH1 trainer files the batch exporter writes —
    // per-epoch two-phase commit, so every visible record belongs to a
    // committed micro-batch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.StreamAssembler.TokDoc
    import graft.sources.ShardFiles
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select($"doc_id", ($"doc_id" % 2).as("shard"),
          expr("filter(split(text, ' '), x -> length(x) > 0)").as("tokens"))
        .as[TokDoc].collect().sortBy(_.doc_id)
      val budget = 128
      val toIds = "transform(tokens, t -> CAST(length(t) AS INT))"
      val dir = tmpDir("shards-e2e")
      val input = MemoryStream[TokDoc]
      val q = StreamAssembler.assemble(input.toDS(), budget)
        .select($"shard", $"window_id", expr(toIds).as("token_ids"))
        .writeStream.format("graft-shards")
        .option("checkpointLocation", tmpDir("shards-e2e-ck"))
        .outputMode("append")
        .start(dir)
      val (first, second) = docs.splitAt(docs.length / 2)
      input.addData(first); q.processAllAvailable()
      input.addData(second); q.processAllAvailable()
      q.stop()
      val got = ShardFiles.read(spark, dir)
        .as[(Long, Long, Seq[Int])].collect().toSet
      val want = TextOps.assembleSequences(
          docs.toSeq.toDF("doc_id", "shard", "tokens")
            .withColumnRenamed("tokens", "toks"),
          "doc_id", "toks", budget = budget, shards = 2)
        .filter($"n_tokens" === budget)
        .withColumn("tokens", $"tokens") // keep name for the id mapping
        .select($"shard", $"window_id", expr(toIds).as("token_ids"))
        .as[(Long, Long, Seq[Int])].collect().toSet
      assert(got.nonEmpty && got == want,
        s"stream shards != batch shards: ${got.size} vs ${want.size}")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("CDC envelopes -> curation gate -> topic sink compose end to end") {
    // the two halves of the engine in one pipeline: a documents table
    // arriving as CDC change events is demuxed, quality-gated with the
    // curation ops, and published through the keyed-JSON topic sink
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.cdc.{CdcEnvelope, Sinks}
    import spark.implicits._
    graft.sources.TopicStore.clear("curated-docs")

    def doc(lsn: Long, id: Long, text: String): CdcEnvelope =
      CdcEnvelope(lsn, lsn, 1600000000000L + lsn, "c", "experiment",
        "schema1", "documents", before = Map.empty,
        after = Map("doc_id" -> id.toString, "text" -> text))

    val input = MemoryStream[CdcEnvelope]
    val docs = input.toDS()
      .filter(col("table") === "documents" && col("op") =!= "d")
      .select(col("after")("doc_id").cast("long").as("doc_id"),
        col("after")("text").as("text"),
        length(col("after")("text")).cast("bigint").as("n_chars"))
    val curated = TextOps.quality(docs, "doc_id", "text", "n_chars",
        Seq("the", "and", "of"))
      .filter(col("quality_ok"))
      .withColumn("key", col("doc_id").cast("string"))
    val frame = Sinks.keyedJson(curated, Seq("doc_id", "n_tokens"))
    val q = frame.writeStream
      .format("graft-topic").option("topic", "curated-docs")
      .option("checkpointLocation", tmpDir("cdc-cur-ckpt"))
      .start()
    val longText = ("the quick brown fox and the lazy dog of winter " * 4).trim
    input.addData(Seq(
      doc(1, 1, longText),          // passes: >= 100 chars, >= 20 tokens
      doc(2, 2, "too short")))      // gated out
    q.processAllAvailable()
    input.addData(Seq(doc(3, 3, longText + " again")))
    q.processAllAvailable()
    q.stop()

    val msgs = graft.sources.TopicStore.read("curated-docs")
    assert(msgs.map(_.key) == Seq("1", "3"), s"got keys ${msgs.map(_.key)}")
    assert(msgs.head.value.contains("\"doc_id\":1") &&
      msgs.head.value.contains("\"n_tokens\":"))
  }

  test("CDC -> curate -> tokenize -> pack runs as ONE continuous topology") {
    // the full pretraining ingest as a single streaming job: change
    // events in, fixed-budget packed training windows out. Stateless
    // stages (envelope projection, quality gate, BPE apply) lift
    // unchanged; the only state is the assembler's per-shard carry.
    // Monotone-lsn arrival (the CDC case) makes the emitted windows
    // bit-identical to the batch pipeline over the same rows.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.cdc.CdcEnvelope
    import graft.ops.StreamAssembler.{PackedSeq, TokDoc}
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      // train-once/apply-forever: the tokenizer model is a batch
      // artifact; the stream only APPLIES it (pure projection)
      val model = Tokenizer.trainBpe(src, "text", numMerges = 40)
      val budget = 128

      // the SAME curate+tokenize composition serves stream and batch —
      // the equivalence below grades the topology, not two codepaths
      def curateTokenize(docs: org.apache.spark.sql.DataFrame) = {
        val curated = TextOps.quality(docs, "doc_id", "text", "n_chars",
            Seq("the", "and", "of"), passthrough = Seq("text"))
          .filter(col("quality_ok"))
        Tokenizer.tokenize(curated, "doc_id", "text", model)
          .select(col("doc_id"), pmod(col("doc_id"), lit(2))
            .cast("bigint").as("shard"), col("tokens"))
          .as[TokDoc]
      }

      def env(id: Long, text: String): CdcEnvelope =
        CdcEnvelope(id, id, 1600000000000L + id, "c", "experiment",
          "schema1", "documents", before = Map.empty,
          after = Map("doc_id" -> id.toString, "text" -> text))

      val input = MemoryStream[CdcEnvelope]
      val streamDocs = input.toDS()
        .filter(col("table") === "documents" && col("op") =!= "d")
        .select(col("after")("doc_id").cast("long").as("doc_id"),
          col("after")("text").as("text"),
          length(col("after")("text")).cast("bigint").as("n_chars"))
      val q = StreamAssembler.assemble(curateTokenize(streamDocs), budget)
        .writeStream.outputMode("append")
        .format("memory").queryName("cdc_packed")
        .option("checkpointLocation", tmpDir("cdc-pack-ckpt"))
        .start()

      // three monotone micro-batches of change events
      val rows = src.select($"doc_id", $"text").as[(Long, String)]
        .collect().sortBy(_._1)
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        input.addData(chunk.map { case (id, t) => env(id, t) })
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table("cdc_packed").as[PackedSeq].collect()
        .sortBy(p => (p.shard, p.window_id))
      assert(got.nonEmpty)
      got.foreach(p => assert(p.n_tokens == budget))

      // batch twin: same rows as a table, same curate+tokenize, the
      // batch assembler's full windows
      val batchDocs = rows.toSeq.toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")).cast("bigint"))
      val batch = TextOps.assembleSequences(
          curateTokenize(batchDocs).toDF(),
          "doc_id", "tokens", budget = budget, shards = 2)
        .filter($"n_tokens" === budget)
        .select($"shard", $"window_id", $"tokens")
        .as[(Long, Long, Seq[String])]
        .collect().sortBy(p => (p._1, p._2))
      assert(batch.length == got.length,
        s"stream=${got.length} batch=${batch.length} full windows")
      batch.zip(got).foreach { case ((s, w, toks), p) =>
        assert(s == p.shard && w == p.window_id && toks == p.tokens) }
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
