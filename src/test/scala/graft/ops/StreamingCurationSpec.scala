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
}
