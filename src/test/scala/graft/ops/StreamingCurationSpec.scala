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
}
