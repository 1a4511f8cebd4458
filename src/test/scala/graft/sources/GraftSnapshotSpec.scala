package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Layout

/** The `graft-snapshot` streaming source: offsets = snapshot ids,
  * micro-batches = manifest file-set diffs, schema from the manifest.
  * The oracle-graded end-to-end run (three appends, restart mid-stream)
  * is st20; these pin the semantics the oracle can't see — per-batch
  * partition fan-out, empty commits, admission control, batch parity,
  * and loud failure on an unsupported column type. */
class GraftSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def commitRange(t: String, lo: Long, hi: Long): Unit = {
    Layout.appendSnapshot(
      spark.range(lo, hi).toDF("id")
        .withColumn("tag", concat(lit("r"), col("id") % 3))
        .coalesce(2), t)
    ()
  }

  test("batch read serves the head through the manifest file set") {
    val t = tmpDir("snap-src-batch")
    commitRange(t, 0, 100)
    commitRange(t, 100, 150)
    val got = spark.read.format("graft-snapshot").load(t)
    assert(got.schema.fieldNames.toSeq == Seq("id", "tag"))
    assert(got.count() == 150)
    assert(got.agg(sum("id")).head().getLong(0) == (0L until 150L).sum)
    // asOfSnapshot time-travels the batch read
    assert(spark.read.format("graft-snapshot")
      .option("asOfSnapshot", "1").load(t).count() == 100)
  }

  test("streaming: one commit per micro-batch, resume after restart, " +
      "empty and zero-file commits advance cleanly") {
    val t = tmpDir("snap-src-stream")
    val out = tmpDir("snap-src-out")
    val ckpt = tmpDir("snap-src-ckpt")
    commitRange(t, 0, 40)
    commitRange(t, 40, 60)
    // a zero-row append: manifest advances, no files — the batch for
    // this transition must be EMPTY, not an error
    Layout.appendSnapshot(
      spark.range(0, 0).toDF("id").withColumn("tag", lit("x")), t)
    var batches = Vector.empty[(Long, Long)] // (batchId, rows)
    def run(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("maxSnapshotsPerTrigger", "1")
        .load(t)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val n = b.count()
            batches :+= (id, n)
            b.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(out)
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    // three transitions → three micro-batches, sized per commit
    assert(batches == Vector((0L, 40L), (1L, 20L), (2L, 0L)), batches)
    // a commit while the stream is DOWN; restart resumes, re-reads nothing
    commitRange(t, 60, 90)
    run()
    assert(batches.last == (3L, 30L), batches)
    val back = spark.read.parquet(out)
    assert(back.count() == 90)
    assert(back.select("id").distinct().count() == 90)
    // batch attribution: each id consumed in the batch its commit made
    val byBatch = back.groupBy("batch_id").agg(min("id"), max("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(byBatch == Set((0L, 0L, 39L), (1L, 40L, 59L), (3L, 60L, 89L)))
  }

  test("planInputPartitions fans out one partition per data file") {
    val t = tmpDir("snap-src-fan")
    Layout.appendSnapshot(
      spark.range(0, 1000).toDF("id").withColumn("tag", lit("a"))
        .repartition(8), t)
    val files = Layout.changedFilePaths(spark, t, 0, 1)
    assert(files.size == 8, files)
    val got = spark.read.format("graft-snapshot").load(t)
    assert(got.rdd.getNumPartitions == 8)
    assert(got.count() == 1000)
  }

  test("unsupported column type fails loudly at table construction") {
    val t = tmpDir("snap-src-bad")
    Layout.commitSnapshot(
      Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "emb").coalesce(1), t)
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft-snapshot").load(t).count())
    assert(e.getMessage.contains("unsupported column type"))
    assert(e.getMessage.contains("emb"))
  }

  test("reading an uncommitted table names the problem") {
    val t = tmpDir("snap-src-none")
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft-snapshot").load(t).count())
    assert(e.getMessage.contains("no committed snapshot"))
  }
}
