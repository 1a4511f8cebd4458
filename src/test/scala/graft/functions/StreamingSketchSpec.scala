package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The sketch aggregates' merge path exercised by the STREAMING engine:
  * a streaming groupBy holds each group's sketch buffer in the state
  * store and merges every micro-batch's partials into it across
  * triggers. Assertions match each sketch's actual contract:
  *
  *  - KMV's summary (the k smallest distinct hashes) is a pure set
  *    function — merge order can't change it, so streamed == batch
  *    EXACTLY, however the rows split across micro-batches.
  *  - Misra-Gries and KLL summaries are merge-order-dependent (two
  *    valid sketches of the same data can differ), so the streamed
  *    result is graded against their guarantees instead: MG must
  *    surface a 30%-frequency heavy hitter at top-1; a k=256 KLL
  *    median of 3000 values must land within its rank-error bound of
  *    the true median. These mirror the hll1x/qs1x oracle pattern —
  *    invariants, not bit-equality, are what mergeable sketches
  *    promise at 100 TB. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streamed KMV equals batch; MG/KLL honor their bounds") {
    graft.functions.GraftFunctions.register(spark)
    // Skewed fixture: value 424242 carries ~30% of rows per group; the
    // rest spread over ~997 distinct values. Deterministic (no Random).
    val all = (0L until 3000L).map { i =>
      val g = i % 3
      val v = if (i % 10 < 3) 424242L else (i * 2654435761L) % 997
      (g, v)
    }
    def aggs(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(expr("kmv_distinct(v, 64)").as("kmv"),
        expr("element_at(mg_topk(cast(v as string), 8), 1).item").as("top"),
        expr("element_at(kll_quantiles(cast(v as double), 256, " +
          "array(0.5D)), 1)").as("med"))

    val batch = aggs(all.toDF("g", "v")).orderBy("g").collect().toSeq

    val input = MemoryStream[(Long, Long)]
    val q = aggs(input.toDS().toDF("g", "v"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", tmpDir("sketch-ckpt"))
      .format("memory").queryName("sketch_stream").start()
    // three uneven micro-batches — merge order differs from the batch scan
    input.addData(all.take(1000))
    q.processAllAvailable()
    input.addData(all.slice(1000, 1100))
    q.processAllAvailable()
    input.addData(all.drop(1100))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sketch_stream").orderBy("g").collect().toSeq

    assert(streamed.size == 3 && batch.size == 3)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0))
      // KMV: set-function summary — bit-identical across any split
      assert(s.get(1) == b.get(1), "KMV summaries diverged under streaming")
      // MG: the 30% heavy hitter must win top-1 in both executions
      assert(s.getString(2) == "424242" && b.getString(2) == "424242")
      // KLL: both medians within rank-error of the true per-group median
      val trueMed = {
        val vs = all.filter(_._1 == s.getLong(0)).map(_._2.toDouble).sorted
        vs(vs.size / 2)
      }
      val tol = 0.05 * 997 // ~1.7% rank error at k=256, headroom to 5%
      assert(math.abs(s.getDouble(3) - trueMed) <= tol,
        s"streamed median ${s.getDouble(3)} vs true $trueMed")
      assert(math.abs(b.getDouble(3) - trueMed) <= tol)
    }
  }
}
