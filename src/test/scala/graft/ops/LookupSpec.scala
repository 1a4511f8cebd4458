package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BroadcastLookup (shuffle-free point-in-range against a broadcast dim)
  * + the range_bucket kernel behind it, and TimeSeries.rollingAnomalies
  * (exact-integer rolling z-score). */
class LookupSpec extends SparkSpec {
  import spark.implicits._

  // --- range_bucket kernel ------------------------------------------------

  test("range_bucket: boundaries, gaps, and empty buckets") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def lk(v: Long, bounds: Long*): Int =
      graft.functions.RangeBucket.lookup(v, ArrayData.toArrayData(bounds.toArray))
    // [0,10) [10,20): adjacent — zero-width "gap" bucket must be skipped
    assert(lk(0, 0, 10, 10, 20) == 0)
    assert(lk(9, 0, 10, 10, 20) == 0)
    assert(lk(10, 0, 10, 10, 20) == 2) // lands in the SECOND range, not the gap
    assert(lk(19, 0, 10, 10, 20) == 2)
    assert(lk(20, 0, 10, 10, 20) == -1) // at/after last boundary
    assert(lk(-1, 0, 10, 10, 20) == -1) // before first
    // real gap [10,15)
    assert(lk(12, 0, 10, 15, 20) == 1) // odd bucket = gap
    assert(lk(15, 0, 10, 15, 20) == 2)
  }

  // --- BroadcastLookup ----------------------------------------------------

  private def ranges = Seq(
    (0, 0L, 100L), (1, 100L, 250L), (2, 300L, 301L), (3, 500L, 1000L)
  ).toDF("range_id", "lo", "hi")

  test("pointLookup matches the naive BETWEEN join exactly") {
    val points = (0L until 1200L).map(v => (v, v * 7 % 1100)).toDF("id", "v")
    val got = BroadcastLookup.pointLookup(points, "v", ranges, "lo", "hi")
      .select("id", "v", "range_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val want = points.join(ranges,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "v", "range_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(got.sameElements(want))
    assert(got.nonEmpty)
    // gap rows (250..299) and out-of-range rows (>=1000) are dropped
    assert(!got.exists(t => t._2 >= 250 && t._2 < 300))
    assert(!got.exists(_._2 >= 1000))
  }

  test("pointLookup plan: no nested loop, no shuffle before the probe") {
    val points = (0L until 100L).toDF("v")
    val plan = BroadcastLookup.pointLookup(points, "v", ranges, "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("pointLookup rejects overlapping ranges and oversized dims") {
    val bad = Seq((0, 0L, 100L), (1, 50L, 150L)).toDF("range_id", "lo", "hi")
    val pts = Seq(1L).toDF("v")
    val ex = intercept[IllegalArgumentException] {
      BroadcastLookup.pointLookup(pts, "v", bad, "lo", "hi")
    }
    assert(ex.getMessage.contains("overlapping"))
    val ex2 = intercept[IllegalArgumentException] {
      BroadcastLookup.pointLookup(pts, "v", ranges, "lo", "hi", maxRanges = 2)
    }
    assert(ex2.getMessage.contains("maxRanges"))
  }

  test("pointLookup: empty dimension yields empty result, joined schema") {
    val pts = Seq(1L).toDF("v")
    val out = BroadcastLookup.pointLookup(pts, "v",
      ranges.filter(col("lo") < -1), "lo", "hi")
    assert(out.columns.toSeq == Seq("v", "range_id", "lo", "hi"))
    assert(out.count() == 0)
  }

  test("pointLookup lifts onto a stream unchanged (stateless enrich)") {
    // The dim side is batch control data (collected at plan time); the
    // points side can be a stream — the probe is a stateless projection
    // + broadcast join, so it composes with readStream like any map.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[Long]
    in.addData(5L, 120L, 260L, 700L) // 260 falls in the 250..300 gap
    val out = BroadcastLookup.pointLookup(
      in.toDF.withColumnRenamed("value", "v"), "v", ranges, "lo", "hi")
    val qn = "lookup_stream_" + System.nanoTime()
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(qn).select("v", "range_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((5L, 0), (120L, 1), (700L, 3)))
  }

  // --- TimeSeries.rollingAnomalies ---------------------------------------

  test("rollingAnomalies flags the spike and only the spike") {
    // 30 flat values then a spike, then flat again: exactly one anomaly.
    val vals = (Seq.fill(30)(100L) :+ 5000L) ++ Seq.fill(5)(100L)
    val df = vals.zipWithIndex
      .map { case (v, i) => (1L, i.toLong, v) }.toDF("k", "seq", "v")
    val out = TimeSeries.rollingAnomalies(df, "k", Seq("seq"), "v",
      lookback = 20, minPoints = 10, sigmas = 3)
    val flagged = out.filter(col("is_anomaly")).select("seq").as[Long].collect()
    assert(flagged.toSeq == Seq(30L))
    // σ=0 window: dev² > 0 is the exact condition — the spike trips it,
    // identical flat values never do (dev = 0).
  }

  test("rollingAnomalies: cold start below minPoints never flags") {
    val df = Seq((1L, 0L, 0L), (1L, 1L, 1000000L), (1L, 2L, -1000000L))
      .toDF("k", "seq", "v")
    val out = TimeSeries.rollingAnomalies(df, "k", Seq("seq"), "v",
      lookback = 20, minPoints = 3, sigmas = 3)
    assert(out.filter(col("is_anomaly")).count() == 0)
  }

  test("rollingAnomalies keys are independent") {
    // key 2's spike must not contaminate key 1's stats
    val k1 = (0 until 15).map(i => (1L, i.toLong, 100L))
    val k2 = (0 until 15).map(i => (2L, i.toLong, if (i == 14) 9000L else 7L))
    val df = (k1 ++ k2).toDF("k", "seq", "v")
    val out = TimeSeries.rollingAnomalies(df, "k", Seq("seq"), "v",
      lookback = 20, minPoints = 10, sigmas = 3)
      .filter(col("is_anomaly")).select("k", "seq")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 14L)))
  }
}
