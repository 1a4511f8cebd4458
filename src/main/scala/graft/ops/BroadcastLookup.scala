package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-free point-in-range lookup against a broadcast-sized, sorted,
  * non-overlapping range dimension (IP→geo, price→tier, offset→shard,
  * ts→maintenance window).
  *
  * [[RangeJoin.pointInRange]] is the general tool when BOTH sides are
  * large: one exchange per side on a bin id. But the overwhelmingly
  * common production shape is a huge fact against a small static
  * dimension of disjoint ranges, and there the right plan has NO
  * exchange at all. Spark's own planner can't produce it: a non-equi
  * `v >= lo AND v < hi` broadcast join becomes a
  * BroadcastNestedLoopJoin — O(|dim|) comparisons per fact row, 100 000
  * compares/row for a 100k-range geo table.
  *
  * This operator instead collects the (lo, hi) pairs once on the driver
  * (bounded by `maxRanges` — the same bound any broadcast join already
  * imposes), validates order/disjointness, and flattens them into ONE
  * ascending boundary array `[lo0, hi0, lo1, hi1, ...]` embedded as a
  * literal: even buckets are ranges, odd buckets are the gaps between
  * them. Each fact row then runs [[graft.functions.RangeBucket]] — an
  * O(log |dim|) binary search in generated code — to find its ordinal,
  * and a broadcast HASH join on that ordinal (equi key, not a predicate)
  * attaches the range payload. Plan shape: scan → codegen project →
  * BroadcastHashJoin. Zero exchanges on the fact side, so it composes
  * with whatever partitioning the surrounding pipeline already has.
  *
  * Adjacent ranges (hi_i == lo_{i+1}) produce an empty odd bucket and
  * work unchanged; true gaps route to odd buckets and the row is
  * dropped (inner-join semantics), as is anything outside
  * [first lo, last hi).
  */
object BroadcastLookup {

  /** Inner join `points ⋈ ranges ON lo <= point < hi` for disjoint
    * ranges. Output columns = points ++ ranges (names must be disjoint).
    * Each point matches at most one range, so each input row appears at
    * most once. */
  def pointLookup(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      maxRanges: Int = 1 << 20): DataFrame = {
    val overlap = points.columns.toSet.intersect(ranges.columns.toSet)
    require(overlap.isEmpty, s"column name collision: $overlap")

    // Driver-side: the dimension's (lo, hi) pairs only — the payload
    // columns never leave the cluster. take(max+1) fails loudly instead
    // of OOMing the driver on a mis-declared "dimension".
    val lohi = ranges
      .filter(col(hiCol) > col(loCol))
      .select(col(loCol).cast("long").as("lo"), col(hiCol).cast("long").as("hi"))
      .collect()
    require(lohi.length <= maxRanges,
      s"pointLookup: ${lohi.length} ranges exceeds maxRanges=$maxRanges — " +
        "this side is not a broadcastable dimension; use RangeJoin.pointInRange")
    val sorted = lohi.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((lo0, hi0), (lo1, _)) =>
        require(hi0 <= lo1,
          s"pointLookup: overlapping ranges [$lo0,$hi0) and [$lo1,...)")
      case _ => ()
    }
    val bounds: Array[Long] = sorted.flatMap(t => Array(t._1, t._2))

    if (sorted.isEmpty) {
      // No ranges → no matches; keep the joined schema.
      return points.limit(0).crossJoin(ranges.limit(0))
    }

    // Probe: O(log n) codegen binary search → ordinal; odd buckets are
    // gaps. The ordinal is then an EQUI key, so the payload join is a
    // BroadcastHashJoin, not a nested loop. The boundary array rides
    // into tasks as a foldable literal (same transport as a broadcast
    // variable for this size class).
    graft.functions.GraftFunctions.register(points.sparkSession)
    val bucket = call_function("range_bucket",
      col(pointCol).cast("long"), lit(bounds))
    val probed = points.withColumn("__rb", bucket)
      .filter(col("__rb").isNotNull && col("__rb") % 2 === 0)
      .withColumn("__range_ord", (col("__rb") / 2).cast("int"))
      .drop("__rb")

    // lo is strictly increasing across disjoint non-empty ranges, so it
    // identifies the range; attach the ordinal to the dimension through
    // a tiny broadcast (ord, lo) frame rather than collecting payload.
    val ordDf = points.sparkSession.createDataFrame(
      sorted.toIndexedSeq.zipWithIndex.map { case ((lo, _), i) => (i, lo) }
    ).toDF("__range_ord", "__lo_key")
    val dim = ranges.filter(col(hiCol) > col(loCol))
      .join(broadcast(ordDf), col(loCol).cast("long") === col("__lo_key"))
      .drop("__lo_key")

    probed.join(broadcast(dim), Seq("__range_ord")).drop("__range_ord")
  }
}
